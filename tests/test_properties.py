"""Property-based tests (hypothesis) for the pure planning/keying math."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from olake_spark.functions.zcurve import hilbert_d2xy, hilbert_xy2d, morton3
from olake_spark.plans.ffd import first_fit_decreasing
from olake_spark.sources.chunked import plan_chunks
from olake_spark.table import evolution as ev

TYPES = [ev.BOOL, ev.INT32, ev.INT64, ev.FLOAT32, ev.FLOAT64, ev.STRING,
         ev.TS, ev.TS_MILLI, ev.TS_MICRO, ev.TS_NANO, ev.NULL]


@given(st.sampled_from(TYPES), st.sampled_from(TYPES), st.sampled_from(TYPES))
@settings(max_examples=200, deadline=None)
def test_lca_commutative_idempotent_closed(a, b, c):
    assert ev.lca(a, b) == ev.lca(b, a)
    assert ev.lca(a, a) == a
    # LCA is an upper bound: promoting again with either input is a no-op
    r = ev.lca(a, b)
    if a != ev.NULL:
        assert ev.lca(r, a) == r
    # associativity over the tree
    assert ev.lca(ev.lca(a, b), c) == ev.lca(a, ev.lca(b, c))


@given(
    st.lists(st.tuples(st.uuids().map(str), st.integers(1, 1 << 30)), min_size=0, max_size=60),
    st.integers(1 << 20, 1 << 31),
)
@settings(max_examples=100, deadline=None)
def test_ffd_invariants(items, capacity):
    bins = first_fit_decreasing(items, capacity, min_items_per_bin=1)
    packed = [it for b in bins for it in b.items]
    # no item lost or duplicated
    assert sorted(packed) == sorted(items)
    # no bin overflows (oversize single items get their own bin)
    for b in bins:
        assert b.size <= b.capacity
        if len(b.items) > 1:
            assert b.size <= capacity


@given(st.integers(0, 999), st.integers(0, 9999), st.integers(1, 100))
@settings(max_examples=100, deadline=None)
def test_plan_chunks_covers_every_key(lo_off, span, avg_kb):
    lo, hi = lo_off, lo_off + span
    rows = span + 1
    chunks = plan_chunks(lo, hi, rows, avg_kb << 10, chunk_bytes=1 << 20)
    # every key in [lo, hi] falls in exactly one half-open chunk
    for k in (lo, hi, lo + span // 2, lo + span // 3):
        hits = [
            c for c in chunks
            if k >= c.min and (c.max is None or k < c.max)
        ]
        assert len(hits) == 1


@given(st.lists(st.integers(0, (1 << 21) - 1), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_morton_distinct_on_distinct_triples(vals):
    a = np.array(vals, dtype=np.int64)
    z1 = morton3(a, a * 0, a * 0)
    # injective on the first lane: distinct inputs → distinct keys
    assert len(set(z1.tolist())) == len(set(vals))


@given(st.integers(2, 10), st.data())
@settings(max_examples=50, deadline=None)
def test_hilbert_bijection(order, data):
    n = 1 << order
    xs = np.array(data.draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=32)))
    ys = np.array(data.draw(st.lists(st.integers(0, n - 1),
                                     min_size=len(xs), max_size=len(xs))))
    d = hilbert_xy2d(order, xs, ys)
    x2, y2 = hilbert_d2xy(order, d)
    assert np.array_equal(x2, xs) and np.array_equal(y2, ys)
    assert (d >= 0).all() and (d < n * n).all()


def _naive_ffd(items, capacity):
    """Reference first-fit-decreasing (linear scan) for equivalence."""
    bins: list[list] = []
    caps: list[int] = []
    for item_id, size in sorted(items, key=lambda kv: (-kv[1], kv[0])):
        for i, b in enumerate(bins):
            if size <= caps[i] - sum(s for _, s in b):
                b.append((item_id, size))
                break
        else:
            bins.append([(item_id, size)])
            caps.append(max(capacity, size))
    return bins


@given(
    st.lists(st.tuples(st.uuids().map(str), st.integers(1, 1 << 24)), max_size=80),
    st.integers(1 << 16, 1 << 25),
)
@settings(max_examples=100, deadline=None)
def test_ffd_segment_tree_matches_naive(items, capacity):
    fast = first_fit_decreasing(items, capacity, min_items_per_bin=1)
    slow = _naive_ffd(items, capacity)
    assert [b.items for b in fast] == slow


# ---------------------------------------------------------------- DSP contracts


@given(
    st.integers(1, 50_000),
    st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    st.sampled_from([8000, 16000, 22050, 44100, 48000]),
)
@settings(max_examples=200, deadline=None)
def test_resample_length_contract(n_in, sr_in, sr_out):
    from olake_spark.functions.dsp import resample_linear

    r = resample_linear(np.zeros(n_in), sr_in, sr_out)
    want = n_in if sr_in == sr_out else max(1, (n_in * sr_out) // sr_in)
    assert len(r) == want
    # round-trip contract: n → out → back never grows past n (floor
    # math) — unless the first leg hit the 1-sample clamp, where the
    # return leg legitimately reconstructs more samples than n_in
    if (n_in * sr_out) // sr_in >= 1:
        rr = resample_linear(r, sr_out, sr_in)
        assert len(rr) <= max(n_in, 1)


@given(st.integers(0, 5_000), st.integers(1, 400), st.integers(1, 400))
@settings(max_examples=200, deadline=None)
def test_framing_counts(n, frame, hop):
    from olake_spark.functions.dsp import frame_signal

    fr = frame_signal(np.zeros(n), frame, hop)
    want = 0 if n < frame else 1 + (n - frame) // hop
    assert fr.shape == ((want, frame) if want else (0, frame))
    # every frame fits inside the signal
    assert want * 0 + (want - 1) * hop + frame <= n if want else True


@given(
    st.integers(256, 8192),
    st.integers(1, 10_000),
    st.floats(0.05, 8.0),
    st.integers(0, 63),
)
@settings(max_examples=100, deadline=None)
def test_fingerprint_amplitude_invariance(n, k_raw, scale, seed):
    """Scaling never changes the fingerprint of a tonal signal (the
    regime fingerprints are defined for — a near-tie spectrum has no
    dominant peak to be invariant about)."""
    from olake_spark.functions.dsp import clip_fingerprint

    k = k_raw % max(n // 2 - 2, 1) + 1  # on-grid tone bin
    rng = np.random.default_rng(seed)
    w = np.sin(2 * np.pi * k * np.arange(n) / n) + 0.01 * rng.standard_normal(n)
    assert clip_fingerprint(w, 16000) == clip_fingerprint(w * scale, 16000)


@given(st.integers(1, 300), st.integers(0, 63), st.integers(0, 2))
@settings(max_examples=100, deadline=None)
def test_vad_segment_runs_partition_active_frames(n, seed, gap_mod_off):
    from olake_spark.functions.dsp import vad_segments

    rng = np.random.default_rng(seed)
    act = rng.integers(0, 2, size=n).astype(bool)
    segs = vad_segments(act, 20)
    # total segment duration == active frame count × 20ms
    assert sum(e - s for s, e in segs) == int(act.sum()) * 20
    # segments are disjoint, ordered, nonempty
    for (s1, e1), (s2, e2) in zip(segs, segs[1:]):
        assert e1 < s2
    assert all(e > s for s, e in segs)


# ---------------------------------------------------------------------------
# user filter grammar (plans/filters.py) — pure parse, no Spark


_BARE = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,15}", fullmatch=True)
_OPS = st.sampled_from([">=", "<=", "!=", ">", "<", "="])
_WS = st.sampled_from(["", " ", "  ", "\t"])


def _col():
    # quoted (any non-quote chars) or bare word
    return st.one_of(
        st.from_regex(r'[^"\n]{0,12}', fullmatch=True).map(lambda s: f'"{s}"'),
        _BARE,
    )


def _val():
    return st.one_of(
        st.from_regex(r'[^"\n]{0,12}', fullmatch=True).map(lambda s: f'"{s}"'),
        st.integers(-10**6, 10**6).map(str),
        st.from_regex(r"-?\d{1,6}\.\d{1,6}", fullmatch=True),
        st.from_regex(r"\.\d{1,6}", fullmatch=True),
        # bare word — but not a token the grammar reads as a combinator
        _BARE.filter(lambda s: s.lower() not in ("and", "or")),
    )


def _unquote(tok: str) -> str:
    return tok[1:-1] if tok.startswith('"') and tok.endswith('"') else tok


@given(_col(), _OPS, _val(), st.one_of(st.none(), st.sampled_from(
    ["and", "AND", "or", "Or"])), _col(), _OPS, _val(), _WS, _WS)
@settings(max_examples=300, deadline=None)
def test_filter_grammar_roundtrip(c1, o1, v1, logical, c2, o2, v2, w1, w2):
    """Any string assembled from the grammar's own token classes parses
    back to exactly the tokens that produced it (whitespace-insensitive,
    value quotes preserved — the reference keeps them too)."""
    from olake_spark.plans.filters import parse_filter

    text = f"{c1}{w1}{o1}{w2}{v1}"
    if logical:
        text += f" {logical} {c2} {o2} {v2}"
    f = parse_filter(text)
    assert f.conditions[0].column == _unquote(c1)
    assert f.conditions[0].operator == o1
    assert f.conditions[0].value == v1
    if logical:
        assert f.logical_operator == logical
        assert f.conditions[1].column == _unquote(c2)
        assert f.conditions[1].operator == o2
        assert f.conditions[1].value == v2
    else:
        assert f.logical_operator == ""
        assert len(f.conditions) == 1


@given(st.text(max_size=60))
@settings(max_examples=500, deadline=None)
def test_filter_fuzz_parses_or_rejects_cleanly(text):
    """Arbitrary input either parses to a 1-2 condition Filter or raises
    the grammar's ValueError — never any other exception (the CLI
    surfaces this error verbatim at cmd_check time)."""
    from olake_spark.plans.filters import Filter, parse_filter

    try:
        f = parse_filter(text)
    except ValueError as e:
        assert "invalid filter format" in str(e)
    else:
        assert isinstance(f, Filter)
        assert len(f.conditions) in (0, 1, 2)


# ---------------------------------------------------------------------------
# lexicographic tuple predicates (sources/jdbc.py) — checked against
# Python tuple comparison with DuckDB evaluating the rendered SQL


@given(
    st.integers(1, 3),
    st.lists(st.tuples(st.integers(-5, 5), st.integers(-5, 5),
                       st.integers(-5, 5)), min_size=1, max_size=12),
    st.tuples(st.integers(-5, 5), st.integers(-5, 5), st.integers(-5, 5)),
    st.sampled_from([">=", "<"]),
)
@settings(max_examples=60, deadline=None)
def test_tuple_cmp_sql_matches_python_tuple_order(arity, rows, bound, op):
    """The AND/OR expansion evaluates exactly like Python's native tuple
    comparison for every row — the property the chunk contract rests on
    (half-open [min, max) tuple ranges)."""
    import duckdb

    from olake_spark.sources.jdbc import tuple_cmp_sql

    cols = [f"c{i}" for i in range(arity)]
    rows = [r[:arity] for r in rows]
    b = bound[:arity]
    sql = tuple_cmp_sql(cols, b, op, quote=lambda c: c)
    values = ", ".join("(" + ", ".join(map(str, r)) + ")" for r in rows)
    got = duckdb.sql(
        f"SELECT {sql} FROM (VALUES {values}) AS t({', '.join(cols)})"
    ).fetchall()
    want = [(r >= b) if op == ">=" else (r < b) for r in rows]
    assert [g[0] for g in got] == want


# ---------------------------------------------------------------------------
# scaling-artifact union (tools/merge_scaling.py) — pure math


@given(
    st.lists(
        st.lists(st.floats(1.0, 100.0), min_size=1, max_size=4),
        min_size=2, max_size=2,
    ),
    st.integers(1, 3),
)
@settings(max_examples=50, deadline=None)
def test_merge_scaling_min_of_union_equals_min_of_mins(samples, split):
    """Merging N artifacts must give the same minima as one artifact
    carrying all draws — evidence accumulates, never resets."""
    import json
    import sys
    import tempfile
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.merge_scaling import STAGES, merge

    def artifact(draws_lo, draws_hi):
        mk = lambda d: {s: list(d) for s in STAGES}  # noqa: E731
        return {
            "n_clips": 1000,
            "runs": {
                "local[2]": {"all_sec": mk(draws_lo), "all_cold_sec": mk([])},
                "local[8]": {"all_sec": mk(draws_hi), "all_cold_sec": mk([])},
            },
        }

    lo, hi = samples
    k = min(split, len(lo) - 1) or 1
    parts = [artifact(lo[:k], hi), artifact(lo[k:] or lo[:1], hi)]
    whole = artifact(lo, hi)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i, a in enumerate(parts + [whole]):
            p = f"{d}/a{i}.json"
            json.dump(a, open(p, "w"))
            paths.append(p)
        merged = merge(paths[:2])
        solo = merge(paths[2:])
    for c in ("local[2]", "local[8]"):
        union_min = merged["runs"][c]["stages_sec"]
        # the union of parts covers at least every draw in `whole`
        for s in STAGES:
            assert union_min[s] <= solo["runs"][c]["stages_sec"][s] + 1e-9
    assert merged["cores_ratio"] == 4.0


# --------------------------------------------------------------- W8 escaping
# boundary: template render → Spark partitioned write → dir decode must
# reproduce the raw rendered sub-path exactly (manifest/layout drift
# would hide here), across '/', '=', '%', ':', unicode, and the empty /
# NULL fallback (__HIVE_DEFAULT_PARTITION__).

_SEG_TEXT = st.text(
    alphabet=st.sampled_from(list("ab/=%:. é光_-")), max_size=8
)


@given(
    st.lists(
        st.tuples(st.one_of(st.none(), _SEG_TEXT), st.one_of(st.none(), _SEG_TEXT)),
        min_size=1,
        max_size=10,
        unique=True,
    )
)
@settings(max_examples=6, deadline=None)
def test_hive_partition_roundtrip(vals):
    import tempfile

    from olake_spark.functions.transforms import partition_path_template
    from olake_spark.operators.ingest import append_batch
    from olake_spark.session import get_spark
    from olake_spark.table import Table

    spark = get_spark("props", cores=4)
    pat = "/{v,'fb',}/{w,'fw',}"
    df = spark.createDataFrame(
        [(i, v, w) for i, (v, w) in enumerate(vals)],
        "doc_id long, v string, w string",
    )
    expected = {
        r["p"] for r in df.select(partition_path_template(pat, df).alias("p")).collect()
    }
    loc = tempfile.mkdtemp(prefix="hivert_")
    t = Table.create(spark, loc, "rt", df.schema, identifier_fields=["doc_id"])
    append_batch(t, df, partition_regex=pat)
    got = {e.partition for e in t.entries()}
    assert got == expected


# ---- key-bloom sidecars (table/bloom.py): no-false-negative algebra

_BLOOM_KEYS = st.lists(
    st.one_of(
        st.text(min_size=0, max_size=40),
        st.binary(min_size=0, max_size=40),
        st.integers(-(2**62), 2**62),
    ),
    min_size=1,
    max_size=300,
)


@given(_BLOOM_KEYS, st.sampled_from([0.1, 0.01, 0.001]))
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(keys, fpp):
    from olake_spark.table import bloom as B

    payload = B.build("k", keys, fpp)
    header, bits = B.deserialize(payload)
    h1, h2 = B.digests(B.key_bytes(keys))
    # batch probe and every single-key probe must hit
    assert B.might_contain_any(header, bits, h1, h2)
    for i in range(len(keys)):
        assert B.might_contain_any(header, bits, h1[i : i + 1], h2[i : i + 1])


@given(_BLOOM_KEYS)
@settings(max_examples=40, deadline=None)
def test_bloom_fold_preserves_membership(keys):
    from olake_spark.table import bloom as B

    header, bits = B.deserialize(B.build("k", keys, 0.01))
    h1, h2 = B.digests(B.key_bytes(keys))
    m = header["m"]
    while m > 64:
        m //= 2
        folded = B.fold(bits, header["m"], m)
        small = dict(header, m=m)
        for i in range(len(keys)):
            assert B.might_contain_any(small, folded, h1[i : i + 1], h2[i : i + 1])


@given(_BLOOM_KEYS, st.integers(1, 299))
@settings(max_examples=40, deadline=None)
def test_bloom_or_merge_covers_union_or_refuses(keys, cut_raw):
    from olake_spark.table import bloom as B

    cut = min(cut_raw, max(1, len(keys) - 1))
    left, right = keys[:cut], keys[cut:] or ["pad"]
    merged = B.or_merge([B.build("k", left, 0.01), B.build("k", right, 0.01)])
    if merged is None:  # density refusal is the documented fallback
        return
    header, bits = B.deserialize(merged)
    h1, h2 = B.digests(B.key_bytes(left + right))
    for i in range(h1.size):
        assert B.might_contain_any(header, bits, h1[i : i + 1], h2[i : i + 1])
