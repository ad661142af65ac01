"""Driver-contract guard: every queries() entry runs, and every oracle
matches DuckDB at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from tools.check_oracles import main as check_main  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_all_oracles_match():
    assert check_main(SF_DIR, []) == 0


def test_rotation_window():
    """The driver stamps only the first 50 queries() entries. Guard the
    rotation contract: every entry beyond position 50 must be explicitly
    listed in ROTATED_OUT (no query silently exits verification), and
    the five entries the driver has never stamped (round-3 tail) must
    sit inside the window this round."""
    import __spark_entry__ as e
    from olake_spark.entry_queries import ROTATED_OUT

    names = list(e.queries())
    assert set(names[50:]) == set(ROTATED_OUT)
    for never_stamped in (
        "changelog_scan",
        "audio_segments",
        "ivf_train",
        "stratified_sample",
        "audio_segment_match",
    ):
        assert never_stamped in names[:50]


def test_pack_token_budget_invariants(spark):
    """Size-class packing guarantees: every pack's token sum fits the
    budget, and within a class every pack except the last is full."""
    from olake_spark.entry_queries import _PACK_BUDGET, QUERIES

    rows = QUERIES["pack_token_budget"](spark, SF_DIR).collect()
    assert rows
    by_class: dict[int, list] = {}
    for r in rows:
        # a doc that alone exceeds the budget lands in a flagged
        # singleton pack (cap clamps to 1); every other pack fits
        if r["oversize"]:
            assert r["n_docs"] == 1
        else:
            assert r["sum_tokens"] <= _PACK_BUDGET
        # every doc in class c has < 2^c tokens
        assert r["max_tokens"] < (1 << r["size_class"])
        by_class.setdefault(r["size_class"], []).append(r)
    for c, packs in by_class.items():
        packs.sort(key=lambda r: r["pack_in_class"])
        cap = max(_PACK_BUDGET // (1 << c), 1)
        for p in packs[:-1]:
            assert p["n_docs"] == cap  # only the tail pack may be short


def test_decontaminate_flags_only_nonbenchmark(spark):
    from olake_spark.entry_queries import QUERIES

    rows = QUERIES["decontaminate"](spark, SF_DIR).collect()
    for r in rows:
        assert r["doc_id"] % 7 != 0
        assert r["n_hit_grams"] >= 1
