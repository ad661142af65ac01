"""Connected components over near-dup candidate pairs
(operators/dedup_cluster.py): transitive chain closure, canonical
survivor selection, singleton handling, long-chain convergence, and the
keep-one filter.
"""

from __future__ import annotations

import pytest

from olake_spark.operators.dedup_cluster import dedup_survivors, min_label_clusters


def _clusters(spark, ids, pairs, **kw):
    v = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    p = spark.createDataFrame(pairs or [(None, None)], "doc_a long, doc_b long")
    if not pairs:
        p = p.filter("doc_a IS NOT NULL")
    out = min_label_clusters(v, p, **kw).collect()
    return {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out}


def test_transitive_chain_closes(spark):
    """A~B and B~C with NO A~C pair must still form one cluster — the
    exact gap the pair-level LSH ops leave open."""
    got = _clusters(spark, [1, 2, 3, 9], [(1, 2), (2, 3)])
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 0), 9: (9, 1)}


def test_two_components_and_singletons(spark):
    got = _clusters(spark, range(1, 9), [(5, 7), (2, 4), (4, 1), (7, 6)])
    # component {1,2,4} → min 1; {5,6,7} → min 5; singletons 3, 8
    assert got[1] == (1, 1) and got[2] == (1, 0) and got[4] == (1, 0)
    assert got[5] == (5, 1) and got[6] == (5, 0) and got[7] == (5, 0)
    assert got[3] == (3, 1) and got[8] == (8, 1)
    # exactly one canonical per cluster
    canon = [d for d, (_, c) in got.items() if c == 1]
    assert sorted(canon) == [1, 3, 5, 8]


def test_long_chain_converges_logarithmically(spark):
    """A 64-node path graph has diameter 63; pointer jumping must close
    it well under the plain-propagation round count."""
    n = 64
    got = _clusters(
        spark, range(n), [(i, i + 1) for i in range(n - 1)], max_rounds=12
    )
    assert all(lbl == 0 for lbl, _ in got.values())
    assert sum(c for _, c in got.values()) == 1


def test_no_pairs_all_singletons(spark):
    got = _clusters(spark, [4, 5], [])
    assert got == {4: (4, 1), 5: (5, 1)}


def test_round_budget_exceeded_raises(spark):
    with pytest.raises(RuntimeError, match="no fixed point"):
        _clusters(spark, range(40), [(i, i + 1) for i in range(39)], max_rounds=1)


def test_dedup_survivors_keeps_one_per_cluster(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 5)], "doc_id long, text string"
    )
    v = df.select("doc_id")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    clusters = min_label_clusters(v, pairs)
    kept = sorted(r["doc_id"] for r in dedup_survivors(df, clusters).collect())
    assert kept == [1, 4]
