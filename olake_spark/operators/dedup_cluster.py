"""Near-dup cluster resolution: connected components over candidate pairs.

The LSH family (entry_queries: ``lsh_bucket_join``, ``ngram_jaccard``,
``audio_fingerprint_dedup``) stops at candidate PAIRS; deduplicating a
corpus needs the transitive closure — one cluster id per document and
one canonical survivor per cluster (A~B and B~C must collapse into one
group even when A~C was never emitted as a pair). This operator closes
that gap: iterative min-label propagation with pointer jumping, all
equi-joins, run to a verified fixed point.

No reference analog (it is an LLM-pipeline op per the brief); the
algorithm is the standard label-propagation connected components used
by GraphFrames/GraphX, re-expressed as DataFrame joins.

Scale notes (100 TB discipline):
- every step is an equi-join or groupBy on ids — shuffle ∝ |V| + |E|
  per round, never a cartesian;
- labels only ever DECREASE and are bounded below by the component
  minimum, so the fixed point is the exact component-min labeling —
  deterministic regardless of execution order (oracle-safe);
- plain neighbor-min converges in O(diameter) rounds; the pointer-jump
  step (label := label-of-label) roughly halves remaining label-chain
  depth each round, giving the O(log n) bound long chains need;
- per-round ``localCheckpoint`` truncates the join lineage — without
  it the plan doubles every iteration and the driver OOMs on planning
  long before the data is big;
- convergence is detected with an early-exit ``isEmpty`` probe on the
  changed-rows filter, not a full count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: backstop for pathological inputs; with pointer jumping real corpora
#: converge in ~log2(max component size) rounds
MAX_ROUNDS = 50
#: broadcast the duplicate-subgraph id set into the singleton anti-join
#: below this many vertices (~10M bigints ≈ 150 MB serialized — inside
#: executor memory at any sane config); above it the corpus-wide
#: shuffle is unavoidable and sort-merge is correct
BROADCAST_SUBGRAPH_IDS = 10_000_000


def min_label_clusters(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """(vertices, candidate pairs) → ``(doc_id, cluster_id, is_canonical)``.

    ``cluster_id`` is the MINIMUM vertex id reachable through the pair
    graph (singletons cluster with themselves); ``is_canonical`` is 1
    for the survivor row (``doc_id == cluster_id``), so the keep-one
    dedup is a trivial ``filter`` and the drop set an anti-join.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionAll(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Iterate ONLY over edge-touched vertices: a singleton's label can
    # never change (no neighbors), so the loop state is ∝ |V(edges)| —
    # in a near-dup corpus a small fraction of the table — while the
    # untouched majority bypasses every round and is unioned back as
    # its own canonical cluster at the end. At 10^12 docs this is the
    # difference between shuffling the corpus per round and shuffling
    # just the duplicate subgraph. (edges is symmetrized, so ``src``
    # alone covers every edge-touched vertex.)
    touched = edges.select("src").distinct()
    labels = touched.select(
        F.col("src").alias("id"), F.col("src").alias("lbl")
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        # 1) neighbor min: each vertex adopts the smallest label in its
        #    closed neighborhood (shuffle keyed on ids — equi-joins only)
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                F.col("id"),
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
                F.col("lbl").alias("old"),
            )
        )
        # 2) pointer jump: lbl := min(lbl, lbl[lbl]) — path compression
        #    that collapses label chains logarithmically. Exactly ONE
        #    jump per materialized round: extra jumps against the same
        #    un-materialized mapping only compound linearly (s∘s is a
        #    2-hop, not a squared map — squaring needs the jumped
        #    result as the next mapping, i.e. a materialization per
        #    hop), so more in-plan hops buy +1 step each for a full
        #    extra join — the same trade as another round, minus the
        #    round's neighbor-min. The round's convergence flag is
        #    computed INSIDE the same plan (new < round-start label),
        #    so each round is exactly one materializing job; the
        #    convergence probe then just filters the checkpointed rows
        #    instead of re-joining two snapshots.
        x, y = stepped.alias("x"), stepped.alias("y")
        new_lbl = F.least(
            F.col("x.lbl"), F.coalesce(F.col("y.lbl"), F.col("x.lbl"))
        )
        jumped = x.join(y, F.col("x.lbl") == F.col("y.id"), "left").select(
            F.col("x.id").alias("id"),
            new_lbl.alias("lbl"),
            (new_lbl < F.col("x.old")).alias("changed"),
        ).localCheckpoint(eager=True)

        converged = jumped.filter(F.col("changed")).isEmpty()
        labels = jumped.select("id", "lbl")
        if converged:
            break
    else:
        raise RuntimeError(
            f"min_label_clusters: no fixed point within {max_rounds} rounds"
        )

    # The anti-join's right side is the duplicate-subgraph id set —
    # small in a real near-dup corpus but UNSIZED by Catalyst (the
    # checkpoint scan has no stats), which defaults the plan to a
    # sort-merge join that shuffles the ENTIRE corpus just to add the
    # singleton rows. Broadcast it when its (cheap, checkpointed)
    # count fits; past the cap — a corpus where duplicates are the
    # majority — the corpus-wide shuffle is genuinely required and SMJ
    # is the right plan.
    sub_ids = labels.select("id")
    if labels.count() <= BROADCAST_SUBGRAPH_IDS:
        sub_ids = F.broadcast(sub_ids)
    singletons = vertices.join(
        sub_ids,
        vertices[id_col] == F.col("id"),
        "left_anti",
    ).select(F.col(id_col).alias("id"), F.col(id_col).alias("lbl"))
    return labels.unionByName(singletons).select(
        F.col("id").alias(id_col),
        F.col("lbl").alias("cluster_id"),
        (F.col("id") == F.col("lbl")).cast("int").alias("is_canonical"),
    )


def dedup_survivors(
    df: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly the canonical row of each cluster: join the cluster
    map (inner, on the id) and filter — one shuffle keyed on the id,
    broadcastable when the cluster map is small."""
    keep = clusters.filter(F.col("is_canonical") == 1).select(id_col)
    return df.join(keep, id_col, "inner")
