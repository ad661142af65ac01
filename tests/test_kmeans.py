"""IVF quantizer training (operators/kmeans.py): Lloyd correctness
and the trained-beats-seeded claim on planted clusters."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.kmeans import assign, train_centroids


def _planted(spark, n_clusters=8, per_cluster=50, dim=16, seed=5, spread=0.4):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).round(4) * 3
    pts, labels = [], []
    for lab in range(n_clusters):
        pts.append(centers[lab] + rng.standard_normal((per_cluster, dim)) * spread)
        labels += [lab] * per_cluster
    X = np.concatenate(pts).round(4)
    rows = [(i, labels[i], [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id int, label int, embedding array<double>"), centers


class TestTrainCentroids:
    def test_recovers_planted_centers(self, spark):
        df, centers = _planted(spark)
        cents, hist = train_centroids(df, k=8, iters=10, tol=1e-3, seed=7)
        assert cents.shape == (8, 16)
        # every planted center has a trained centroid well inside the
        # per-cluster noise ball (radius ≈ spread·√dim = 1.6)
        for c in centers:
            d = np.sqrt(((cents - c) ** 2).sum(axis=1)).min()
            assert d < 1.0, d
        # converged: shift decreased and dropped under tol
        assert hist[-1]["max_shift"] < 1e-3
        assert hist[-1]["nonempty"] == 8

    def test_assignment_is_pure_per_cluster(self, spark):
        df, _ = _planted(spark)
        cents, _ = train_centroids(df, k=8, iters=10, tol=1e-3, seed=7)
        a = assign(df, cents, "embedding", "vec_id", "label")
        purity = (
            a.groupBy("label")
            .agg(F.countDistinct("centroid").alias("nc"), F.count("*").alias("n"))
            .collect()
        )
        # well-separated planted clusters map 1:1 onto trained centroids
        assert all(r["nc"] == 1 for r in purity)

    def test_trained_lists_balance_beats_seeded(self, spark):
        """The point of training: list sizes follow the data. Seeded
        random centroids leave most lists empty on clustered data
        (probing them wastes budget); trained lists are all populated."""
        df, _ = _planted(spark)
        rng = np.random.default_rng(11)
        seeded = rng.standard_normal((8, 16)).round(4)
        n_seeded = assign(df, seeded, "embedding").select("centroid").distinct().count()
        trained, _ = train_centroids(df, k=8, iters=10, tol=1e-3, seed=7)
        n_trained = assign(df, trained, "embedding").select("centroid").distinct().count()
        assert n_trained == 8
        assert n_trained >= n_seeded

    def test_sample_fraction_and_small_k(self, spark):
        df, _ = _planted(spark)
        cents, hist = train_centroids(df, k=4, iters=3, tol=0.0, seed=7, sample_fraction=0.5)
        assert cents.shape == (4, 16)
        assert len(hist) == 3  # tol=0 → fixed iteration count

    def test_k_larger_than_data_raises(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0, 1.0]), (1, [1.0, 0.0])], "vec_id int, embedding array<double>"
        )
        with pytest.raises(ValueError, match="at least k"):
            train_centroids(df, k=5, iters=1)
