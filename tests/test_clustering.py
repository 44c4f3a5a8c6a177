"""k-means fixed-point properties (the oracle for an iterative op)."""

from __future__ import annotations

import numpy as np

from sleep_edf_data_pipeline_spark.operators.clustering import assign_clusters, kmeans
from sleep_edf_data_pipeline_spark.tables import table


def _inertia(spark, vecs, k, iters):
    assigned, _ = kmeans(vecs, k=k, iters=iters)
    return assigned.agg({"sq_dist": "sum"}).first()[0]


def test_assignment_is_argmin_of_final_centroids(spark, sf_dir):
    vecs = table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans(vecs, k=4, iters=2)
    rows = assigned.select("vec_id", "embedding", "cluster").collect()
    C = np.array(centroids)
    for r in rows:
        d = ((np.array(r["embedding"], dtype=np.float64) - C) ** 2).sum(axis=1)
        assert int(d.argmin()) == r["cluster"], r["vec_id"]


def test_inertia_non_increasing_across_rounds(spark, sf_dir):
    vecs = table(spark, sf_dir, "embeddings")
    i1 = _inertia(spark, vecs, 4, 1)
    i2 = _inertia(spark, vecs, 4, 2)
    i3 = _inertia(spark, vecs, 4, 3)
    assert i1 >= i2 - 1e-9 and i2 >= i3 - 1e-9


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    vecs = table(spark, sf_dir, "embeddings")
    a1, c1 = kmeans(vecs, k=4, iters=2)
    a2, c2 = kmeans(vecs, k=4, iters=2)
    assert c1 == c2
    m1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    m2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert m1 == m2
