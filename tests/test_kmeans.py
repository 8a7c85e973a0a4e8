"""k-means IVF invariants (the oracle-free operator is verified
algebraically instead: assignment optimality, partition completeness,
and monotone inertia over iterations)."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.similarity import _assign, kmeans_fit
from duckdb_mpp_spark.sources import load_table

SF_DIR = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.001")
K = 8


@pytest.fixture(scope="module")
def fitted(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    centroids = kmeans_fit(emb, k=K, iters=3)
    assigned = _assign(emb, centroids)
    return emb, centroids, assigned


def test_partition_complete(fitted):
    emb, _, assigned = fitted
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    ids = {r.cluster_id for r in assigned.select("cluster_id").distinct().collect()}
    assert ids <= set(range(1, K + 1))


def test_assignment_is_nearest(fitted):
    """Every vector's stored d2 equals the minimum d2 over all centroids."""
    emb, centroids, assigned = fitted
    re_assigned = _assign(emb, centroids)
    a = {r.vec_id: (r.cluster_id, round(r.d2, 9)) for r in assigned.collect()}
    b = {r.vec_id: (r.cluster_id, round(r.d2, 9)) for r in re_assigned.collect()}
    assert a == b


def test_inertia_decreases_with_iterations(spark):
    emb = load_table(spark, SF_DIR, "embeddings")

    def inertia(iters):
        c = kmeans_fit(emb, k=K, iters=iters)
        return _assign(emb, c).agg(F.sum("d2")).collect()[0][0]

    i1, i3 = inertia(1), inertia(3)
    assert i3 <= i1 + 1e-9
