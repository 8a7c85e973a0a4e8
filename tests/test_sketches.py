"""Sketch accuracy contracts: the rows-only gate entry `sketch_approx_stats`
is held to explicit error bounds against the exact answers (HLL++ advertises
~2.3% standard error at the default rsd=0.05; approx_percentile's rank error
is bounded by 1/accuracy)."""

import os

from pyspark.sql import functions as F

from duckdb_mpp_spark.queries import run_spark_query
from duckdb_mpp_spark.sources import load_table

SF_DIR = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_sketch_error_bounds(spark):
    approx = {
        r["event_type"]: r
        for r in run_spark_query("sketch_approx_stats", spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            # discrete percentiles: approx_percentile estimates the rank and
            # returns an actual element, so the honest exact reference is
            # percentile_disc, not the interpolating percentile()
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= max(3, 0.1 * e["users"])
        spread = max(e["p99"] - e["p50"], 1.0)
        assert abs(a["approx_p50"] - e["p50"]) <= 0.2 * spread
        assert abs(a["approx_p99"] - e["p99"]) <= 0.2 * spread


def test_sketches_deterministic_across_partitionings(spark):
    """HLL registers merge by max — approx_count_distinct is exactly
    partitioning-invariant (retry/speculation safety). Quantile summaries
    are NOT guaranteed merge-invariant once compressed (ADVICE r2), so the
    percentile halves assert a tolerance, not equality."""
    a = run_spark_query("sketch_approx_stats", spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").repartition(13)
    b = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.expr("CAST(approx_percentile(value, 0.5) AS DOUBLE)").alias("approx_p50"),
            F.expr("CAST(approx_percentile(value, 0.99) AS DOUBLE)").alias("approx_p99"),
        )
        .orderBy("event_type")
        .collect()
    )
    assert [r["event_type"] for r in a] == [r["event_type"] for r in b]
    for ra, rb in zip(a, b):
        assert ra["approx_users"] == rb["approx_users"]  # HLL: exact invariance
        for c in ("approx_p50", "approx_p99"):
            spread = max(abs(ra["approx_p99"] - ra["approx_p50"]), 1.0)
            assert abs(ra[c] - rb[c]) <= 0.05 * spread
