"""Sketch accuracy contracts.

The gate entry `sketch_approx_stats` now emits exact distinct counts plus
per-sketch accuracy verdicts as booleans (oracle-expressible rows); these
tests keep the tighter numeric contracts on the raw estimators (HLL++
advertises ~2.3% standard error at the default rsd=0.05; approx_percentile's
rank error is bounded by 1/accuracy) and assert the gate's verdicts are all
TRUE at test scale.
"""

import os

from pyspark.sql import functions as F

from duckdb_mpp_spark.queries import run_spark_query
from duckdb_mpp_spark.sources import load_table

SF_DIR = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.001")


def _approx_stats(spark, repartition: int | None = None):
    ev = load_table(spark, SF_DIR, "events")
    if repartition:
        ev = ev.repartition(repartition)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.expr("CAST(approx_percentile(value, 0.5) AS DOUBLE)").alias("approx_p50"),
            F.expr("CAST(approx_percentile(value, 0.99) AS DOUBLE)").alias("approx_p99"),
        )
        .orderBy("event_type")
        .collect()
    )


def test_gate_verdicts_all_true(spark):
    """The driver gate's boolean verdict columns must all be TRUE (the
    DuckDB oracle states them as literal TRUE rows)."""
    rows = run_spark_query("sketch_approx_stats", spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["users_ok"] and r["p50_ok"] and r["p99_ok"], r
        assert r["exact_users"] > 0


def test_sketch_error_bounds(spark):
    approx = {r["event_type"]: r for r in _approx_stats(spark)}
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
    a = _approx_stats(spark)
    b = _approx_stats(spark, repartition=13)
    assert [r["event_type"] for r in a] == [r["event_type"] for r in b]
    for ra, rb in zip(a, b):
        assert ra["approx_users"] == rb["approx_users"]  # HLL: exact invariance
        for c in ("approx_p50", "approx_p99"):
            spread = max(abs(ra["approx_p99"] - ra["approx_p50"]), 1.0)
            assert abs(ra[c] - rb[c]) <= 0.05 * spread
