"""Differential correctness harness — mirrors the driver's t2 gate.

For every registered query: run the Spark side and the DuckDB oracle on the
same parquet fixtures, compare row count, column names, and values
(order-insensitive, column-name-sorted — the driver's compare). Runs at
sf0.001 so the full suite stays fast; the driver repeats this at sf0.01.
"""

import math
import os

import duckdb
import pytest

from duckdb_mpp_spark.queries import REGISTRY, oracle_sqls, run_spark_query
from duckdb_mpp_spark.sources import TABLE_NAMES

SF_DIR = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(oracle_sqls()))
def test_query_matches_oracle(name, spark, duck):
    sdf = run_spark_query(name, spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    oracle = REGISTRY[name].oracle_sql()
    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    _, s = _canon(spark_cols, spark_rows)
    _, d = _canon(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still run and return a stable schema."""
    for name, q in REGISTRY.items():
        if q.oracle_sql() is None:
            df = run_spark_query(name, spark, SF_DIR)
            assert df.columns, name
            assert df.count() >= 0, name


def test_approx_count_distinct_tolerance(spark):
    """approx_count_distinct is sketch-based (HLL) so it has no cross-engine
    oracle; assert the documented error bound against the exact count."""
    from duckdb_mpp_spark.sources import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    from pyspark.sql import functions as F

    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.count_distinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_rotation_green_excludes_hash_mismatch(tmp_path, monkeypatch):
    """review r4: a driver row with hash_match=False is a content MISMATCH
    even when rows_match is true — it must stay in tier 0 (re-verify
    first), while hash-null rows-only passes and hash-true rows count as
    green for their round."""
    import json

    from duckdb_mpp_spark import queries as q

    doc = {
        "hash_red": {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None},
        "green": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "err": None},
        "rows_only": {"rows_match": True, "schema_match": None,
                      "hash_match": None, "err": None},
        "no_oracle": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": "no_oracle"},
    }
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(doc))
    monkeypatch.setattr(q, "_REPO_ROOT", str(tmp_path))
    fresh = q._freshest_green_round()
    assert fresh == {"green": 7, "rows_only": 7}
