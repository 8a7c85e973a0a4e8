"""File-format source/sink round-trips (CSV / JSON / ORC / partitioned
parquet), including a DuckDB cross-read of the CSV sink and a
partition-pruning plan assertion."""

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.sources import load_table
from duckdb_mpp_spark.sources.formats import read_df, write_df

SF_DIR = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.001")


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF_DIR, "lineitem")


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip(spark, lineitem, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("fmt") / f"lineitem_{fmt}")
    write_df(lineitem, path, fmt)
    back = read_df(spark, path, fmt, schema=lineitem.schema)
    assert back.schema == lineitem.schema
    cols = lineitem.columns
    assert _sorted_rows(back, cols) == _sorted_rows(lineitem, cols)


def test_csv_duckdb_cross_read(spark, lineitem, tmp_path_factory):
    """The CSV sink is plain interchange CSV — DuckDB reads the same files
    to identical rows (sink correctness verified by a second engine)."""
    path = str(tmp_path_factory.mktemp("fmt") / "lineitem_csv")
    write_df(lineitem.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"), path, "csv")
    files = sorted(glob.glob(os.path.join(path, "*.csv")))
    assert files
    con = duckdb.connect()
    duck_rows = con.execute(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag "
        f"FROM read_csv({files!r}, header=true, nullstr='\\N') ORDER BY 1, 2, 3, 4"
    ).fetchall()
    spark_rows = sorted(
        tuple(r)
        for r in lineitem.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag").collect()
    )
    assert duck_rows == spark_rows


def test_partitioned_parquet_prunes(spark, tmp_path_factory):
    """partitionBy layout: an equality filter on the partition column must
    become a PartitionFilter (directory pruning), not a data filter."""
    path = str(tmp_path_factory.mktemp("fmt") / "events_by_type")
    events = load_table(spark, SF_DIR, "events")
    write_df(events, path, "parquet", partition_by=["event_type"])
    back = read_df(spark, path, "parquet")
    one = back.where(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    expected = events.where(F.col("event_type") == "click").count()
    assert one.count() == expected
    # only the matching directory's files are listed
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(path, "event_type=*"))}
    assert "event_type=click" in dirs and len(dirs) > 1


def test_json_round_trip_preserves_microsecond_timestamps(spark, tmp_path):
    """review r4: Spark's JSON defaults truncate timestamps to ms on write
    and read them back as strings — the format options must make the
    write→read round-trip exact, like the CSV path."""
    from duckdb_mpp_spark.sources.formats import read_df, write_df

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00.123456")], "id long, ts string"
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts")
    p = str(tmp_path / "j")
    write_df(df, p, "json")
    back = read_df(spark, p, "json", schema="id long, ts timestamp")
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in df.collect()]
    # inference (no schema) also recovers a timestamp, not a string
    inferred = read_df(spark, p, "json")
    assert dict(inferred.dtypes)["ts"].startswith("timestamp")
