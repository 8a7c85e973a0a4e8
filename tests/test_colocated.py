"""ColocatedTable — native-bucketed storage flavor.

The headline assertion is the plan shape: a join of two COLOCATED tables
bucketed on their join keys with equal bucket counts must execute with ZERO
Exchange on the join keys — Spark's equivalent of the reference's
shard-co-located distributed join. Everything else (round-trip, append,
NOT NULL, DML rejection, DROP) guards the flavor's contract.
"""

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.colocated import ColocatedTable
from tests.conftest import rows


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


@pytest.fixture()
def pair(mpp, spark):
    """Two colocated tables sharing bucket count, loaded with related rows."""
    mpp.sql(
        "CREATE TABLE facts(k INT, v INT) PARTITION BY (k) WITH BUCKETS 4 COLOCATED"
    )
    mpp.sql(
        "CREATE TABLE dims(k INT, name TEXT) PARTITION BY (k) WITH BUCKETS 4 COLOCATED"
    )
    n1 = mpp.insert_df(
        "facts", spark.createDataFrame([(i % 10, i) for i in range(100)], "k int, v int")
    )
    n2 = mpp.insert_df(
        "dims",
        spark.createDataFrame([(i, f"n{i}") for i in range(10)], "k int, name string"),
    )
    assert (n1, n2) == (100, 10)
    return mpp


def test_roundtrip_and_pruned_where(pair):
    got = rows(pair.sql("SELECT v FROM facts WHERE k = 3"), "v")
    assert got == [(i,) for i in range(3, 100, 10)]
    # Shards: k/n EXPLAIN contract carries over (pruning maths == bucketBy maths)
    out = pair.sql("EXPLAIN SELECT * FROM facts WHERE k = 3")
    assert "Shards: 1/4" in out


def test_colocated_join_no_exchange_on_keys(pair, spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        f = pair.table("facts").scan()
        d = pair.table("dims").scan()
        j = f.join(d, "k").groupBy("name").agg(F.sum("v").alias("s"))
        p = _plan(j)
        # both sides read bucketed, and no Exchange hash-partitions on k
        assert p.count("Bucketed: true") == 2, p
        assert "Exchange hashpartitioning(k#" not in p, p
        # sanity: result is right
        assert len(j.collect()) == 10
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_join_against_plain_side_still_works(pair, spark):
    plain = spark.createDataFrame([(3, "x")], "k int, tag string")
    j = pair.table("facts").scan().join(plain, "k")
    assert len(j.collect()) == 10


def test_native_bucket_pruning_matches_predicted_ids(pair, spark):
    """With autoBucketedScan disabled Spark prunes bucket FILES natively;
    the count must equal what pruning.py predicts (same Murmur3 pmod)."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        tbl = pair.table("facts")
        where = "k IN (1, 2) OR k = 7"
        predicted = tbl.pruned_bucket_ids(where)
        p = _plan(tbl.scan(where=where))
        assert f"SelectedBucketsCount: {len(predicted)} out of 4" in p, p
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_append_accumulates(pair, spark):
    pair.sql("INSERT INTO dims VALUES (99, 'late')")
    got = rows(pair.sql("SELECT k, name FROM dims WHERE k = 99"))
    assert got == [(99, "late")]
    assert pair.table("dims").scan().count() == 11


def test_insert_select_through_front_door(pair):
    pair.sql("INSERT INTO dims SELECT k + 100 AS k, name FROM dims WHERE k < 3")
    assert pair.table("dims").scan(where="k >= 100").count() == 3


def test_not_null_enforced(mpp, spark):
    mpp.sql(
        "CREATE TABLE nn(k INT, v TEXT NOT NULL) PARTITION BY (k) "
        "WITH BUCKETS 2 COLOCATED"
    )
    with pytest.raises(Exception, match="NOT NULL constraint failed"):
        mpp.sql("INSERT INTO nn VALUES (1, NULL)")


def test_dml_rejected(pair):
    with pytest.raises(NotImplementedError, match="UPDATE is not supported"):
        pair.sql("UPDATE facts SET v = 0 WHERE k = 1")
    with pytest.raises(NotImplementedError, match="DELETE is not supported"):
        pair.sql("DELETE FROM facts WHERE k = 1")


def test_struct_partition_column_rejected(mpp):
    with pytest.raises(ValueError, match="top-level partition column"):
        mpp.sql(
            "CREATE TABLE s(p STRUCT(a INT), v INT) PARTITION BY (p.a) "
            "WITH BUCKETS 2 COLOCATED"
        )


def test_drop_unregisters_and_recreate_gets_fresh_identity(pair, spark):
    ident = pair.table("facts").ident
    assert isinstance(pair.table("facts"), ColocatedTable)
    pair.sql("DROP TABLE facts")
    assert not spark.catalog.tableExists(ident)
    assert [r[0] for r in pair.sql("SHOW TABLES").collect()] == ["dims"]
    # re-create same name: fresh oid → fresh ident → empty table
    pair.sql(
        "CREATE TABLE facts(k INT, v INT) PARTITION BY (k) WITH BUCKETS 4 COLOCATED"
    )
    assert pair.table("facts").scan().count() == 0
