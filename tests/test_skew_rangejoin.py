"""Salted-skew operators and binned range join: equivalence against the
unsalted/unbinned formulations, including a hypothesis sweep over the
interval-join boundary cases (end-exclusive, bin-misaligned)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.range_join import interval_bin_join
from duckdb_mpp_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds ~90% of rows — the classic hot-key shape
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 100).cast("long")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    return df.cache()


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        (r.k): (r.n, r.s)
        for r in skewed.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in salted_agg(
            skewed,
            ["k"],
            [F.count("*").alias("pc"), F.sum("v").alias("ps")],
            [F.sum("pc").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame([(k, f"name_{k}") for k in range(100)], "k long, name string")
    plain = sorted((r.k, r.v, r.name) for r in skewed.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.name) for r in salted_join(skewed, dim, "k").collect())
    assert plain == salted


EPOCH = dt.datetime(2000, 1, 1)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    points=st.lists(st.integers(0, 500_000), min_size=1, max_size=30),
    intervals=st.lists(
        st.tuples(st.integers(0, 500_000), st.integers(1, 100_000)), min_size=1, max_size=8
    ),
    bin_seconds=st.sampled_from([3600, 86400, 7 * 86400]),
)
def test_interval_bin_join_matches_naive(spark, points, intervals, bin_seconds):
    pts = spark.createDataFrame(
        [(i, EPOCH + dt.timedelta(seconds=s)) for i, s in enumerate(points)], "pid int, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [
            (j, EPOCH + dt.timedelta(seconds=a), EPOCH + dt.timedelta(seconds=a + w))
            for j, (a, w) in enumerate(intervals)
        ],
        "iid int, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_bin_join(pts, ivs, "ts", "s", "e", bin_seconds=bin_seconds).collect()
    )
    want = sorted(
        (i, j)
        for i, sec in enumerate(points)
        for j, (a, w) in enumerate(intervals)
        if a <= sec < a + w
    )
    assert got == want


def test_connected_components_long_chain(spark):
    """A 25-node path graph has diameter 24 — worst case for min-label
    propagation; the loop must iterate past trivial convergence and
    label every node with the chain head."""
    from duckdb_mpp_spark.operators.dedup import connected_components

    n = 25
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in range(n)] + [(100,), (101,), (999,)], "doc_id long"
    )
    labels = {r.node: r.label for r in connected_components(pairs, nodes).collect()}
    assert all(labels[i] == 0 for i in range(n))
    assert labels[100] == labels[101] == 100
    assert labels[999] == 999


def test_interval_bin_join_subsecond_end_boundary(spark):
    """review r4 (empirically confirmed miss): an interval end with a
    sub-second fraction just past a bin boundary must still cover the
    boundary bin — unix_timestamp truncates, so the old `bin(end - 1s)`
    upper bound dropped valid matches."""
    ivs = spark.createDataFrame(
        [("i1", "2000-01-01 23:00:00", "2000-01-02 00:00:00.5")],
        "iid string, s string, e string",
    ).selectExpr("iid", "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e")
    pts = spark.createDataFrame(
        [("p1", "2000-01-02 00:00:00.2"), ("p2", "2000-01-02 00:00:00.5")],
        "pid string, ts string",
    ).selectExpr("pid", "CAST(ts AS TIMESTAMP) AS ts")
    got = sorted(
        r["pid"]
        for r in interval_bin_join(pts, ivs, "ts", "s", "e", bin_seconds=3600).collect()
    )
    # p1 is inside [s, e); p2 sits exactly at e (exclusive) and must NOT match
    assert got == ["p1"]


def test_interval_bin_join_rejects_outer(spark):
    ivs = spark.createDataFrame(
        [("i1", "2000-01-01 00:00:00", "2000-01-02 00:00:00")],
        "iid string, s string, e string",
    ).selectExpr("iid", "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e")
    pts = spark.createDataFrame([("p1", "2000-01-01 12:00:00")], "pid string, ts string") \
        .selectExpr("pid", "CAST(ts AS TIMESTAMP) AS ts")
    import pytest

    with pytest.raises(ValueError, match="inner"):
        interval_bin_join(pts, ivs, "ts", "s", "e", how="left")


def test_salted_ops_reject_reserved_salt_column(spark):
    """review r6: a user '__salt' column would be silently overwritten and
    dropped — reject loudly like the storage layer's reserved names."""
    from duckdb_mpp_spark.operators.skew import salted_agg, salted_join

    df = spark.createDataFrame([(1, 2)], "k int, __salt int")
    clean = spark.createDataFrame([(1, 2)], "k int, v int")
    with pytest.raises(ValueError, match="__salt"):
        salted_agg(df, ["k"], [F.count("*").alias("c")], [F.sum("c").alias("n")])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(df, clean, on="k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(clean, df, on="k")


def test_salt_skips_map_columns(spark):
    """review r6: xxhash64 rejects map types — the salt must hash only
    hashable columns so salted ops work on frames carrying a map."""
    from duckdb_mpp_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(1, {"a": "b"}), (1, {"c": "d"}), (2, {"e": "f"})],
        "k int, props map<string,string>",
    )
    got = {
        r["k"]: r["n"]
        for r in salted_agg(
            df, ["k"], [F.count(F.lit(1)).alias("c")], [F.sum("c").alias("n")]
        ).collect()
    }
    assert got == {1: 2, 2: 1}


def test_interval_bin_join_inverted_and_shared_names(spark):
    """review r6: inverted intervals (end <= start) must not fan out via a
    DESCENDING sequence, and shared column names between the two sides
    must not make the residual filter ambiguous."""
    import datetime as dt

    from duckdb_mpp_spark.operators.range_join import interval_bin_join

    t = lambda s: dt.datetime.fromisoformat(s)
    # intervals carry their own 'ts' column (same name as the point column)
    intervals = spark.createDataFrame(
        [
            (t("2024-01-10 00:00:00"), t("2024-01-20 00:00:00"), t("2000-01-01 00:00:00")),
            (t("2024-03-01 00:00:00"), t("1970-01-01 00:00:00"), t("2000-01-01 00:00:00")),  # inverted
        ],
        "win_start timestamp, win_end timestamp, ts timestamp",
    )
    points = spark.createDataFrame(
        [(1, t("2024-01-15 12:00:00")), (2, t("2024-02-15 12:00:00"))],
        "pid int, ts timestamp",
    )
    got = interval_bin_join(points, intervals, "ts", "win_start", "win_end")
    rows = got.select("pid").collect()
    assert [r["pid"] for r in rows] == [1]
    # reserved __bin rejected
    bad = points.withColumn("__bin", F.lit(0))
    with pytest.raises(ValueError, match="__bin"):
        interval_bin_join(bad, intervals, "ts", "win_start", "win_end")
