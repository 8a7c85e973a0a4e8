"""Regression tests for the r9 operator-layer review findings (skew /
range-join / similarity): parameter-validation holes that silently
returned empty frames, duplicate-id conflation, recursive map-type
crashes, forced corpus-proportional broadcasts, and a NULLS-ordering
divergence that could change confusion counts."""

import pytest
from pyspark.sql import functions as F


# --- skew: recursive map detection + n_salts validation ----------------------

def test_salted_agg_handles_nested_map_columns(spark):
    from duckdb_mpp_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("a", 1, [{"k": "v"}]), ("a", 2, None), ("b", 3, [{"x": "y"}])],
        "key string, v int, tags array<map<string,string>>",
    )
    got = {
        (r.key, r.n)
        for r in salted_agg(
            df, ["key"], [F.count("*").alias("c")], [F.sum("c").alias("n")]
        ).collect()
    }
    assert got == {("a", 2), ("b", 1)}


def test_salt_rejects_all_map_bearing_frames(spark):
    from duckdb_mpp_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [({"k": "v"},)], "m map<string,string>"
    )
    with pytest.raises(ValueError, match="map"):
        salted_agg(df, ["m"], [F.count("*").alias("c")], [F.sum("c").alias("n")])


@pytest.mark.parametrize("bad", [0, -3])
def test_salted_join_rejects_nonpositive_n_salts(spark, bad):
    from duckdb_mpp_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "x")], "k int, v string")
    right = spark.createDataFrame([(1, 10)], "k int, w int")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, "k", n_salts=bad)


# --- range join: bin width validation ----------------------------------------

def test_interval_bin_join_rejects_nonpositive_bin_seconds(spark):
    from duckdb_mpp_spark.operators.range_join import interval_bin_join

    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05")], "pid int, ts string"
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", "2024-01-01 00:01:00")],
        "iid int, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    with pytest.raises(ValueError, match="bin_seconds"):
        interval_bin_join(pts, iv, "ts", "s", "e", bin_seconds=0)
    # a valid width still matches
    got = interval_bin_join(pts, iv, "ts", "s", "e", bin_seconds=30).collect()
    assert [(r.pid, r.iid) for r in got] == [(1, 7)]


# --- similarity: parameter + duplicate-id validation ---------------------------

def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_blocked_pair_scores_rejects_zero_blocks(spark):
    from duckdb_mpp_spark.operators.similarity import blocked_pair_scores

    emb = _emb(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0])])
    with pytest.raises(ValueError, match="n_blocks"):
        blocked_pair_scores(emb, n_blocks=0)


def test_brute_force_topk_rejects_duplicate_corpus_ids(spark):
    from duckdb_mpp_spark.operators.similarity import brute_force_topk

    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "qid long, qv array<float>"
    )
    c = spark.createDataFrame(
        [(2, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "cid long, cv array<float>",
    )
    with pytest.raises(ValueError, match="duplicate"):
        brute_force_topk(q, c)
    # assume_unique_ids skips the validation pass (pre-validated ingest)
    ok = brute_force_topk(
        q, c.dropDuplicates(["cid"]), assume_unique_ids=True
    ).collect()
    assert len(ok) > 0


def test_kmeans_fit_rejects_duplicate_vec_ids(spark):
    from duckdb_mpp_spark.operators.similarity import kmeans_fit

    emb = _emb(spark, [(1, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])])
    with pytest.raises(ValueError, match="duplicate"):
        kmeans_fit(emb, k=2, iters=1)


def test_kmeans_fit_still_filters_null_rows(spark):
    from duckdb_mpp_spark.operators.similarity import kmeans_fit

    emb = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (None, [9.0, 9.0]), (3, None)],
    )
    cent = kmeans_fit(emb, k=2, iters=1)
    assert cent.count() == 2  # NULL id / NULL embedding never participate


# --- similarity: NULL-label centroid tiebreak ----------------------------------

def test_centroid_assign_tie_prefers_labeled_centroid(spark):
    # two identical-centroid classes, one labeled NULL: on the exact d2
    # tie the assignment must pick the NON-NULL label (NULLS LAST), like
    # the DuckDB oracle's default — before r9 Spark picked NULL FIRST,
    # changing confusion COUNTS, not just order
    from duckdb_mpp_spark.operators.similarity import nearest_centroid_assign

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [1.0, 0.0], None),
        (3, [1.0, 0.0], "a"),
        (4, [1.0, 0.0], None),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    got = {(r.label, r.assigned): r.n for r in nearest_centroid_assign(emb).collect()}
    # both centroids are identical -> every vector ties -> all assigned "a"
    assert got == {("a", "a"): 2, (None, "a"): 2}
