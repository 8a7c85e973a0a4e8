"""Plan- and contract-level pins for the r9 perf rewrites (VERDICT r8
#1-#3): the gram-set jaccard verify, the hit-bounded contamination shape,
the single-task size-switched plans, and the load_table schema cache.
Values are oracle-pinned by tests/test_oracle.py; these tests pin the
STRUCTURAL claims a value check can't see."""

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _executed(df):
    df.write.format("noop").mode("overwrite").save()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


# --- single-task size-switched plans ----------------------------------------

@pytest.mark.parametrize("name", ["dedup_exact", "pipeline_global_shuffle"])
def test_small_regime_plans_have_no_exchange(spark, name):
    from duckdb_mpp_spark.queries import run_spark_query

    p = _executed(run_spark_query(name, spark, SF_SMALL))
    assert "Exchange" not in p, p


def test_exact_dedup_single_task_matches_parallel_shape(spark):
    from duckdb_mpp_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None), (5, None)],
        "doc_id bigint, text string",
    )
    par = {tuple(r) for r in exact_dedup(docs).collect()}
    single = {tuple(r) for r in exact_dedup(docs.coalesce(1)).collect()}
    assert par == single
    got = {r.doc_id: (r.group_size, r.kept) for r in exact_dedup(docs).collect()}
    # NULL texts stay singletons; duplicate group elects min-id keeper
    assert got[1] == (2, True) and got[2] == (2, False)
    assert got[4] == (1, True) and got[5] == (1, True)


# --- gram-set jaccard verify ---------------------------------------------------

def test_gramset_verify_surfaces_zero_intersection_pairs(spark):
    # new r9 contract: a candidate pair whose docs share no gram is a
    # jaccard-0.0 ROW, not an absence (callers threshold)
    from duckdb_mpp_spark.operators.dedup import jaccard_verify_from_docs

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "vv ww xx yy zz"), (3, "aa bb cc dd ff")],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a bigint, doc_b bigint")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_verify_from_docs(docs, pairs).collect()
    }
    assert got[(1, 2)] == 0.0
    # docs 1 and 3 share 2 of their 3 grams each: j = 2 / (3 + 3 - 2)
    assert got[(1, 3)] == 0.5


def test_gramset_verify_merges_duplicate_doc_ids(spark):
    # duplicate ids: gram sets union per id (collect_set across rows),
    # matching the oracle's per-doc DISTINCT dsh
    from duckdb_mpp_spark.operators.dedup import jaccard_verify_from_docs

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (1, "aa bb cc dd ee"), (2, "aa bb cc dd ee")],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    got = jaccard_verify_from_docs(docs, pairs).collect()
    assert len(got) == 1 and got[0].jaccard == 1.0


def test_gramset_broadcast_is_size_switched(spark):
    # bench-scale docs: the gram-set side must broadcast (static hint);
    # the verify stage must carry no gram-level shuffle join
    from duckdb_mpp_spark.queries import run_spark_query

    p = _executed(run_spark_query("dedup_ngram_jaccard", spark, SF_SMALL))
    assert "BroadcastHashJoin" in p, p


# --- hit-bounded contamination -------------------------------------------------

def test_contamination_null_id_rows_match_oracle_drop(spark):
    # inner-join-on-id semantics: a NULL-id doc can never surface (the
    # DuckDB oracle's JOIN USING (doc_id) drops it identically)
    from duckdb_mpp_spark.operators.corpus import contamination_overlap

    docs = spark.createDataFrame(
        [(None, "the quick brown fox jumps"), (2, "the quick brown fox runs")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the quick brown fox naps")], "doc_id bigint, text string"
    )
    got = contamination_overlap(docs, bench).collect()
    assert [r.doc_id for r in got] == [2]


def test_contamination_shuffles_are_hit_bounded(spark):
    # the corpus gram stream must be filtered by a broadcast join BEFORE
    # any exchange: no plain (unfiltered) corpus-wide aggregate exchange.
    # Structural proxy: both aggregates sit above a BroadcastHashJoin /
    # semi-join, so every Exchange input is hit- or candidate-filtered.
    from duckdb_mpp_spark.queries import run_spark_query

    p = _executed(
        run_spark_query("text_contamination_overlap", spark, SF_SMALL)
    )
    assert "BroadcastHashJoin" in p, p
    # the old corpus-wide shape grouped on (doc_id, sh) straight off the
    # scan — its signature was an Exchange hashpartitioning(doc_id, sh)
    assert "hashpartitioning(doc_id" not in p or "LeftSemi" in p, p


# --- load_table schema cache ---------------------------------------------------

def test_load_table_schema_cached_second_read_runs_no_job(spark):
    from duckdb_mpp_spark.sources import load_table

    load_table(spark, SF_SMALL, "orders")  # populate cache (may run a job)
    sc = spark.sparkContext
    group = "schema-cache-probe"
    sc.setJobGroup(group, "probe")
    df = load_table(spark, SF_SMALL, "orders")  # reader build only
    sc.setJobGroup("", "")
    assert df.schema  # usable schema
    assert sc.statusTracker().getJobIdsForGroup(group) == []


def test_schema_cache_detects_path_rewrite_by_mtime(spark, tmp_path):
    # a rewrite bumps the path's mtime, so the cache misses WITHOUT any
    # manual clear — the staleness class (Spark silently prunes added
    # columns / null-fills dropped ones under an explicit schema) cannot
    # occur for on-disk rewrites
    from duckdb_mpp_spark.sources import load_table

    p = str(tmp_path)
    spark.createDataFrame([(1,)], "a bigint").write.parquet(f"{p}/orders.parquet")
    assert load_table(spark, p, "orders").columns == ["a"]
    spark.createDataFrame([(1, 2)], "a bigint, b bigint").write.mode(
        "overwrite"
    ).parquet(f"{p}/orders.parquet")
    assert load_table(spark, p, "orders").columns == ["a", "b"]


# --- fused small-regime jaccard (late-r9) -----------------------------------

def test_fused_jaccard_reads_checkpoint_not_second_corpus_pass(spark):
    # Under the 256 MiB switch the gate's FINAL action must consume the
    # eagerly-checkpointed signature+gram-set table (Scan ExistingRDD);
    # the banding explode may appear once per self-join side over that
    # checkpoint, but a shingle explode (explode of an index SEQUENCE) in
    # the final plan means the verify branch went back to the corpus —
    # the exact re-evaluation the fusion exists to remove.
    from duckdb_mpp_spark.queries import run_spark_query

    p = _executed(run_spark_query("dedup_ngram_jaccard", spark, SF_SMALL))
    assert "ExistingRDD" in p, p
    assert "explode(sequence" not in p, p


def test_fused_and_scale_paths_value_identical(spark):
    # the fused (checkpointed gram-set) and candidate-filtered shapes must
    # return identical scored pairs on the same corpus
    from duckdb_mpp_spark.operators.dedup import (
        _bands_from_wide,
        _spread,
        jaccard_score_pairs,
        jaccard_verify_from_docs,
        lsh_candidate_pairs,
        minhash_bands,
        minhash_wide_with_grams,
    )
    from duckdb_mpp_spark.sources import load_table

    docs = _spread(load_table(spark, SF_SMALL, "documents"), "doc_id")
    wide = minhash_wide_with_grams(docs).localCheckpoint(eager=True)
    fused = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_score_pairs(
            wide.select("doc_id", "g"),
            lsh_candidate_pairs(_bands_from_wide(wide), materialize=False),
            broadcast_sets=True,
        ).collect()
    }
    scale = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_verify_from_docs(
            docs,
            lsh_candidate_pairs(minhash_bands(docs), materialize=False),
            candidate_repartition=False,
        ).collect()
    }
    assert fused == scale and len(fused) > 0
