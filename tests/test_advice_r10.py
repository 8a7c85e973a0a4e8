"""Regression tests for the ADVICE-r9 findings fixed in round 10.

1. text.py — ``vocab_coverage`` materializes the count-of-counts frame
   (eager localCheckpoint) before fanning out to the cum/tot/targets
   branches, so the corpus-sized token groupBy executes ONCE (the r9
   executed plan tokenized the corpus ~3×; only one exchange was reused).
2. events.py — ``events_top_transitions`` excludes NULL-user rows (a
   PARTITION BY NULL pseudo-timeline fabricated transitions between
   unrelated unattributable events) and NULL-event_id rows (the ts
   tiebreak would sort them to opposite ends in Spark vs DuckDB).
3. dedup.py — the (h1, h2) minhash hash draws are factored into shared
   helpers (``_draws_md5`` / ``_draws_fast``) consumed by minhash_wide,
   minhash_wide_fast AND the fused minhash_wide_with_grams, so the
   small/large-regime value-identity of the jaccard gates can no longer
   silently diverge; the fast family now has the same fused-vs-unfused
   signature-equivalence regression the md5 family had.

Plus the r10 perf rework of dedup_incremental (VERDICT r9 #1):
4. ``incremental_dedup(broadcast_ref=True)`` — the small-regime broadcast
   fusion is value-identical to the shuffle plan and actually plans a
   broadcast join.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.dedup import (
    incremental_dedup,
    minhash_wide_fast,
    minhash_wide_with_grams,
)
from duckdb_mpp_spark.operators.text import vocab_coverage
from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded

_ensure_loaded()


# --- 1. vocab_coverage single corpus pass ------------------------------------

def test_vocab_coverage_reads_corpus_once(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta beta gamma " * (i + 1)) for i in range(20)],
        "doc_id long, text string",
    )
    out = vocab_coverage(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every branch below the checkpoint reads the materialized RDD; the
    # original LocalTableScan (the corpus) must appear ZERO times in the
    # final plan — i.e. no branch re-derives the token counts
    assert "LocalTableScan" not in plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    rows = {r["target"]: r for r in out.collect()}
    assert set(rows) == {0.5, 0.9, 0.99}
    # beta carries 2/4 of mass: the 50% target needs exactly 1 token
    assert rows[0.5]["vocab_size"] == 1 and rows[0.5]["covered_share"] == 0.5


# --- 2. events_top_transitions NULL user / NULL event_id ---------------------

def test_top_transitions_null_user_and_event_id(spark, shadow_views):
    rows = [
        # two unrelated NULL-user events — must NOT fabricate a transition
        (1, None, "zz_a", "2024-01-01 00:00:00", 1.0),
        (2, None, "zz_b", "2024-01-01 00:01:00", 1.0),
        # NULL event_id inside an equal-ts run — excluded from the timeline
        (None, 7, "zz_c", "2024-01-01 00:00:00", 1.0),
        (3, 7, "zz_d", "2024-01-01 00:00:00", 1.0),
        (4, 7, "zz_e", "2024-01-01 00:02:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string, value double"
    ).select(
        "event_id", "user_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"), "value",
    )
    shadow_views("events", df.select("event_id", "user_id", "event_type", "ts", "value"))
    out = {
        (r["transition"], r["n"])
        for r in spark.sql(REGISTRY["events_top_transitions"].spark).collect()
    }
    # the only surviving timeline is user 7's (zz_d -> zz_e); the NULL-user
    # pair and any transition through the NULL-event_id row are gone
    assert out == {("zz_d>zz_e", 1)}

    # same crafted rows through the DuckDB oracle text — dialects agree
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({ 'NULL' if e is None else e }, { 'NULL' if u is None else u }, "
            f"'{t}', TIMESTAMP '{ts}', {v})"
            for e, u, t, ts, v in rows
        )
        + ") t(event_id, user_id, event_type, ts, value)"
    )
    duck = {
        (t, n)
        for t, n in con.execute(REGISTRY["events_top_transitions"].spark).fetchall()
    }
    con.close()
    assert duck == out


# --- 3. shared hash draws: fused == unfused for BOTH families ----------------

@pytest.fixture(scope="module")
def draw_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "a completely different document with its own token stream here"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )


@pytest.mark.parametrize("fast", [False, True])
def test_fused_signature_matches_unfused(spark, draw_docs, fast):
    from duckdb_mpp_spark.operators.dedup import minhash_wide

    fused = minhash_wide_with_grams(draw_docs, fast=fast).drop("g")
    plain = (minhash_wide_fast if fast else minhash_wide)(draw_docs)
    f = sorted([tuple(r) for r in fused.collect()])
    p = sorted([tuple(r) for r in plain.collect()])
    assert f == p, "fused and candidate-filtered regimes drew different (h1, h2)"


# --- 4. incremental broadcast fusion -----------------------------------------

def test_incremental_broadcast_ref_value_identical(spark):
    idx = spark.createDataFrame(
        [(10, 0, "k1"), (11, 1, "k9")], "doc_id long, band int, band_key string"
    )
    batch = spark.createDataFrame(
        [
            (100, 0, "k1"),  # hits index 10 -> dup_index
            (101, 2, "k5"),  # hits nothing
            (102, 2, "k5"),  # hits earlier batch 101 -> dup_batch
            (103, 3, "kX"),  # new
        ],
        "doc_id long, band int, band_key string",
    )
    want = sorted(
        [
            (100, "dup_index", 10),
            (101, "new", None),
            (102, "dup_batch", 101),
            (103, "new", None),
        ]
    )

    def run(bc):
        out = incremental_dedup(
            idx, batch, materialize_batch=False, prefilter=False, broadcast_ref=bc
        )
        return sorted([tuple(r) for r in out.collect()]), out

    got_bc, df_bc = run(True)
    got_sh, _ = run(False)
    assert got_bc == want == got_sh
    plan = df_bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
