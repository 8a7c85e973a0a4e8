#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Methodology: one shared SparkSession (a real deployment amortizes session
startup), one untimed warmup action to JIT/codegen-warm the session, then
each query timed as plan + full execution with a count-style materialization
(``df.write.format("noop")`` would skip result production; we use
``_collect_to_python`` sparingly — a foreach-noop action drains results on
the executors without driver materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    # TPC-H-shape analytics
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q09_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "window_topk_per_group",
    "agg_cube",
    "agg_percentiles_exact",
    # events / time-series
    "events_sessionization",
    "asof_join_events_orders",
    "events_cohort_retention",
    "events_user_features",
    "events_resample_ffill",
    # distributed-table layer: timed as split phases (mpp_bucketed_insert /
    # mpp_pruned_scan) in bench_mpp_split() so DML and pruning perf
    # regressions are visible independently round-over-round
    # LLM-pipeline operators
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    # production-hash twin (xxhash64, no md5): benched so the variant a
    # deployment would run is measured; its DuckDB mirror for ratio
    # reading is dedup_ngram_jaccard's oracle (same algebra, md5 family)
    # — its own oracle is a recall certificate, excluded in duck_bench
    "dedup_ngram_jaccard_fast",
    "dedup_simhash_pairs",
    "embedding_neardup_pairs",
    "text_quality_score",
    "text_top_tokens",
    "text_repetition_stats",
    "text_contamination_overlap",
    "dedup_substring_spans",
    "text_tfidf_keywords",
    "graph_triangle_count",
    "pipeline_global_shuffle",
    # streaming runtime
    "streaming_hourly_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded, run_spark_query

    _ensure_loaded()
    from duckdb_mpp_spark.session import get_spark

    spark = get_spark(app_name="mpp-bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    extra = os.environ.get("BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in REGISTRY]

    def materialize(df):
        # noop sink: full JVM-side execution of the whole plan, zero
        # driver-side materialization, zero Python row serde.
        df.write.format("noop").mode("overwrite").save()
        # Release blocks pinned by localCheckpoint/persist inside the query
        # (dedup/ANN checkpoint reused self-join inputs). Leaving them
        # accumulate across queries shrinks the unified-memory execution
        # pool and spills later queries — measured 2.2 s → 9.7 s on
        # dedup_minhash_lsh_pairs when run after dedup_ngram_jaccard.
        # Per-query release is the steady-state methodology: each query is
        # measured with the engine's full memory, as a scheduler would
        # provide per job.
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # Warmup pass: run every headline query once, untimed. This is
    # steady-state methodology — the first execution pays one-time JVM JIT,
    # codegen compilation, and page-cache costs that a long-running engine
    # amortizes to zero; the timed pass measures the recurring cost.
    for name in names:
        materialize(run_spark_query(name, spark, sf_dir))

    def bench_mpp_split(timings: dict[str, float] | None) -> None:
        """Distributed-table layer, split: bucketed insert vs pruned scan
        (one combined number hides whether a regression is in the write
        shuffle or the pruning/file-index path). None → untimed warmup."""
        import tempfile

        from duckdb_mpp_spark.mpp import MppSession
        from duckdb_mpp_spark.sources import load_table

        mpp = MppSession(spark, tempfile.mkdtemp(prefix="bench_mpp_"))
        orders = load_table(spark, sf_dir, "orders")
        tbl = mpp.create_distributed_table("orders_bench", orders.schema, "o_custkey", 12)
        t0 = time.perf_counter()
        tbl.insert(orders)
        if timings is not None:
            timings["mpp_bucketed_insert"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        materialize(tbl.scan(where="o_custkey IN (1, 2, 3) OR o_custkey = 77"))
        if timings is not None:
            timings["mpp_pruned_scan"] = round(time.perf_counter() - t0, 4)
        # COW UPDATE: single-pass rewrite (matched count observed on the
        # write job itself) over the pruned bucket — regressions in the
        # DML read-once contract show up here.
        from duckdb_mpp_spark import dml

        t0 = time.perf_counter()
        dml.update(tbl, {"o_orderpriority": "'X-BENCH'"}, "o_custkey = 42")
        if timings is not None:
            timings["mpp_update"] = round(time.perf_counter() - t0, 4)
        # MERGE-style upsert: one-bucket batch → bucket-local rewrite + one
        # snapshot commit (regressions in merge locality show up here)
        from pyspark.sql import functions as _F

        batch = orders.where("o_custkey = 42").withColumn(
            "o_orderpriority", _F.lit("X-UPSERT")
        )
        t0 = time.perf_counter()
        dml.upsert(tbl, batch, ["o_custkey", "o_orderkey"])
        if timings is not None:
            timings["mpp_upsert"] = round(time.perf_counter() - t0, 4)
        # Zone-map file skipping: SORT BY table, three range-disjoint
        # ingests, date-range scan touches one generation of files.
        t_s = mpp.create_distributed_table(
            "orders_sorted_bench", orders.schema, "o_custkey", 12,
            sort_column="o_orderdate",
        )
        for lo, hi in (("1992-01-01", "1995-01-01"),
                       ("1995-01-01", "1997-01-01"),
                       ("1997-01-01", "1999-01-01")):
            t_s.insert(orders.where(f"o_orderdate >= '{lo}' AND o_orderdate < '{hi}'"))
        t0 = time.perf_counter()
        materialize(t_s.scan(
            where="o_orderdate >= DATE '1995-06-01' AND o_orderdate < DATE '1996-01-01'"
        ))
        if timings is not None:
            timings["mpp_zonemap_scan"] = round(time.perf_counter() - t0, 4)
        # Co-located join flavor: join phase timed separately from the
        # bucketed writes, so the zero-shuffle join cost is visible on its
        # own (the writes are a one-time indexing cost in a real deployment).
        from pyspark.sql import functions as F

        customer = load_table(spark, sf_dir, "customer")
        t_o = mpp.create_distributed_table(
            "orders_col", orders.schema, "o_custkey", 12, colocated=True
        )
        t_c = mpp.create_distributed_table(
            "customer_col", customer.schema, "c_custkey", 12, colocated=True
        )
        t_o.insert(orders)
        t_c.insert(customer)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t0 = time.perf_counter()
            materialize(
                t_o.scan()
                .join(t_c.scan(), F.col("o_custkey") == F.col("c_custkey"))
                .groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            if timings is not None:
                timings["mpp_colocated_join"] = round(time.perf_counter() - t0, 4)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    if not extra:
        bench_mpp_split(None)  # warmup

    timings: dict[str, float] = {}
    for name in names:
        # min-of-2 timed reps: run-to-run variance on a shared box is ±30%;
        # the minimum is the steady-state cost a scheduler would see
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(run_spark_query(name, spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    if not extra:
        bench_mpp_split(timings)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
