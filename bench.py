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


def _read_first(path: str) -> str | None:
    try:
        with open(path) as f:
            return f.read()
    except Exception:
        return None


def _psi_some_total_us(kind: str) -> int | None:
    """Total stall time (us) from /proc/pressure/<kind>, 'some' line."""
    raw = _read_first(f"/proc/pressure/{kind}")
    if not raw:
        return None
    for line in raw.splitlines():
        if line.startswith("some"):
            for tok in line.split():
                if tok.startswith("total="):
                    return int(tok.split("=", 1)[1])
    return None


def _cgroup_cpu_stat() -> dict[str, int]:
    """cgroup-v2 cpu.stat throttle counters for this process's cgroup."""
    cg = _read_first("/proc/self/cgroup") or ""
    rel = cg.strip().rsplit(":", 1)[-1] if cg else ""
    raw = _read_first(f"/sys/fs/cgroup{rel}/cpu.stat") or _read_first(
        "/sys/fs/cgroup/cpu.stat"
    )
    out: dict[str, int] = {}
    for line in (raw or "").splitlines():
        k, _, v = line.partition(" ")
        if k in ("nr_throttled", "throttled_usec", "usage_usec"):
            out[k] = int(v)
    return out


class _Diag:
    """Stall-diagnosis probe (VERDICT r10 #1): snapshots the resources a
    whole-leg Spark stall could implicate — JVM GC time (JMX beans over
    py4j), JVM process CPU (/proc/<pid>/stat — in local mode ALL executor
    work is this one JVM), host load / available memory, PSI stall
    totals, and cgroup CPU-throttle counters. Deltas between snapshots
    say WHICH resource moved during a slow window: gc_ms up → heap
    pathology (session-internal); jvm cpu-share down with loadavg up →
    external CPU contention; psi_io/mem up → page-cache eviction;
    throttled_usec up → cgroup throttling."""

    def __init__(self, spark):
        self._spark = spark
        try:
            self._jvm_pid = int(
                spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
            )
        except Exception:
            self._jvm_pid = None
        self._tick = os.sysconf("SC_CLK_TCK")

    def _jvm_gc_ms(self) -> int | None:
        try:
            beans = (
                self._spark.sparkContext._jvm.java.lang.management
                .ManagementFactory.getGarbageCollectorMXBeans()
            )
            return sum(b.getCollectionTime() for b in beans)
        except Exception:
            return None

    def _jvm_cpu_s(self) -> float | None:
        if self._jvm_pid is None:
            return None
        raw = _read_first(f"/proc/{self._jvm_pid}/stat")
        if not raw:
            return None
        # fields 14/15 (1-based) after the parenthesized comm
        rest = raw.rsplit(")", 1)[-1].split()
        return round((int(rest[11]) + int(rest[12])) / self._tick, 2)

    def _stat_cpu(self) -> dict:
        """Aggregate /proc/stat cpu line: guest-visible busy time plus
        STEAL — on this Firecracker guest, steal is the one counter that
        distinguishes 'the hypervisor descheduled our vCPUs' (host
        contention; steal climbs) from in-guest causes."""
        raw = _read_first("/proc/stat") or ""
        for line in raw.splitlines():
            if line.startswith("cpu "):
                f = [int(x) for x in line.split()[1:]]
                # user nice system idle iowait irq softirq steal
                return {
                    "busy_s": round(sum(f[:3] + f[5:7]) / self._tick, 2),
                    "iowait_s": round(f[4] / self._tick, 2),
                    "steal_s": round(f[7] / self._tick, 2) if len(f) > 7 else None,
                }
        return {}

    @staticmethod
    def _cpu_mhz() -> float | None:
        raw = _read_first("/proc/cpuinfo") or ""
        mhz = [float(l.split(":")[1]) for l in raw.splitlines()
               if l.lower().startswith("cpu mhz")]
        return round(sum(mhz) / len(mhz), 0) if mhz else None

    def snap(self) -> dict:
        mem_kb = None
        meminfo = _read_first("/proc/meminfo") or ""
        for line in meminfo.splitlines():
            if line.startswith("MemAvailable"):
                mem_kb = int(line.split()[1])
                break
        load = _read_first("/proc/loadavg")
        return {
            "t": round(time.perf_counter(), 3),
            "gc_ms": self._jvm_gc_ms(),
            "jvm_cpu_s": self._jvm_cpu_s(),
            "loadavg1": float(load.split()[0]) if load else None,
            "mem_avail_mb": mem_kb // 1024 if mem_kb is not None else None,
            "psi_cpu_us": _psi_some_total_us("cpu"),
            "psi_mem_us": _psi_some_total_us("memory"),
            "psi_io_us": _psi_some_total_us("io"),
            "cgroup": _cgroup_cpu_stat(),
            "stat": self._stat_cpu(),
            "cpu_mhz": self._cpu_mhz(),
        }

    @staticmethod
    def delta(a: dict, b: dict) -> dict:
        """b - a for the monotone counters; endpoints for the gauges."""
        # normalize shares by ONLINE CPUs, not the Spark thread knob:
        # /proc/stat steal and JVM cpu-time accumulate over every vCPU
        # regardless of SPARK_GRAFT_CPUS, so a user running Spark at 8
        # threads on the 32-vCPU guest would otherwise see shares 4x too
        # high (review r11)
        ncpu = os.cpu_count() or 1
        out = {"wall_s": round(b["t"] - a["t"], 2)}
        for k in ("gc_ms", "jvm_cpu_s", "psi_cpu_us", "psi_mem_us", "psi_io_us"):
            if a.get(k) is not None and b.get(k) is not None:
                out[k] = round(b[k] - a[k], 2)
        for k in ("nr_throttled", "throttled_usec"):
            if k in a.get("cgroup", {}) and k in b.get("cgroup", {}):
                out[k] = b["cgroup"][k] - a["cgroup"][k]
        for k in ("busy_s", "iowait_s", "steal_s"):
            va, vb = a.get("stat", {}).get(k), b.get("stat", {}).get(k)
            if va is not None and vb is not None:
                out[k] = round(vb - va, 2)
        if out.get("steal_s") is not None and out["wall_s"] > 0:
            out["steal_share"] = round(out["steal_s"] / (out["wall_s"] * ncpu), 4)
        out["cpu_mhz"] = [a.get("cpu_mhz"), b.get("cpu_mhz")]
        out["loadavg1"] = [a.get("loadavg1"), b.get("loadavg1")]
        out["mem_avail_mb"] = [a.get("mem_avail_mb"), b.get("mem_avail_mb")]
        if out.get("jvm_cpu_s") is not None and out["wall_s"] > 0:
            out["jvm_cpu_share"] = round(
                out["jvm_cpu_s"] / (out["wall_s"] * ncpu), 3
            )
        if out.get("gc_ms") is not None and out["wall_s"] > 0:
            out["gc_share"] = round(out["gc_ms"] / (out["wall_s"] * 1000), 4)
        return out

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
    # r13: the three operators registered this round (VERDICT r12 #1) —
    # benched from day one so their perf trend starts with their gate
    "dedup_cut_spans",
    "pipeline_decontaminate_train",
    "pipeline_budget_select",
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

    def bench_mpp_split() -> dict[str, float]:
        """Distributed-table layer, split: bucketed insert vs pruned scan
        (one combined number hides whether a regression is in the write
        shuffle or the pruning/file-index path). One call = one rep over a
        FRESH temp warehouse (removed afterwards); the caller applies the
        same two-sweep / min-of-2 protocol as the rest of the suite
        (VERDICT r13 #1 — the one-shot timing of this block produced six
        phantom 2-6x regressions in PERF_r13 from a single steal burst)."""
        import shutil
        import tempfile

        from duckdb_mpp_spark.mpp import MppSession
        from duckdb_mpp_spark.sources import load_table

        out: dict[str, float] = {}
        root = tempfile.mkdtemp(prefix="bench_mpp_")
        try:
            mpp = MppSession(spark, root)
            orders = load_table(spark, sf_dir, "orders")
            tbl = mpp.create_distributed_table(
                "orders_bench", orders.schema, "o_custkey", 12
            )
            t0 = time.perf_counter()
            tbl.insert(orders)
            out["mpp_bucketed_insert"] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            materialize(tbl.scan(where="o_custkey IN (1, 2, 3) OR o_custkey = 77"))
            out["mpp_pruned_scan"] = round(time.perf_counter() - t0, 4)
            # COW UPDATE: single-pass rewrite (matched count observed on the
            # write job itself) over the pruned bucket — regressions in the
            # DML read-once contract show up here.
            from duckdb_mpp_spark import dml

            t0 = time.perf_counter()
            dml.update(tbl, {"o_orderpriority": "'X-BENCH'"}, "o_custkey = 42")
            out["mpp_update"] = round(time.perf_counter() - t0, 4)
            # MERGE-style upsert: one-bucket batch → bucket-local rewrite +
            # one snapshot commit (regressions in merge locality show here)
            from pyspark.sql import functions as _F

            batch = orders.where("o_custkey = 42").withColumn(
                "o_orderpriority", _F.lit("X-UPSERT")
            )
            t0 = time.perf_counter()
            dml.upsert(tbl, batch, ["o_custkey", "o_orderkey"])
            out["mpp_upsert"] = round(time.perf_counter() - t0, 4)
            # Zone-map file skipping: SORT BY table, three range-disjoint
            # ingests, date-range scan touches one generation of files.
            t_s = mpp.create_distributed_table(
                "orders_sorted_bench", orders.schema, "o_custkey", 12,
                sort_column="o_orderdate",
            )
            for lo, hi in (("1992-01-01", "1995-01-01"),
                           ("1995-01-01", "1997-01-01"),
                           ("1997-01-01", "1999-01-01")):
                t_s.insert(
                    orders.where(f"o_orderdate >= '{lo}' AND o_orderdate < '{hi}'")
                )
            t0 = time.perf_counter()
            materialize(t_s.scan(
                where="o_orderdate >= DATE '1995-06-01'"
                      " AND o_orderdate < DATE '1996-01-01'"
            ))
            out["mpp_zonemap_scan"] = round(time.perf_counter() - t0, 4)
            # Co-located join flavor: join phase timed separately from the
            # bucketed writes, so the zero-shuffle join cost is visible on
            # its own (the writes are a one-time indexing cost in a real
            # deployment).
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
            from duckdb_mpp_spark.session import conf_guard

            with conf_guard(
                spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
            ):
                t0 = time.perf_counter()
                materialize(
                    t_o.scan()
                    .join(t_c.scan(), F.col("o_custkey") == F.col("c_custkey"))
                    .groupBy("c_mktsegment")
                    .agg(F.count(F.lit(1)).alias("n"))
                )
                out["mpp_colocated_join"] = round(time.perf_counter() - t0, 4)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return out

    if not extra:
        bench_mpp_split()  # warmup

    # TWO time-separated timed sweeps (VERDICT r10 #7): the box's known
    # measurement pathology is a minutes-long uniform slowdown of one
    # whole leg. A single sweep absorbs it silently (BENCH_r10's +15%
    # phantom); with two sweeps the per-query min recovers the clean
    # cost whenever at least one sweep ran clean, and a >25% divergence
    # between the sweep totals (the same rule bench_pairs applies across
    # legs) flags the run so a reader never mistakes the pathology for a
    # regression. Each sweep keeps the min-of-2 reps (run-to-run
    # variance on a shared box is ±30%; the minimum is the steady-state
    # cost a scheduler would see).
    diag = _Diag(spark)
    sweeps: list[dict[str, float]] = []
    sweep_diags: list[dict] = []
    for _sweep in range(2):
        sw: dict[str, float] = {}
        s0 = diag.snap()
        for name in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                materialize(run_spark_query(name, spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            sw[name] = round(best, 4)
        # mpp split block under the SAME sweep protocol (VERDICT r13 #1):
        # min-of-2 reps per sweep, each rep on a fresh temp warehouse, so
        # the six DML/pruning gates get sweep minima and count toward the
        # stall rule instead of riding one unprotected 10 s window.
        if not extra:
            for rep in (bench_mpp_split(), bench_mpp_split()):
                for k, v in rep.items():
                    sw[k] = min(sw.get(k, float("inf")), v)
        sweep_diags.append(_Diag.delta(s0, diag.snap()))
        sweeps.append(sw)
    all_names = list(sweeps[0])
    timings = {n: min(sw[n] for sw in sweeps) for n in all_names}
    sweep_totals = [round(sum(sw.values()), 4) for sw in sweeps]
    # absolute floor alongside the 25% rule: sub-second subset runs
    # (BENCH_QUERIES smoke tests) diverge by noise-scale fractions that
    # mean nothing — a real whole-leg stall costs whole seconds
    stall_suspected = (
        max(sweep_totals) > 1.25 * min(sweep_totals)
        and max(sweep_totals) - min(sweep_totals) > 2.0
    )

    # DRIVER CONTRACT (VERDICT r11 #1): the driver captures only the LAST
    # ~2,000 chars of stdout and json-parses the final line. Inlining
    # sweep_diag (two ~700-char dicts) in r11 pushed the line past that
    # window and the driver recorded `parsed: null`. The diag therefore
    # goes to a side file + its own labeled line BEFORE the final line;
    # the final line carries only the compact headline fields.
    # `tests/test_bench_contract.py` pins the final line under 1,800
    # chars with 40 synthetic query timings.
    # The labeled stdout line is the canonical channel (bench_pairs parses
    # it per leg); BENCH_DIAG.json is a convenience copy of the MOST
    # RECENT invocation's diag for post-hoc analysis of a standalone run —
    # overwritten every run, written atomically (temp + rename) so a
    # concurrent session never reads a torn file.
    diag_payload = json.dumps({"sweep_diag": sweep_diags})
    try:
        tmp = os.path.join(REPO, f".bench_diag.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            f.write(diag_payload + "\n")
        os.replace(tmp, os.path.join(REPO, "BENCH_DIAG.json"))
    except Exception:
        pass
    print("BENCH_DIAG: " + diag_payload)
    print(
        json.dumps(
            build_final_line(timings, sf, sweep_totals, stall_suspected),
            separators=(",", ":"),
        )
    )


def build_final_line(
    timings: dict[str, float],
    sf: str,
    sweep_totals: list[float],
    stall_suspected: bool,
) -> dict:
    """The dict for the driver-facing final stdout line. Keep it compact:
    the driver tail-captures 2,000 chars — no diag payloads, no prose
    fields beyond the one-line stall rule."""
    return {
        "metric": "headline_suite_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "sweep_totals": sweep_totals,
        "stall_suspected": stall_suspected,
        "stall_rule": "2 sweeps; per-query min; suspect if totals diverge >25%",
    }


if __name__ == "__main__":
    main()
