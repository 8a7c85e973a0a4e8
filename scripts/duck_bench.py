"""DuckDB side of the single-node comparison (SCALING.md).

Runs the oracle SQL of every DuckDB-comparable bench.py HEADLINE query at
$SPARK_GRAFT_SF_DIR with the SAME methodology bench.py uses for Spark:
warm pass, then TWO time-separated timed sweeps of min-of-2 reps each;
the recorded value is the per-query min across sweeps (ADVICE r11 #1:
bench.py moved Spark to two sweeps in r10 to dodge whole-leg host-steal
stalls — r11b proved DuckDB legs stall too, so both engines get the same
stall-recovery treatment or the pair ratio is asymmetric). Results fully
materialized. Prints one JSON line {"total_sec": ..., "queries": {...},
"sweep_totals": [...]}.

Comparable = has an oracle AND is a batch query (streaming_hourly_agg is
excluded: it is a real micro-batch streaming pipeline on the Spark side —
timing it against one batch SQL statement measures the methodology, not
the engine; VERDICT r3 "Next round" #8).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded  # noqa: E402

EXCLUDED = {
    # methodology mismatch: micro-batch runtime vs a batch SQL statement
    "streaming_hourly_agg",
    # its oracle is a recall CERTIFICATE (a cheap identical-pair count),
    # not a workload mirror — timing it against the full Spark pipeline
    # would be a fake 20× row. The fast variant's fair DuckDB mirror is
    # dedup_ngram_jaccard's oracle (same algebra, md5 hash family).
    "dedup_ngram_jaccard_fast",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    names = [
        n for n in HEADLINE
        if n not in EXCLUDED
        and n in REGISTRY
        and REGISTRY[n].oracle_sql() is not None
    ]
    for n in names:  # warm pass (page cache, duckdb internal state)
        con.execute(REGISTRY[n].oracle_sql()).fetchall()
    # two time-separated sweeps, min-of-2 reps each — identical shape to
    # bench.py's Spark leg, so a transient host-steal window hitting one
    # sweep is recovered symmetrically for both engines
    sweeps: list[dict[str, float]] = []
    for _sweep in range(2):
        sw: dict[str, float] = {}
        for n in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(REGISTRY[n].oracle_sql()).fetchall()
                best = min(best, time.perf_counter() - t0)
            sw[n] = round(best, 4)
        sweeps.append(sw)
    timings = {n: min(sw[n] for sw in sweeps) for n in names}
    print(json.dumps({
        "total_sec": round(sum(timings.values()), 4),
        "n": len(timings),
        "queries": timings,
        "sweep_totals": [round(sum(sw.values()), 4) for sw in sweeps],
    }))


if __name__ == "__main__":
    main()
