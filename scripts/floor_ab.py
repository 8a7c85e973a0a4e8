"""AQE-floor A/B for the sub-switch micro-gates (VERDICT r9 #7).

The five fixed-overhead gates are 1-4 stages with 98-99% scheduling
residual over ms-scale work floors; the open question is whether that
floor is AQE coordination (each exchange materializes as a separate job
wave under AQE) or irreducible session cost (py4j round-trip, plan time,
task launch). This script times each gate warm min-of-N inside ONE
session, alternating spark.sql.adaptive.enabled true/false per
measurement (interleaved, so session drift hits both arms equally), and
prints one JSON line. Adoption rule from the VERDICT: adopt a
bench-harness AQE-off mode only if it moves the settled suite ratio by
>= 0.1 — i.e. the A/B delta on these gates must sum to a suite-level
effect, not noise.

Usage: python scripts/floor_ab.py [N_rounds]   (default 5)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

GATES = [
    "q13_customer_distribution",
    "events_cohort_retention",
    "events_sessionization",
    "events_resample_ffill",
    "pipeline_global_shuffle",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from duckdb_mpp_spark.queries import run_spark_query
    from duckdb_mpp_spark.session import get_spark

    spark = get_spark(app_name="mpp-floor-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warm EACH ARM (codegen + file listing + registration): AQE-off
    # plans have different shapes, so a default-only warm-up would bill
    # the off arm's first timed run for whole-stage-codegen compilation
    # (ADVICE r10)
    for flag in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", flag)
        for g in GATES:
            run_spark_query(g, spark, SF).foreach(lambda r: None)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    best = {g: {"aqe_on": float("inf"), "aqe_off": float("inf")} for g in GATES}
    for _ in range(n):
        for arm, flag in (("aqe_on", "true"), ("aqe_off", "false")):
            spark.conf.set("spark.sql.adaptive.enabled", flag)
            for g in GATES:
                t0 = time.perf_counter()
                run_spark_query(g, spark, SF).foreach(lambda r: None)
                best[g][arm] = min(best[g][arm], time.perf_counter() - t0)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    out = {
        "sf": SF,
        "rounds": n,
        "gates": {
            g: {
                "aqe_on": round(v["aqe_on"], 3),
                "aqe_off": round(v["aqe_off"], 3),
                "delta": round(v["aqe_on"] - v["aqe_off"], 3),
            }
            for g, v in best.items()
        },
    }
    out["total_on"] = round(sum(v["aqe_on"] for v in best.values()), 3)
    out["total_off"] = round(sum(v["aqe_off"] for v in best.values()), 3)
    out["total_delta"] = round(out["total_on"] - out["total_off"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
