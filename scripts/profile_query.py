"""Per-stage profile of one or more bench queries (guide §1: measure first).

Runs each named query with the bench methodology (untimed warmup, then a
timed noop-sink materialization) in a session with the Spark UI enabled,
then reads the UI REST API for per-job / per-stage metrics: duration, task
count, shuffle read/write bytes, input bytes. This is the empirical loop of
guide §1.1 without a browser.

Usage: python scripts/profile_query.py q1 [q2 ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded, run_spark_query
    from duckdb_mpp_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(
        app_name="profile-query",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    base = "http://localhost:4049/api/v1/applications"
    app_id = _get(base)[0]["id"]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()

    for name in names:
        if name not in REGISTRY:
            print(f"{name}: NOT REGISTERED")
            continue
        # warmup (JIT/codegen/page cache), untimed
        materialize(run_spark_query(name, spark, sf_dir))
        jobs_before = {j["jobId"] for j in _get(f"{base}/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        materialize(run_spark_query(name, spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j for j in _get(f"{base}/{app_id}/jobs") if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        stage_ids = set()
        for j in jobs:
            stage_ids.update(j["stageIds"])
        stages = []
        for sid in sorted(stage_ids):
            try:
                for att in _get(f"{base}/{app_id}/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        for s in stages:
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    t1 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                    t2 = datetime.strptime(s["completionTime"], fmt)
                    dur = (t2 - t1).total_seconds()
                except Exception:
                    dur = None
            print(
                f"  stage {s['stageId']:>4} {s['status']:<9} tasks={s['numCompleteTasks']:>3}"
                f" dur={dur if dur is not None else '?':>6}s"
                f" exec={s.get('executorRunTime', 0)/1000:>7.2f}s"
                f" cpu={s.get('executorCpuTime', 0)/1e9:>7.2f}s"
                f" in={s.get('inputBytes', 0)>>20}MB"
                f" sr={s.get('shuffleReadBytes', 0)>>20}MB"
                f" sw={s.get('shuffleWriteBytes', 0)>>20}MB"
                f"  {s.get('description') or s['name'][:80]}"
            )


if __name__ == "__main__":
    main()
