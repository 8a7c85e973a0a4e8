"""Hostile-fixture sweep for the STREAMING gates (VERDICT r9 #6): replay
crafted micro-batch content — NULL user_id, NULL/empty event_type, NULL
ts, a 1e12 value, duplicate events, NULL-text docs — through the real
streaming runtime (readStream file source → watermark → stateful ops →
sink) and compare each gate against its DuckDB oracle on the same files.

The batch hostile sweep (scripts/hostile_sweep.py) cannot exercise these
paths: applyInPandasWithState key handling for a NULL key, watermark
evaluation over NULL event-times, session-window assignment of NULL-ts
rows, and the snapshot-commit upsert path all live only in the streaming
runtime.

Two fixtures:
- single-file: the crafted frames as one parquet per table (one
  micro-batch carries every hostile row).
- multi-file: the SAME events rows split across three part files inside
  a directory-style events.parquet (the file source lists several files;
  the dedup/upsert/ingest gates' foreachBatch and snapshot-commit paths
  see the directory layout). Results must be identical to single-file —
  a divergence between the two fixtures is itself a finding (batch-
  boundary-dependent results).

MUST run with cwd = repo root (Spark's Python workers resolve the
duckdb_mpp_spark package off the driver's working directory).
"""
import datetime
import math
import os
import shutil
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLEAN = "/root/testdata/sf0.001"
SINGLE = "/tmp/hostile_stream_sf"
MULTI = "/tmp/hostile_stream_multi_sf"

t0 = datetime.datetime(2024, 1, 1)
m = lambda k: t0 + datetime.timedelta(minutes=k)

# crafted events: NULL user, NULL/empty type, NULL ts, 1e12 value, NULL
# value, exact duplicate (user,type) pairs for dedup, click→purchase pairs
# inside/outside the 1-hour join window, a >30-min session gap, and ids
# landing in the clean customer key range (1..N) for the static join.
events = pd.DataFrame({
    "event_id": pd.array(range(1, 17), dtype="int64"),
    "ts": [m(1), m(2), m(50), None, m(1), m(40), m(90), m(200),
           m(5), m(30), m(70), m(1), None, m(3), m(4), m(6)],
    "user_id": pd.array([1, 1, 1, 1, 2, 2, 2, 2,
                         3, 3, 3, None, None, 4, 4, 4], dtype="Int64"),
    "event_type": ["click", "view", "purchase", "view",
                   "click", "purchase", "purchase", "view",
                   "click", None, "purchase", "click",
                   "", "click", "purchase", "purchase"],
    "value": [1.5, None, 100.25, 3.0, 0.0, -2.5, 7.125, 1e12,
              2.0, 4.0, None, 1.0, 2.0, 0.5, 0.25, 8.0],
    "props": ['{"a":1}', None, "", "not json", "{}", '{"b":2}', None, "[]",
              '{"x":null}', "{}", None, '{"y":3}', "", "{}", "{}", "{}"],
})
documents = pd.DataFrame({
    "doc_id": pd.array([1, 2, 3, 4, 5, 6], dtype="Int64"),
    "text": ["the quick brown fox jumps over the dog",
             "the quick brown fox jumps over the dog",  # exact dup
             None, "", "unicode éé töken éé",
             "a tiny doc"],
    "lang": ["en", "en", None, "", None, "en"],
    "source": ["s1", None, "s2", "s2", "", "s1"],
    "n_chars": pd.array([38, 38, None, 0, 20, 10], dtype="Int64"),
})


def build(path: str, multi_file_events: bool) -> None:
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings"):
        shutil.copy(f"{CLEAN}/{t}.parquet", f"{path}/{t}.parquet")
    documents.to_parquet(f"{path}/documents.parquet")
    if multi_file_events:
        d = f"{path}/events.parquet"
        os.makedirs(d)
        for i, lo in enumerate(range(0, len(events), 6)):
            events.iloc[lo:lo + 6].to_parquet(f"{d}/part-{i}.parquet")
    else:
        events.to_parquet(f"{path}/events.parquet")


build(SINGLE, multi_file_events=False)
build(MULTI, multi_file_events=True)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded, run_spark_query  # noqa: E402

_ensure_loaded()

norm = lambda v: round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)


def sweep(fixture: str) -> dict:
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings", "events", "documents"):
        p = f"{fixture}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    results = {"match": [], "mismatch": [], "err": [], "rows": {}}
    for name, q in sorted(REGISTRY.items()):
        if not name.startswith("streaming_"):
            continue
        try:
            sdf = run_spark_query(name, spark, fixture)
            scols = sorted(sdf.columns)
            s = sorted([tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=key)
            # keep the SPARK result content for the cross-fixture
            # equivalence check regardless of oracle outcome (review r10:
            # comparing only matched gates' row COUNTS was vacuous — two
            # oracle-matched results are necessarily identical because
            # the oracle is layout-independent)
            results["rows"][name] = (tuple(scols), tuple(s))
            res = con.execute(q.oracle_sql())
            cols = [d[0] for d in res.description]
            idx = [cols.index(c) for c in sorted(cols)]
            d = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=key)
            if sorted(cols) != scols:
                results["mismatch"].append((name, "SCHEMA", scols, sorted(cols)))
            elif s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
                results["mismatch"].append((name, f"rows {len(s)}/{len(d)}", diff, None))
            else:
                results["match"].append((name, len(s)))
        except Exception as e:
            results["err"].append((name, f"{type(e).__name__}: {str(e)[:300]}"))
    con.close()
    # invalidate the registered-view cache ONCE per fixture — the next
    # sweep runs against the other dir; within one fixture the cache is
    # exactly what we want (review r10: the per-gate unset forced every
    # gate to re-register all ten views)
    try:
        spark.conf.unset("duckdb_mpp_spark.registered_sf_dir")
    except Exception:
        pass
    return results


all_green = True
per_fixture = {}
for label, fixture in (("single-file", SINGLE), ("multi-file", MULTI)):
    r = sweep(fixture)
    per_fixture[label] = r
    print(f"== {label} ==")
    print("MATCH:", len(r["match"]), [n for n, _ in r["match"]])
    for name, info, a, b in r["mismatch"]:
        all_green = False
        print("MISMATCH:", name, info)
        print("   spark:", a)
        if b:
            print("   duck :", b)
    for name, e in r["err"]:
        all_green = False
        print("ERR:", name, e)

# fixture-equivalence: single-file vs multi-file SPARK result CONTENT
# must agree (full sorted rows, not counts — review r10), independent of
# whether either fixture matched its oracle
single_rows = per_fixture["single-file"]["rows"]
multi_rows = per_fixture["multi-file"]["rows"]
for name in sorted(set(single_rows) & set(multi_rows)):
    if single_rows[name] != multi_rows[name]:
        all_green = False
        a, b = single_rows[name], multi_rows[name]
        print("BATCH-BOUNDARY DIVERGENCE:", name,
              f"cols/rows {len(a[1])} vs {len(b[1])}")
for name in sorted(set(single_rows) ^ set(multi_rows)):
    all_green = False
    print("BATCH-BOUNDARY DIVERGENCE (one fixture errored):", name)

print("ALL GREEN" if all_green else "FINDINGS ABOVE")
spark.stop()
