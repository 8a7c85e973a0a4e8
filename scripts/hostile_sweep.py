"""Hostile-fixture cross-dialect sweep: run every events/documents gate on
NULL-riddled, duplicate-id, empty-string, unicode crafted tables through
the REAL driver protocol (parquet sf_dir + run_spark_query vs DuckDB on
the same files) and report divergences.

MUST run with cwd = repo root (Spark's Python workers resolve the
duckdb_mpp_spark package off the driver's working directory; from another
cwd every mapInPandas gate dies in read_udfs with an import failure that
is NOT a product bug).

r9 findings this sweep caught: the cohort gate's NULL-user divergence
(Spark GROUPed the NULL user into a cohort while the oracle's JOIN USING
dropped it) and the DECIMAL(18,6) overflow class (one 1e12 telemetry
value aborted six events gates in both engines; widened to 38,6). The
three multimodal_* gates are excluded below: their oracles recompute
byte-level features from the text column under a DOCUMENTED ASCII-corpus
contract (DuckDB ord() is a codepoint, not a UTF-8 byte), so the unicode
doc diverges them by design — the operator side computes true payload
bytes, which is the correct semantics for a binary column."""
import datetime
import math
import os
import re
import shutil
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOSTILE = "/tmp/hostile_sf"
CLEAN = "/root/testdata/sf0.001"

shutil.rmtree(HOSTILE, ignore_errors=True)
os.makedirs(HOSTILE)
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "embeddings"):
    shutil.copy(f"{CLEAN}/{t}.parquet", f"{HOSTILE}/{t}.parquet")

t0 = datetime.datetime(2024, 1, 1)
m = lambda k: t0 + datetime.timedelta(minutes=k)
events = pd.DataFrame({
    "event_id": pd.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12], dtype="int64"),
    "ts": [m(1), m(2), None, m(4), m(1), m(1), None, m(8), m(9), m(10), m(11), m(12)],
    "user_id": pd.array([1, 1, 1, 1, 2, 2, None, None, 3, 3, 3, 3], dtype="Int64"),
    "event_type": ["view", "click", "view", None, "view", "view", "click", "buy",
                    "", "view", "view", "click"],
    "value": [1.5, None, 2.0, 3.0, None, 0.0, 1.0, -2.5, 1e12, None, 4.25, 0.125],
    "props": ['{"a":1}', None, "", "not json", '{"plan":"pro"}', "{}", None,
               '{"a":{"b":2}}', "[1,2]", '{"a":null}', None, '{"x":9}'],
})
documents = pd.DataFrame({
    "doc_id": pd.array([1, 2, 3, 4, 5, 6, 7, 8], dtype="Int64"),
    "text": ["the quick brown fox jumps over the dog",
              "the quick brown fox jumps over the dog",  # exact dup, different id
              None, "", "   ", "unicode éé töken éé",
              "a", "the the the the the the the the"],
    "lang": ["en", "en", None, "", "de", None, "en", "en"],
    "source": ["s1", None, "s2", "s2", "", "s3", None, "s1"],
    "n_chars": pd.array([38, 38, None, 0, 3, 20, 1, 31], dtype="Int64"),
})
events.to_parquet(f"{HOSTILE}/events.parquet")
documents.to_parquet(f"{HOSTILE}/documents.parquet")

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded, run_spark_query

_ensure_loaded()
con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "embeddings", "events", "documents"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{HOSTILE}/{t}.parquet')")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "embeddings", "events", "documents")
norm = lambda v: round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)

skip_prefix = ("mpp_", "streaming_", "sketch_", "multimodal_")
results = {"match": [], "mismatch": [], "err": [], "skipped": []}
for name, q in sorted(REGISTRY.items()):
    if name.startswith(skip_prefix):
        results["skipped"].append(name)
        continue
    osql = q.oracle_sql()
    if osql is None:
        results["skipped"].append(name)
        continue
    refs = {t for t in TABLES if re.search(rf"\b{t}\b", osql)}
    if not refs or not refs <= {"events", "documents"}:
        results["skipped"].append(name)
        continue
    try:
        sdf = run_spark_query(name, spark, HOSTILE)
        scols = sorted(sdf.columns)
        s = sorted([tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=key)
        res = con.execute(osql)
        cols = [d[0] for d in res.description]
        idx = [cols.index(c) for c in sorted(cols)]
        d = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=key)
        if sorted(cols) != scols:
            results["mismatch"].append((name, "SCHEMA", scols, sorted(cols)))
        elif s != d:
            diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
            results["mismatch"].append((name, f"rows {len(s)}/{len(d)}", diff, None))
        else:
            results["match"].append(name)
    except Exception as e:
        results["err"].append((name, f"{type(e).__name__}: {str(e)[:200]}"))

print("MATCH:", len(results["match"]))
print("SKIPPED:", len(results["skipped"]))
for name, info, a, b in results["mismatch"]:
    print("MISMATCH:", name, info)
    print("   spark:", a)
    if b: print("   duck :", b)
for name, e in results["err"]:
    print("ERR:", name, e)
spark.stop()
