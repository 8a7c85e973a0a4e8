"""Hostile embeddings cross-dialect sweep (third member of the hostile
protocol — run with cwd = repo root, see hostile_sweep.py): crafted
vectors with a NULL embedding, a NULL label, a NULL ELEMENT (what arrow
makes of a NaN in an object list), and an all-zeros vector, swept through
every ann_*/embedding_* gate plus higher_order_array_fns against DuckDB
on the same parquet.

r9 finding this sweep caught (fixed, regression-tested): a NULL element
inside a vector diverged the engines — DuckDB's SUM skipped the component
and silently ranked a 63-of-64-dim cosine while Spark's aggregate
NULL-propagated the whole score. Both dialects now exclude such rows via
the shared valid-embedding convention (similarity.load_embeddings + the
_emb_oracle shadow CTE)."""
import math
import os
import shutil
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOSTILE = "/tmp/hostile_emb_sf"
CLEAN = "/root/testdata/sf0.001"


def build_tables() -> None:
    shutil.rmtree(HOSTILE, ignore_errors=True)
    os.makedirs(HOSTILE)
    for t in ("events", "documents"):
        shutil.copy(f"{CLEAN}/{t}.parquet", f"{HOSTILE}/{t}.parquet")
    rng = np.random.RandomState(7)
    DIM = 64
    rows = []
    for i in range(60):
        rows.append((i, rng.randn(DIM).astype("float32").tolist(), int(i % 10)))
    rows[5] = (5, None, 3)                       # NULL embedding
    rows[6] = (6, rows[6][1], None)              # NULL label
    rows[7] = (7, [0.0] * DIM, 2)                # zero vector (cosine undefined)
    nan_v = rows[8][1][:]
    nan_v[0] = float("nan")                      # arrow writes this as a NULL element
    rows[8] = (8, nan_v, 4)
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        f"{HOSTILE}/embeddings.parquet"
    )


def main() -> None:
    build_tables()
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded, run_spark_query

    _ensure_loaded()
    con = duckdb.connect()
    for t in ("embeddings", "documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{HOSTILE}/{t}.parquet')"
        )
    norm = lambda v: round(v, 6) if isinstance(v, float) and not math.isnan(v) else v
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    names = sorted(
        n for n in REGISTRY
        if n.startswith(("ann_", "embedding_")) or n == "higher_order_array_fns"
    )
    nm = 0
    for name in names:
        osql = REGISTRY[name].oracle_sql()
        try:
            sdf = run_spark_query(name, spark, HOSTILE)
            scols = sorted(sdf.columns)
            s = sorted([tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=key)
            res = con.execute(osql)
            cols = [d[0] for d in res.description]
            idx = [cols.index(c) for c in sorted(cols)]
            d = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=key)
            if sorted(cols) != scols:
                print("MISMATCH-SCHEMA:", name)
            elif s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
                print(f"MISMATCH: {name}", diff)
            else:
                nm += 1
                print("MATCH:", name, len(s))
        except Exception as e:
            print("ERR:", name, f"{type(e).__name__}: {str(e)[:160]}".replace("\n", " "))
    print("TOTAL MATCH:", nm, "of", len(names))
    spark.stop()


if __name__ == "__main__":
    main()
