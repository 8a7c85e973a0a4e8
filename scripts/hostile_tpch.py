"""Hostile TPC-H cross-dialect sweep (companion to hostile_sweep.py — run
with cwd = repo root, see that module's header): crafted mini TPC-H tables
with NULL join keys, NULL dates/flags, dangling foreign keys, empty-string
categoricals and boundary discounts, swept through the real driver
protocol against DuckDB on the same parquet. Classes the spec-conformant
fixtures can never exercise: NULL-key group/join placement, NULLS
FIRST/LAST at LIMIT boundaries, date arithmetic over NULLs, empty groups.

The embeddings/documents/events tables stay CLEAN sf0.001 copies here so
every divergence is attributable to the crafted TPC-H rows (the sibling
sweep owns hostile events/documents)."""
import datetime
import math
import os
import re
import shutil
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOSTILE = "/tmp/hostile_tpch_sf"
CLEAN = "/root/testdata/sf0.001"

D = lambda s: datetime.datetime.fromisoformat(s)


def build_tables() -> None:
    shutil.rmtree(HOSTILE, ignore_errors=True)
    os.makedirs(HOSTILE)
    for t in ("events", "documents", "embeddings"):
        shutil.copy(f"{CLEAN}/{t}.parquet", f"{HOSTILE}/{t}.parquet")
    pd.DataFrame({
        "r_regionkey": pd.array([0, 1], dtype="int32"),
        "r_name": ["AMERICA", None],
    }).to_parquet(f"{HOSTILE}/region.parquet")
    pd.DataFrame({
        "n_nationkey": pd.array([0, 1, 2], dtype="int32"),
        "n_name": ["US", None, "DE"],
        "n_regionkey": pd.array([0, 1, None], dtype="Int32"),
    }).to_parquet(f"{HOSTILE}/nation.parquet")
    pd.DataFrame({
        "c_custkey": pd.array([1, 2, 3, 4], dtype="int64"),
        "c_name": ["Alice", None, "", "Dana"],
        "c_nationkey": pd.array([0, None, 2, 9], dtype="Int32"),  # 9 dangles
        "c_acctbal": [10.5, None, -3.25, 0.0],
        "c_mktsegment": ["BUILDING", None, "", "BUILDING"],
    }).to_parquet(f"{HOSTILE}/customer.parquet")
    pd.DataFrame({
        "o_orderkey": pd.array([10, 11, 12, 13, 14], dtype="int64"),
        "o_custkey": pd.array([1, 2, None, 99, 4], dtype="Int64"),  # 99 dangles
        "o_orderstatus": ["O", "F", None, "O", ""],
        "o_totalprice": [100.0, None, 250.5, 0.0, 99999.99],
        "o_orderdate": [D("1995-03-01"), None, D("1995-03-02"),
                        D("1994-12-31"), D("1995-03-05")],
        "o_orderpriority": ["1-URGENT", "2-HIGH", None, "", "1-URGENT"],
    }).to_parquet(f"{HOSTILE}/orders.parquet")
    pd.DataFrame({
        "l_orderkey": pd.array([10, 10, 11, 12, 99, 14], dtype="int64"),  # 99 dangles
        "l_partkey": pd.array([100, 101, None, 100, 101, 102], dtype="Int64"),
        "l_suppkey": pd.array([1000, None, 1001, 1000, 1001, 1002], dtype="Int64"),
        "l_linenumber": pd.array([1, 2, 1, 1, 1, 1], dtype="int32"),
        "l_quantity": [5.0, None, 3.0, 0.0, 7.0, 2.0],
        "l_extendedprice": [50.0, 20.0, None, 0.0, 70.0, 30.0],
        "l_discount": [0.0, 1.0, 0.05, None, 0.5, 0.1],
        "l_tax": [0.0, 0.08, None, 0.02, 0.0, 0.04],
        "l_returnflag": ["N", None, "R", "", "A", "N"],
        "l_linestatus": ["O", "F", None, "O", "F", ""],
        "l_shipdate": [D("1995-03-10"), None, D("1995-03-12"),
                       D("1994-01-01"), D("1995-03-15"), D("1995-03-20")],
    }).to_parquet(f"{HOSTILE}/lineitem.parquet")
    pd.DataFrame({
        "s_suppkey": pd.array([1000, 1001, 1002], dtype="int64"),
        "s_name": ["SupA", None, ""],
        "s_nationkey": pd.array([0, None, 2], dtype="Int32"),
        "s_acctbal": [5.0, -1.0, None],
    }).to_parquet(f"{HOSTILE}/supplier.parquet")
    pd.DataFrame({
        "p_partkey": pd.array([100, 101, 102], dtype="int64"),
        "p_name": ["green widget", None, ""],
        "p_brand": ["Brand#1", "", None],
        "p_type": ["ECONOMY BRASS", None, "STANDARD TIN"],
        "p_size": pd.array([5, None, 9], dtype="Int32"),
        "p_retailprice": [9.99, None, 0.0],
    }).to_parquet(f"{HOSTILE}/part.parquet")


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
    tables = ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings", "events", "documents")
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{HOSTILE}/{t}.parquet')"
        )
    norm = lambda v: round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    hostile_set = {"region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem"}
    skip_prefix = ("mpp_", "streaming_", "sketch_", "multimodal_")
    n_match, n_skip = 0, 0
    for name, q in sorted(REGISTRY.items()):
        osql = q.oracle_sql()
        if name.startswith(skip_prefix) or osql is None:
            n_skip += 1
            continue
        refs = {t for t in tables if re.search(rf"\b{t}\b", osql)}
        # only gates that actually read a crafted table
        if not refs & hostile_set:
            n_skip += 1
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
                print("MISMATCH-SCHEMA:", name, scols, sorted(cols))
            elif s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
                print(f"MISMATCH: {name} rows {len(s)}/{len(d)}")
                print("   spark:", diff and [x[0] for x in diff] or s[:2])
                print("   duck :", diff and [x[1] for x in diff] or d[:2])
            else:
                n_match += 1
        except Exception as e:
            print("ERR:", name, f"{type(e).__name__}: {str(e)[:200]}".replace("\n", " "))
    print("MATCH:", n_match, "SKIPPED:", n_skip)
    spark.stop()


if __name__ == "__main__":
    main()
