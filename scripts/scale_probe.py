#!/usr/bin/env python
"""Scale probe: measure how the engine's throughput scales with data size.

Builds a ~10× lineitem/orders (sf≈1: 6M lineitem rows) by unioning the sf0.1
fixture with shifted keys (key structure and value distributions preserved),
then times representative queries at sf0.1 and sf≈1. The interesting number
is the *throughput ratio*: if time grows ~linearly (ratio ≈ 1) the plan is
scan/shuffle-bound and will keep scaling; super-linear growth exposes an
operator that would fall over at 100 TB.

Writes replicas under /tmp (not committed); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from duckdb_mpp_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/mpp_scale_sf1"
REPLICAS = 10

QUERIES = {
    # (fact-heavy agg) TPC-H Q1 shape
    "q01_agg": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    # fact-fact join + agg (orders × lineitem both scale)
    "q_join": """
        SELECT o_orderpriority, COUNT(*) AS n,
               SUM(l_quantity) AS qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
    """,
    # window over the full fact
    "q_window": """
        SELECT MAX(rnk) AS worst FROM (
          SELECT ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC) AS rnk
          FROM lineitem
        ) t
    """,
    # distinct aggregation (shuffle-heavy)
    "q_distinct": """
        SELECT COUNT(DISTINCT l_partkey) AS parts, COUNT(DISTINCT l_suppkey) AS supps
        FROM lineitem
    """,
}


def replicate(spark) -> None:
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    od = spark.read.parquet(f"{SRC}/orders.parquet")
    key_span = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * key_span))
        for i in range(REPLICAS)
    ]
    od_parts = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * key_span))
        for i in range(REPLICAS)
    ]
    big_li = li_parts[0]
    for p in li_parts[1:]:
        big_li = big_li.union(p)
    big_od = od_parts[0]
    for p in od_parts[1:]:
        big_od = big_od.union(p)
    big_li.repartition(32).write.parquet(f"{DST}/lineitem.parquet")
    big_od.repartition(8).write.parquet(f"{DST}/orders.parquet")


def bench(spark, sf_dir: str) -> dict[str, float]:
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    out = {}
    for name, q in QUERIES.items():
        best = float("inf")
        spark.sql(q).write.format("noop").mode("overwrite").save()  # warm
        for _ in range(3):  # min-of-3 steady state: page cache + codegen warm
            t0 = time.perf_counter()
            spark.sql(q).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    spark = get_spark(app_name="scale-probe")
    replicate(spark)
    small = bench(spark, SRC)
    big = bench(spark, DST)
    ratios = {
        n: round(big[n] / small[n] / REPLICAS, 2) for n in QUERIES
    }  # 1.0 = perfectly linear
    print(
        json.dumps(
            {
                "sf0.1_sec": small,
                "sf1_sec": big,
                "per_row_ratio_vs_linear": ratios,
                "replicas": REPLICAS,
            }
        )
    )
    shutil.rmtree(DST, ignore_errors=True)


if __name__ == "__main__":
    main()
