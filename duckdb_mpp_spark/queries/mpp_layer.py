"""Distributed-table layer exercised through the correctness gate.

Each query builds a hash-bucketed distributed table from a fixture parquet,
performs the reference's signature operation (bucketed create+insert, pruned
scan, copy-on-write UPDATE / DELETE), and returns the resulting rows. The
DuckDB oracle computes the same result directly on the raw parquet — so a
hash match proves the bucket routing, pruning, and COW rewrite preserve
exactly the semantics the reference implements with shards + per-shard SQL
(create→insert→select, README.md:95-101; UPDATE/DELETE,
test/sql/mpp_update.test / mpp_delete.test).

The temp warehouses live for the session (the returned DataFrames scan them
lazily — no driver-side materialization, so the pattern holds at any scale).
"""

from pyspark.sql import types as _T

from duckdb_mpp_spark.mpp import MppSession
from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.sources import load_table

# shared session-lifetime tempdir recipe (review r7: was one of three copies)
from duckdb_mpp_spark.tmputil import session_tmpdir as _gate_tmpdir

ORDER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

_GATE_SCHEMA = _T.StructType(
    [
        _T.StructField("step", _T.StringType(), False),
        _T.StructField("observed", _T.StringType(), False),
    ]
)




def _bucketed_orders(spark, sf_dir: str, name: str, buckets: int = 12):
    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    tbl = mpp.create_distributed_table(name, orders.schema, "o_custkey", buckets)
    tbl.insert(orders)
    return mpp, tbl


def _scan_pruned(spark, sf_dir):
    _, tbl = _bucketed_orders(spark, sf_dir, "orders_b")
    return tbl.scan(where="o_custkey IN (1, 2, 3) OR o_custkey = 77").orderBy("o_orderkey")


register(
    "mpp_create_insert_scan",
    Query(
        spark=_scan_pruned,
        oracle=f"""
        SELECT {ORDER_COLS} FROM orders
        WHERE o_custkey IN (1, 2, 3) OR o_custkey = 77
        ORDER BY o_orderkey
        """,
    ),
)


def _update_cow(spark, sf_dir):
    mpp, tbl = _bucketed_orders(spark, sf_dir, "orders_u")
    n = mpp.sql(
        "UPDATE orders_u SET o_orderpriority = 'X-UPDATED', "
        "o_totalprice = o_totalprice * 1.1 "
        "WHERE o_custkey = 42 AND o_orderstatus = 'O'"
    )
    assert n >= 0
    return tbl.scan().orderBy("o_orderkey")


register(
    "mpp_update_cow",
    Query(
        spark=_update_cow,
        oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_custkey = 42 AND o_orderstatus = 'O'
                    THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
               o_orderdate,
               CASE WHEN o_custkey = 42 AND o_orderstatus = 'O'
                    THEN 'X-UPDATED' ELSE o_orderpriority END AS o_orderpriority
        FROM orders
        ORDER BY o_orderkey
        """,
    ),
)


def _delete_cow(spark, sf_dir):
    mpp, tbl = _bucketed_orders(spark, sf_dir, "orders_d")
    mpp.sql("DELETE FROM orders_d WHERE o_custkey IN (5, 6, 7)")
    mpp.sql("DELETE FROM orders_d WHERE o_orderstatus = 'P' AND o_totalprice < 1000.0")
    return tbl.scan().orderBy("o_orderkey")


register(
    "mpp_delete_cow",
    Query(
        spark=_delete_cow,
        oracle=f"""
        SELECT {ORDER_COLS} FROM orders
        WHERE NOT (o_custkey IN (5, 6, 7))
          AND NOT (o_orderstatus = 'P' AND o_totalprice < 1000.0)
        ORDER BY o_orderkey
        """,
    ),
)


def _colocated_join(spark, sf_dir):
    """Co-located distributed join: orders and customer both hash-bucketed
    on custkey with equal bucket counts → the join plans with zero Exchange
    on the keys (the reference's shard-co-located join; plan asserted in
    tests/test_colocated.py). The oracle states plain join semantics — a
    hash match proves bucketed routing loses/duplicates nothing."""
    from pyspark.sql import functions as F

    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    t_o = mpp.create_distributed_table(
        "orders_c", orders.schema, "o_custkey", 12, colocated=True
    )
    t_c = mpp.create_distributed_table(
        "customer_c", customer.schema, "c_custkey", 12, colocated=True
    )
    t_o.insert(orders)
    t_c.insert(customer)
    j = t_o.scan().join(
        t_c.scan(), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "mpp_colocated_join",
    Query(
        spark=_colocated_join,
        oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
    ),
)


def _colocated_contract(spark, sf_dir):
    """The co-located promise as ONE driver-checkable row (VERDICT r6 #7):
    (a) the append-only surface rejects UPDATE/DELETE/UPSERT loudly
    (colocated.py module contract — the reference's co-located tables are
    its core MPP claim, README distributed-join description, and this
    engine's flavor trades DML for native bucket metadata), and (b) the
    key-equi join of two co-located tables plans with ZERO Exchange on the
    join keys and both sides bucketed — asserted in-gate on the actual
    executed plan with broadcast disabled, so the zero-exchange claim is
    checked at driver level, not just in unit tests. Booleans are emitted
    as literal columns the oracle states as TRUE; the join aggregate rides
    along so the value hash also proves bucketed routing loses nothing."""
    from pyspark.sql import functions as F

    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    t_o = mpp.create_distributed_table(
        "orders_cc", orders.schema, "o_custkey", 8, colocated=True
    )
    t_c = mpp.create_distributed_table(
        "customer_cc", customer.schema, "c_custkey", 8, colocated=True
    )
    t_o.insert(orders)
    t_c.insert(customer)

    def rejected(fn):
        try:
            fn()
        except NotImplementedError:
            return True
        return False

    upd = rejected(
        lambda: mpp.sql("UPDATE orders_cc SET o_comment='x' WHERE o_custkey=1")
    )
    dele = rejected(lambda: mpp.sql("DELETE FROM orders_cc WHERE o_custkey=1"))
    ups = rejected(lambda: mpp.upsert("orders_cc", orders.limit(1), ["o_custkey"]))

    # plan assert under no-broadcast (broadcast would trivially avoid the
    # exchange); conf_guard saves/restores the previous threshold
    from duckdb_mpp_spark.session import conf_guard

    with conf_guard(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        j = t_o.scan().join(
            t_c.scan(), F.col("o_custkey") == F.col("c_custkey")
        )
        agg = j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        p = spark._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "simple"
        )
        zero_exchange = (
            p.count("Bucketed: true") == 2
            and "Exchange hashpartitioning(o_custkey" not in p
            and "Exchange hashpartitioning(c_custkey" not in p
        )
        n_rows, total_price = agg.collect()[0]  # 1-row aggregate
    return spark.createDataFrame(
        [(upd, dele, ups, zero_exchange, n_rows, float(total_price))],
        "update_rejected boolean, delete_rejected boolean, "
        "upsert_rejected boolean, zero_exchange_join boolean, "
        "n_rows bigint, total_price double",
    )


register(
    "mpp_colocated_contract",
    Query(
        spark=_colocated_contract,
        oracle="""
        SELECT TRUE AS update_rejected, TRUE AS delete_rejected,
               TRUE AS upsert_rejected, TRUE AS zero_exchange_join,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        """,
    ),
)


def _rowid_scan(spark, sf_dir):
    """rowid pseudo-column invariants (reference projects DuckDB's
    shard-local rowid, src/function/mpp_table_scan.cpp:310-322; ids are
    per-shard — "Global row id" unchecked in its README:117). Two inserts
    produce two file sets per bucket, exercising the cumulative per-file
    offsets. The returned row proves: every bucket's rowids are dense
    0..n_b-1 (distinct, max+1 == count, min == 0) and the total row count
    matches the raw data — all bucket-layout-independent, so the DuckDB
    oracle can state them exactly."""
    from pyspark.sql import functions as F

    mpp, tbl = _bucketed_orders(spark, sf_dir, "orders_rid")
    orders = load_table(spark, sf_dir, "orders")
    tbl.insert(orders)  # second file set per bucket
    per_bucket = (
        tbl.scan_with_rowid(columns=["__bucket"])
        .groupBy("__bucket")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("rowid").alias("d"),
            F.max("rowid").alias("mx"),
            F.min("rowid").alias("mn"),
        )
    )
    bad = (
        (F.col("d") != F.col("n"))
        | (F.col("mx") != F.col("n") - 1)
        | (F.col("mn") != 0)
    )
    return per_bucket.agg(
        F.sum("n").alias("total_rows"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("dense_violations"),
    )


register(
    "mpp_rowid_scan",
    Query(
        spark=_rowid_scan,
        oracle="""
        SELECT CAST(2 * COUNT(*) AS BIGINT) AS total_rows,
               CAST(0 AS BIGINT) AS dense_violations
        FROM orders
        """,
    ),
)


def _sorted_scan(spark, sf_dir):
    """SORT BY table + zone-map file skipping: three range-disjoint ingests
    (the time-partitioned-ingest pattern) write three file generations per
    bucket, each clustered on o_orderdate; the date-range scan then skips
    the generations whose footer min/max can't overlap (zonemap.py). The
    result must equal the plain filter — skipping is an optimization,
    never a filter."""
    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    tbl = mpp.create_distributed_table(
        "orders_s", orders.schema, "o_custkey", 8, sort_column="o_orderdate"
    )
    for lo, hi in (("1992-01-01", "1995-01-01"), ("1995-01-01", "1997-01-01"),
                   ("1997-01-01", "1999-01-01")):
        tbl.insert(orders.where(f"o_orderdate >= '{lo}' AND o_orderdate < '{hi}'"))
    out = tbl.scan(
        where="o_orderdate >= DATE '1995-06-01' AND o_orderdate < DATE '1996-01-01'"
    ).orderBy("o_orderkey")
    assert tbl.last_file_skip is not None and tbl.last_file_skip[0] < tbl.last_file_skip[1]
    return out


register(
    "mpp_sorted_scan",
    Query(
        spark=_sorted_scan,
        oracle=f"""
        SELECT {ORDER_COLS} FROM orders
        WHERE o_orderdate >= DATE '1995-06-01' AND o_orderdate < DATE '1996-01-01'
        ORDER BY o_orderkey
        """,
    ),
)


def _compact_scan(spark, sf_dir):
    """Small-file compaction: two inserts accumulate two file sets per
    bucket; compact() rewrites each bucket to one file (snapshot-publish
    commit, same isolation as COW DML) and the pruned scan still returns exactly
    the inserted rows — compaction changes layout, never content."""
    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    tbl = mpp.create_distributed_table("orders_k", orders.schema, "o_custkey", 12)
    tbl.insert(orders.where("o_orderkey % 2 = 0"))
    tbl.insert(orders.where("o_orderkey % 2 = 1"))
    rewritten = tbl.compact()
    assert rewritten > 0
    return tbl.scan(where="o_custkey <= 50").orderBy("o_orderkey")


register(
    "mpp_compact_scan",
    Query(
        spark=_compact_scan,
        oracle=f"""
        SELECT {ORDER_COLS} FROM orders
        WHERE o_custkey <= 50
        ORDER BY o_orderkey
        """,
    ),
)


def _upsert_scan(spark, sf_dir):
    """MERGE-style upsert (dml.upsert): base load, then one batch that both
    UPDATES existing keys (o_orderkey % 12 ∈ {0,4,8} minus the %3=0 holes)
    and INSERTS new ones (%3 = 0 rows absent from the base load), applied as
    ONE snapshot commit. The oracle states the merge result with a CASE over
    the raw fixture — a hash match proves replaced-not-duplicated, appended-
    not-lost, and untouched rows bit-identical."""
    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    tbl = mpp.create_distributed_table("orders_up", orders.schema, "o_custkey", 12)
    tbl.insert(orders.where("o_orderkey % 3 != 0"))
    from pyspark.sql import functions as F

    batch = orders.where("o_orderkey % 4 = 0").withColumns(
        {
            "o_orderpriority": F.lit("X-UPSERT"),
            # ×2 is exact in binary FP — bit-identical across engines
            "o_totalprice": F.col("o_totalprice") * 2,
        }
    )
    n = mpp.upsert("orders_up", batch, ["o_custkey", "o_orderkey"])
    assert n > 0
    return tbl.scan().orderBy("o_orderkey")


register(
    "mpp_upsert_scan",
    Query(
        spark=_upsert_scan,
        oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 4 = 0
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
               o_orderdate,
               CASE WHEN o_orderkey % 4 = 0
                    THEN 'X-UPSERT' ELSE o_orderpriority END AS o_orderpriority
        FROM orders
        WHERE o_orderkey % 3 != 0 OR o_orderkey % 4 = 0
        ORDER BY o_orderkey
        """,
    ),
)


def _time_travel(spark, sf_dir):
    """Snapshot time travel: three commits (two range-disjoint inserts, one
    DELETE), then aggregates of the SAME table read AS OF versions 1..3.
    Every commit is a full snapshot, so a historical read is just planning
    from an older file list — no log replay. The oracle recomputes each
    version's aggregate from the raw fixture with the matching predicates;
    a hash match proves historical reads are exact, not approximations."""
    from pyspark.sql import functions as F

    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    tbl = mpp.create_distributed_table("orders_tt", orders.schema, "o_custkey", 8)
    tbl.insert(orders.where("o_orderdate < DATE '1995-01-01'"))     # v1
    tbl.insert(orders.where("o_orderdate >= DATE '1995-01-01'"))    # v2
    mpp.sql("DELETE FROM orders_tt WHERE o_orderstatus = 'F'")      # v3

    def agg_at(v):
        return (
            tbl.scan(version=v)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_price"),
            )
            .select(F.lit(v).alias("version"), "n_rows", "total_price")
        )

    return agg_at(1).unionByName(agg_at(2)).unionByName(agg_at(3)).orderBy("version")


register(
    "mpp_time_travel",
    Query(
        spark=_time_travel,
        oracle="""
        SELECT 1 AS version, COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders WHERE o_orderdate < DATE '1995-01-01'
        UNION ALL
        SELECT 2, COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 3, COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE o_orderstatus != 'F'
        ORDER BY version
        """,
    ),
)


def _copy_roundtrip(spark, sf_dir):
    """DuckDB's COPY statement (inherited SQL surface): export a filtered
    distributed table with ``COPY t TO '<dir>' (FORMAT PARQUET)``, import
    the files into a second table with ``COPY t2 FROM``, and scan the
    result — proving both directions preserve rows/types exactly. The
    export target is a directory of part files (the Spark-native parallel-
    writer shape; documented divergence from DuckDB's single file)."""
    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders")
    tbl = mpp.create_distributed_table("orders_cp", orders.schema, "o_custkey", 8)
    tbl.insert(orders)
    out = _gate_tmpdir("mpp_copy_") + "/export.parquet"
    n = mpp.sql(
        f"COPY (SELECT * FROM orders_cp WHERE o_custkey <= 100) TO '{out}' (FORMAT PARQUET)"
    )
    assert n > 0
    mpp.create_distributed_table("orders_cp2", orders.schema, "o_custkey", 8)
    n2 = mpp.sql(f"COPY orders_cp2 FROM '{out}' (FORMAT PARQUET)")
    assert n2 == n
    return mpp.table("orders_cp2").scan().orderBy("o_orderkey")


register(
    "mpp_copy_roundtrip",
    Query(
        spark=_copy_roundtrip,
        oracle=f"""
        SELECT {ORDER_COLS} FROM orders
        WHERE o_custkey <= 100
        ORDER BY o_orderkey
        """,
    ),
)


def _summarize_frontdoor(spark, sf_dir):
    """DuckDB's SUMMARIZE through the front door — exact-stat variant (true
    distinct counts instead of approx_unique, so the oracle can state the
    identical rows). Gate table carries int/string/timestamp columns only:
    double→string rendering differs between engines, and the point here is
    the statement surface + one-pass aggregation, not float formatting."""
    mpp = MppSession(spark, _gate_tmpdir())
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    tbl = mpp.create_distributed_table("orders_sm", orders.schema, "o_custkey", 8)
    tbl.insert(orders)
    return mpp.sql("SUMMARIZE orders_sm")


register(
    "mpp_summarize",
    Query(
        spark=_summarize_frontdoor,
        oracle="""
        SELECT 'o_orderkey' AS column_name, 'bigint' AS column_type,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               COUNT(*) - COUNT(o_orderkey) AS null_count,
               COUNT(*) AS count
        FROM orders
        UNION ALL
        SELECT 'o_custkey', 'bigint',
               CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR),
               COUNT(DISTINCT o_custkey), COUNT(*) - COUNT(o_custkey), COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', 'string',
               MIN(o_orderstatus), MAX(o_orderstatus),
               COUNT(DISTINCT o_orderstatus), COUNT(*) - COUNT(o_orderstatus), COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', 'timestamp_ntz',
               CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR),
               COUNT(DISTINCT o_orderdate), COUNT(*) - COUNT(o_orderdate), COUNT(*)
        FROM orders
        """,
    ),
)


def _qualify_frontdoor(spark, sf_dir):
    """DuckDB's QUALIFY clause (window filter) through the SQL front door —
    the engine rewrites it to a hoisted window column + WHERE
    (MppSession._rewrite_qualify); the oracle runs the IDENTICAL statement
    natively in DuckDB, so a hash match is direct dialect parity."""
    mpp, _ = _bucketed_orders(spark, sf_dir, "orders_q")
    return mpp.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders_q
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ) <= 2
        ORDER BY o_custkey, o_orderkey
        """
    )


register(
    "mpp_qualify_frontdoor",
    Query(
        spark=_qualify_frontdoor,
        oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ) <= 2
        ORDER BY o_custkey, o_orderkey
        """,
    ),
)


def _distinct_on_frontdoor(spark, sf_dir):
    """DuckDB's DISTINCT ON through the SQL front door — rewritten to a
    ROW_NUMBER()=1 window filter; oracle runs DISTINCT ON natively."""
    mpp, _ = _bucketed_orders(spark, sf_dir, "orders_do")
    return mpp.sql(
        """
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderdate, o_orderkey
        FROM orders_do
        ORDER BY o_custkey, o_orderdate, o_orderkey
        """
    )


register(
    "mpp_distinct_on_frontdoor",
    Query(
        spark=_distinct_on_frontdoor,
        oracle="""
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderdate, o_orderkey
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
        """,
    ),
)


def _ddl_frontdoor(spark, sf_dir):
    """Full DDL lifecycle through the SQL front door TEXT — the reference's
    custom-parser path (src/parser/mpp_parser_extension.cpp:43-96) plus the
    catalog-wrapper observability it tests: SHOW TABLES after CREATE
    (test/sql/mpp.test:39-44), DESCRIBE, pruned-scan EXPLAIN `Shards: k/n`
    (test/sql/mpp_filter.test:60-87), and the DROP soft-delete tombstone in
    __mpp_system.tables (test/sql/mpp.test:168-171). Every observation is a
    literal (step, observed) row, so the oracle is the expected-row table —
    exactly the sqllogictest shape the reference uses. All collects here are
    O(#tables)/O(1) metadata, never data-path."""
    import re as _re

    mpp = MppSession(spark, _gate_tmpdir())
    obs: list[tuple[str, str]] = []

    mpp.sql(
        "CREATE TABLE t1(id INTEGER, name VARCHAR) PARTITION BY (id) WITH BUCKETS 4"
    )
    obs.append(
        ("01_tables_after_create",
         ",".join(sorted(r[0] for r in mpp.sql("SHOW TABLES").collect())))
    )
    obs.append(
        ("02_describe",
         ";".join(f"{r['column_name']} {r['column_type']} {r['null']}"
                  for r in mpp.sql("DESCRIBE t1").collect()))
    )
    n = mpp.sql(
        "INSERT INTO t1 VALUES (0,'rob'),(1,'sam'),(2,'kim'),(3,'lee'),(11,'tom')"
    )
    obs.append(("03_insert_count", str(n)))
    got = mpp.sql("SELECT name FROM t1 WHERE id = 11").collect()
    obs.append(("04_select_where_id_11", ",".join(sorted(r[0] for r in got))))
    m = _re.search(r"Shards: \d+/\d+", mpp.sql("EXPLAIN SELECT name FROM t1 WHERE id = 11"))
    obs.append(("05_explain_pruning", m.group(0) if m else "missing"))

    mpp.sql("DROP TABLE t1")
    shown = [r[0] for r in mpp.sql("SHOW TABLES").collect()]
    obs.append(("06_tables_after_drop", ",".join(sorted(shown)) or "<none>"))
    tomb = mpp.sql("SELECT deleted FROM __mpp_system.tables").collect()
    obs.append(
        ("07_tombstone_flags", ",".join(str(r[0]).lower() for r in tomb) or "<none>")
    )
    return spark.createDataFrame(obs, _GATE_SCHEMA).orderBy("step")


register(
    "mpp_ddl_frontdoor",
    Query(
        spark=_ddl_frontdoor,
        oracle="""
        SELECT * FROM (VALUES
            ('01_tables_after_create', 't1'),
            ('02_describe', 'id INTEGER YES;name VARCHAR YES'),
            ('03_insert_count', '5'),
            ('04_select_where_id_11', 'tom'),
            ('05_explain_pruning', 'Shards: 1/4'),
            ('06_tables_after_drop', '<none>'),
            ('07_tombstone_flags', 'true')
        ) AS t(step, observed) ORDER BY step
        """,
    ),
)


def _txn_rollback(spark, sf_dir):
    """DDL-transaction atomicity through the front door (SURVEY §2.A17,
    test/sql/mpp_transaction.test:14-24): BEGIN; CREATE; ROLLBACK leaves no
    table (SELECT on it errors, catalog listing is empty, data files are
    gone), while BEGIN; CREATE; COMMIT persists. Observations returned as
    literal rows; oracle states the expected rows."""
    mpp = MppSession(spark, _gate_tmpdir())
    obs: list[tuple[str, str]] = []

    mpp.sql("BEGIN")
    mpp.sql("CREATE TABLE tx(a INTEGER, b VARCHAR) PARTITION BY (a) WITH BUCKETS 2")
    obs.append(("01_visible_inside_txn", str(mpp.catalog.exists("tx")).lower()))
    mpp.sql("INSERT INTO tx VALUES (1,'x'),(2,'y')")
    mpp.sql("ROLLBACK")
    obs.append(("02_exists_after_rollback", str(mpp.catalog.exists("tx")).lower()))
    obs.append(
        ("03_tables_after_rollback", str(len(mpp.sql("SHOW TABLES").collect())))
    )
    try:
        mpp.sql("SELECT * FROM tx").collect()
        obs.append(("04_select_after_rollback", "no_error"))
    except Exception:
        obs.append(("04_select_after_rollback", "error"))

    mpp.sql("BEGIN TRANSACTION")
    mpp.sql("CREATE TABLE tx2(a INTEGER) PARTITION BY (a) WITH BUCKETS 2")
    mpp.sql("COMMIT")
    obs.append(("05_exists_after_commit", str(mpp.catalog.exists("tx2")).lower()))
    return spark.createDataFrame(obs, _GATE_SCHEMA).orderBy("step")


register(
    "mpp_txn_rollback",
    Query(
        spark=_txn_rollback,
        oracle="""
        SELECT * FROM (VALUES
            ('01_visible_inside_txn', 'true'),
            ('02_exists_after_rollback', 'false'),
            ('03_tables_after_rollback', '0'),
            ('04_select_after_rollback', 'error'),
            ('05_exists_after_commit', 'true')
        ) AS t(step, observed) ORDER BY step
        """,
    ),
)


def _unique_constraint(spark, sf_dir):
    """UNIQUE / PRIMARY KEY enforcement through the front door (new r4,
    closing VERDICT r3 "What's missing" #4 / "Next round" #7): constraints
    are enforced BUCKET-LOCALLY at insert — the reference's exact
    semantics, since it carries constraints into shard DDL where DuckDB's
    per-shard index enforces them (create_distributed_table.cpp:107).
    Covers: duplicate rejected + table untouched, batch-internal duplicate
    rejected, multiple NULLs allowed, PRIMARY KEY implying NOT NULL, and
    composite UNIQUE rejected loudly. Observations as literal rows."""
    mpp = MppSession(spark, _gate_tmpdir())
    obs: list[tuple[str, str]] = []

    mpp.sql(
        "CREATE TABLE uq(id INTEGER UNIQUE, grp INTEGER) "
        "PARTITION BY (grp) WITH BUCKETS 4"
    )
    obs.append(("01_insert_ok", str(mpp.sql(
        "INSERT INTO uq VALUES (1, 10), (2, 10), (NULL, 10)"
    ))))
    try:
        mpp.sql("INSERT INTO uq VALUES (1, 10)")
        obs.append(("02_dup_same_bucket", "no_error"))
    except ValueError:
        obs.append(("02_dup_same_bucket", "constraint_error"))
    obs.append(("03_rows_after_reject", str(
        mpp.sql("SELECT COUNT(*) AS n FROM uq").collect()[0][0]
    )))
    try:
        mpp.sql("INSERT INTO uq VALUES (7, 10), (7, 10)")
        obs.append(("04_dup_within_batch", "no_error"))
    except ValueError:
        obs.append(("04_dup_within_batch", "constraint_error"))
    obs.append(("05_second_null_ok", str(mpp.sql("INSERT INTO uq VALUES (NULL, 10)"))))

    mpp.sql(
        "CREATE TABLE pk(id INTEGER PRIMARY KEY, v VARCHAR) "
        "PARTITION BY (id) WITH BUCKETS 4"
    )
    mpp.sql("INSERT INTO pk VALUES (5, 'a')")
    try:
        mpp.sql("INSERT INTO pk VALUES (5, 'b')")
        obs.append(("06_pk_duplicate", "no_error"))
    except ValueError:
        obs.append(("06_pk_duplicate", "constraint_error"))
    try:
        mpp.sql("INSERT INTO pk VALUES (NULL, 'c')")
        obs.append(("07_pk_null", "no_error"))
    except Exception:
        obs.append(("07_pk_null", "not_null_error"))
    try:
        mpp.sql(
            "CREATE TABLE cu(a INTEGER, b INTEGER, UNIQUE(a, b)) "
            "PARTITION BY (a) WITH BUCKETS 2"
        )
        obs.append(("08_composite_unique", "accepted"))
    except NotImplementedError:
        obs.append(("08_composite_unique", "not_implemented"))
    return spark.createDataFrame(obs, _GATE_SCHEMA).orderBy("step")


register(
    "mpp_unique_constraint",
    Query(
        spark=_unique_constraint,
        oracle="""
        SELECT * FROM (VALUES
            ('01_insert_ok', '3'),
            ('02_dup_same_bucket', 'constraint_error'),
            ('03_rows_after_reject', '3'),
            ('04_dup_within_batch', 'constraint_error'),
            ('05_second_null_ok', '1'),
            ('06_pk_duplicate', 'constraint_error'),
            ('07_pk_null', 'not_null_error'),
            ('08_composite_unique', 'not_implemented')
        ) AS t(step, observed) ORDER BY step
        """,
    ),
)
