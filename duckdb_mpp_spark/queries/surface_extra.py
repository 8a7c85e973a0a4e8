"""Additional verified surface: exact percentiles, explode-path token
frequency, blocklist decontamination, higher-order array functions, and
keep-latest-version dedup.

All capabilities here ride on the delegated DuckDB surface of the reference
(`/root/reference/src/mpp_service.cpp:30-33` — workers execute arbitrary SQL,
so the full function library is in the reference's scope) plus the
north-star training-data-pipeline brief (decontamination, keep-latest).

Scale notes:
- `agg_percentiles_exact`: exact percentiles need a per-group sort; Spark's
  `percentile` aggregates partial state per partition then merges on the
  reducer — one shuffle on the (tiny-cardinality) group key. At 100 TB the
  per-group value buffer is the limit; for high-cardinality groups switch to
  `percentile_approx` (sketch-mergeable, bounded memory).
- `text_top_tokens`: explode → partial map-side count → shuffle only the
  (token, partial-count) pairs, never raw token instances; top-k is a
  TakeOrderedAndProject (no global sort materialization).
- `curation_blocklist_filter`: pure per-row expression (whole-stage codegen,
  no shuffle except the final small agg) — the shape of an n-gram
  decontamination pass against a benchmark blocklist.
- `dedup_keep_latest`: window row_number over (key, ts desc) — one hash
  shuffle on user_id; at scale this is the standard "keep newest crawl
  snapshot per URL" pass and benefits from AQE skew-split on hot keys.
"""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.operators.text import tokens
from duckdb_mpp_spark.sources import load_table

# ---------------------------------------------------------------------------
# exact percentiles (percentile_cont / percentile_disc)
# ---------------------------------------------------------------------------
# l_quantity is integral-valued DOUBLE, so cont-interpolation arithmetic
# (lower + (upper-lower)*frac with dyadic frac) is exact in both engines.
register(
    "agg_percentiles_exact",
    Query(
        spark="""
            SELECT l_returnflag,
                   percentile(l_quantity, 0.5)  AS median_qty,
                   percentile(l_quantity, 0.25) AS p25_qty,
                   percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty_disc,
                   COUNT(*) AS n
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        oracle="""
            SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.5)  AS median_qty,
                   quantile_cont(l_quantity, 0.25) AS p25_qty,
                   quantile_disc(l_quantity, 0.9)  AS p90_qty_disc,
                   COUNT(*) AS n
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
    ),
)


# ---------------------------------------------------------------------------
# token frequency via explode (the canonical corpus-statistics shape)
# ---------------------------------------------------------------------------
def _top_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


register(
    "text_top_tokens",
    Query(
        spark=_top_tokens,
        oracle="""
            WITH t AS (
              SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
                                        x -> x <> '')) AS tok
              FROM documents
            )
            SELECT tok, COUNT(*) AS n
            FROM t GROUP BY tok
            ORDER BY n DESC, tok LIMIT 20
        """,
    ),
)


# ---------------------------------------------------------------------------
# blocklist decontamination filter
# ---------------------------------------------------------------------------
_BLOCKLIST = ["spark", "grpc", "shard"]


def _blocklist_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    contaminated = F.arrays_overlap(
        tokens("text"), F.array(*[F.lit(w) for w in _BLOCKLIST])
    )
    return (
        docs.withColumn("dirty", contaminated)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("dirty").cast("bigint")).alias("n_removed"),
            F.sum((~F.col("dirty")).cast("bigint")).alias("n_kept"),
            F.min(F.when(~F.col("dirty"), F.col("doc_id"))).alias("first_kept_doc"),
        )
        .orderBy("source")
    )


_BL = ", ".join(f"'{w}'" for w in _BLOCKLIST)
register(
    "curation_blocklist_filter",
    Query(
        spark=_blocklist_filter,
        oracle=f"""
            WITH d AS (
              SELECT source, doc_id,
                     list_has_any(
                       COALESCE(list_filter(string_split(lower(trim(text)), ' '), x -> x <> ''), []),
                       [{_BL}]) AS dirty
              FROM documents
            )
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CAST(dirty AS BIGINT)) AS BIGINT) AS n_removed,
                   CAST(SUM(CAST(NOT dirty AS BIGINT)) AS BIGINT) AS n_kept,
                   MIN(CASE WHEN NOT dirty THEN doc_id END) AS first_kept_doc
            FROM d GROUP BY source ORDER BY source
        """,
    ),
)


# ---------------------------------------------------------------------------
# higher-order array functions over embeddings (transform/filter/aggregate/
# zip_with — all JVM-side lambda expressions, no UDFs)
# ---------------------------------------------------------------------------
from duckdb_mpp_spark.operators.similarity import _emb_oracle


def _hof_embeddings(spark, sf_dir):
    # valid-embedding convention (r9): NULL-element vectors diverge the
    # dialects here too (Spark aggregate NULL-propagates q_l1, DuckDB
    # list_sum skips the element) — read through the shared filter
    from duckdb_mpp_spark.operators.similarity import load_embeddings

    emb = load_embeddings(spark, sf_dir)
    e = F.col("embedding")
    # quantize each |x| to an integer (floor(|x|*256)) so sums are exact ints
    q = lambda x: F.floor(F.abs(x).cast("double") * 256).cast("bigint")  # noqa: E731
    n_pos = F.size(F.filter(e, lambda x: x > 0))
    q_l1 = F.aggregate(e, F.lit(0).cast("bigint"), lambda acc, x: acc + q(x))
    # zip_with against the reversed vector: quantize each product term
    prod_q = F.zip_with(
        e,
        F.reverse(e),
        lambda a, b: F.floor((a * b).cast("double") * 256).cast("bigint"),
    )
    q_revdot = F.aggregate(prod_q, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    per_row = emb.select(
        "vec_id", "label", n_pos.alias("n_pos"), q_l1.alias("q_l1"), q_revdot.alias("q_revdot")
    )
    return (
        per_row.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_pos").alias("sum_n_pos"),
            F.sum("q_l1").alias("sum_q_l1"),
            F.sum("q_revdot").alias("sum_q_revdot"),
        )
        .orderBy("label")
    )


register(
    "higher_order_array_fns",
    Query(
        spark=_hof_embeddings,
        oracle=_emb_oracle("""
            WITH p AS (
              SELECT label,
                     len(list_filter(embedding, x -> x > 0)) AS n_pos,
                     -- COALESCE: DuckDB list_sum([]) is NULL while Spark's
                     -- aggregate with a 0 seed is 0 (review r4)
                     COALESCE(list_sum(list_transform(embedding,
                       x -> CAST(floor(CAST(abs(x) AS DOUBLE) * 256) AS BIGINT))), 0) AS q_l1,
                     COALESCE(list_sum(list_transform(range(1, len(embedding) + 1),
                       i -> CAST(floor(CAST(embedding[i] * embedding[len(embedding) + 1 - i] AS DOUBLE) * 256) AS BIGINT))), 0) AS q_revdot
              FROM embeddings
            )
            SELECT label, COUNT(*) AS n,
                   CAST(SUM(n_pos) AS BIGINT) AS sum_n_pos,
                   CAST(SUM(q_l1) AS BIGINT) AS sum_q_l1,
                   CAST(SUM(q_revdot) AS BIGINT) AS sum_q_revdot
            FROM p GROUP BY label ORDER BY label
        """),
    ),
)


# ---------------------------------------------------------------------------
# keep-latest-version dedup (qualify-style: newest event per user)
# ---------------------------------------------------------------------------
def _keep_latest(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


register(
    "dedup_keep_latest",
    Query(
        spark=_keep_latest,
        oracle="""
            SELECT user_id, event_id, event_type
            FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1 ORDER BY user_id
        """,
    ),
)


# ---------------------------------------------------------------------------
# shared-dialect SQL conveniences: GROUP BY ALL, LIMIT/OFFSET pagination
# (both supported verbatim by Spark 4 and DuckDB)
# ---------------------------------------------------------------------------
register(
    "agg_group_by_all",
    Query(
        spark="""
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
            FROM orders
            GROUP BY ALL
            ORDER BY o_orderpriority, o_orderstatus
        """
    ),
)

# Pagination is a TopK under the hood: ORDER BY + LIMIT/OFFSET plans as
# TakeOrderedAndProject(limit + offset) — no global sort materialization.
# Unique o_orderkey in ORDER BY makes the page deterministic cross-engine.
register(
    "limit_offset_pagination",
    Query(
        spark="""
            SELECT o_orderkey, o_custkey, o_orderpriority
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 25 OFFSET 50
        """
    ),
)
