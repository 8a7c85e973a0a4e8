"""Similarity search over embedding columns (``array<float>``).

- ``cosine(a, b)``: pure Catalyst expression — float products widened to
  double and summed in array order (``zip_with`` + ``aggregate``), so the
  result is bit-deterministic and engine-portable to within 1 ulp of the
  reduction order.
- Brute-force top-k: broadcast the (small) query set against the corpus —
  the correctness baseline; one pass over the corpus, no shuffle of the
  corpus side. This is the right plan at any corpus size as long as the
  query set is broadcastable.
- IVF-style search: restrict the scan to the query's coarse cell (here the
  ``label`` column plays the centroid-assignment role; a real deployment
  would k-means the corpus and store the centroid id exactly like this) —
  the candidate set shrinks by the number of cells, the classic
  recall/latency trade.
- Near-dup pairs: same-cell self-join above a cosine threshold — the
  embedding-space analog of LSH dedup.

Scores are rounded to 4 decimals in the output (both engines compute the
unrounded value to ~1e-15; ranking uses the unrounded score with a unique id
tiebreak).
"""

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.sources import load_table

DIM = 64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors. ``queries``: (qid, qv); ``corpus``:
    (cid, cv). Queries are broadcast; corpus is scanned once."""
    pairs = F.broadcast(queries).crossJoin(corpus).where(F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cos_raw")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "rank", F.round("cos_raw", 4).alias("score"))
    )


# DuckDB oracle building blocks: dot products via generate_series with the
# same float-multiply-then-widen arithmetic.
_DUCK_NORMS = f"""
  norms AS (
    SELECT vec_id, sqrt(SUM(CAST(embedding[t.i] * embedding[t.i] AS DOUBLE))) AS nrm
    FROM embeddings, generate_series(1, {DIM}) t(i)
    GROUP BY vec_id
  )"""


def _register():
    def topk_fn(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where("vec_id < 5").select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        return brute_force_topk(queries, corpus, k=10).orderBy("qid", "rank")

    register(
        "ann_topk_bruteforce",
        Query(
            spark=topk_fn,
            oracle=f"""
            WITH {_DUCK_NORMS},
            dots AS (
              SELECT q.vec_id AS qid, c.vec_id AS cid,
                     SUM(CAST(q.embedding[t.i] * c.embedding[t.i] AS DOUBLE)) AS dp
              FROM embeddings q, embeddings c, generate_series(1, {DIM}) t(i)
              WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
              GROUP BY 1, 2
            ),
            scored AS (
              SELECT qid, cid, dp / (nq.nrm * nc.nrm) AS cos_raw
              FROM dots JOIN norms nq ON nq.vec_id = qid
                        JOIN norms nc ON nc.vec_id = cid
            ),
            ranked AS (
              SELECT qid, cid,
                     CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS INT) AS rank,
                     round(cos_raw, 4) AS score
              FROM scored
            )
            SELECT qid, cid, rank, score FROM ranked WHERE rank <= 10
            ORDER BY qid, rank
            """,
        ),
    )

    def ivf_fn(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where("vec_id % 50 = 0").select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("cell"),
        )
        corpus = emb.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            F.col("label").alias("cell"),
        )
        pairs = F.broadcast(queries).join(corpus, "cell").where(F.col("qid") != F.col("cid"))
        scored = pairs.select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cos_raw"))
        w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("qid", "cid", "rank", F.round("cos_raw", 4).alias("score"))
            .orderBy("qid", "rank")
        )

    register(
        "ann_ivf_by_label",
        Query(
            spark=ivf_fn,
            oracle=f"""
            WITH {_DUCK_NORMS},
            q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 50 = 0),
            dots AS (
              SELECT q.vec_id AS qid, c.vec_id AS cid,
                     SUM(CAST(q.embedding[t.i] * c.embedding[t.i] AS DOUBLE)) AS dp
              FROM q, embeddings c, generate_series(1, {DIM}) t(i)
              WHERE c.label = q.label AND c.vec_id <> q.vec_id
              GROUP BY 1, 2
            ),
            scored AS (
              SELECT qid, cid, dp / (nq.nrm * nc.nrm) AS cos_raw
              FROM dots JOIN norms nq ON nq.vec_id = qid
                        JOIN norms nc ON nc.vec_id = cid
            ),
            ranked AS (
              SELECT qid, cid,
                     CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS INT) AS rank,
                     round(cos_raw, 4) AS score
              FROM scored
            )
            SELECT qid, cid, rank, score FROM ranked WHERE rank <= 5
            ORDER BY qid, rank
            """,
        ),
    )

    def neardup_fn(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
        pairs = a.crossJoin(b).where(F.col("va") < F.col("vb"))
        scored = pairs.select("va", "vb", cosine(F.col("ea"), F.col("eb")).alias("cos_raw"))
        return (
            scored.where(F.col("cos_raw") > 0.35)
            .select("va", "vb", F.round("cos_raw", 4).alias("score"))
            .orderBy("va", "vb")
        )

    register(
        "embedding_neardup_pairs",
        Query(
            spark=neardup_fn,
            oracle=f"""
            WITH {_DUCK_NORMS},
            dots AS (
              SELECT a.vec_id AS va, b.vec_id AS vb,
                     SUM(CAST(a.embedding[t.i] * b.embedding[t.i] AS DOUBLE)) AS dp
              FROM embeddings a, embeddings b, generate_series(1, {DIM}) t(i)
              WHERE a.vec_id < b.vec_id
              GROUP BY 1, 2
            )
            SELECT va, vb, round(dp / (na.nrm * nb.nrm), 4) AS score
            FROM dots JOIN norms na ON na.vec_id = va
                      JOIN norms nb ON nb.vec_id = vb
            WHERE dp / (na.nrm * nb.nrm) > 0.35
            ORDER BY va, vb
            """,
        ),
    )


_register()
