"""Graph analytics over the document-similarity graph.

The dedup stack already builds a graph (LSH candidate pairs →
``connected_components`` in ``operators/dedup.py``); this module adds
**triangle counting** over the same edge set — the standard density /
clustering signal used to tell tight near-duplicate clusters (template
farms, mirrored sites: triangle-rich) apart from chains of pairwise
borderline matches (triangle-free), which curation pipelines treat very
differently.

Spark-first shape: the classic two-join triangle enumeration over an
oriented edge list. Edges are oriented a<b (each undirected edge stored
once), so every triangle {x,y,z} with x<y<z is found exactly once as
(x,y),(y,z),(x,z) — no post-hoc dedup of 6 permutations. Both joins are
equi-joins on node keys (key-partitioned shuffles; never a cartesian).
At 100 TB scale the textbook refinement is degree-ordering instead of
id-ordering (orient each edge low-degree → high-degree, bounding join
fan-out by arboricity); id-ordering keeps the oracle exactly portable
and the join shape identical, and the LSH graph is band-bounded sparse
by construction.

Everything is integer arithmetic — exact DuckDB oracle, no float drift.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.dedup import (
    _DUCK_BANDS,
    _spread,
    lsh_candidate_pairs,
    minhash_bands,
)
from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.sources import load_table

TOP_NODES = 20


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles (a < b < c) in an oriented edge list (doc_a < doc_b).

    ``edges`` feeds three join legs; callers should pass a materialized
    frame (the LSH pair builder already localCheckpoints) so the corpus
    pipeline isn't recomputed per leg."""
    ab = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    bc = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    ac = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    return ab.join(bc, "b").join(ac, ["a", "c"]).select("a", "b", "c")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts (nodes in ≥1 triangle)."""
    tri = triangles(edges)
    corner = tri.select(
        F.explode(F.array("a", "b", "c")).alias("doc_id")
    )
    return corner.groupBy("doc_id").agg(F.count("*").alias("n_triangles"))


# ---------------------------------------------------------------------------
# gate query + DuckDB oracle
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = _DUCK_BANDS + f""",
  pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  ),
  tri AS (
    SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
    FROM pairs ab
    JOIN pairs bc ON bc.doc_a = ab.doc_b
    JOIN pairs ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
  ),
  corners AS (
    SELECT a AS doc_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  )
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM corners GROUP BY 1
  ORDER BY n_triangles DESC, doc_id
  LIMIT {TOP_NODES}
"""


def _register() -> None:
    def triangle_fn(spark, sf_dir):
        docs = _spread(load_table(spark, sf_dir, "documents"), "doc_id")
        edges = lsh_candidate_pairs(minhash_bands(docs)).localCheckpoint(eager=False)
        return (
            triangle_counts(edges)
            .orderBy(F.col("n_triangles").desc(), "doc_id")
            .limit(TOP_NODES)
        )

    register("graph_triangle_count", Query(spark=triangle_fn, oracle=_TRIANGLE_ORACLE))


_register()
