"""Exact-substring dedup signals and IDF keyword extraction.

Two corpus operators a training-data pipeline runs after fuzzy dedup:

- ``duplicated_span_stats``: per-document statistics over long word
  n-gram spans that also occur in OTHER documents — the signal behind
  exact-substring deduplication ("Deduplicating Training Data Makes
  Language Models Better", Lee et al. 2022, which removes 50-token
  duplicated substrings). We keep the span width configurable
  (default 8 words) and report, per doc, how much of it is covered by
  cross-document duplicate spans, which is the decision input both for
  doc-level dropping and span-level cutting.
- ``tfidf_keywords``: top-k characteristic terms per document by
  tf·idf. IDF is computed in scaled *integer* arithmetic
  (``(1e6 · N) div df``) so scores are engine-exact — no float logs,
  no cross-engine rounding drift — while preserving the idf ordering
  (x ↦ N/df is monotone in idf).

Scale shape (100 TB): every step is groupBy/join on the gram or token
key — partial map-side aggregation, key-partitioned shuffles, no
broadcast of corpus-sized state, no driver collect. The gram join
(``per ⋈_sh docs_per_gram``) is a sort-merge on the gram key: a gram
hot enough to skew it is exactly the duplicated content the operator
exists to find, and its per-key row count is #docs containing it, never
#docs². Document counts enter through a 1-row broadcasted aggregate,
not a driver-side ``.count()``.

No reference parity: the reference engine (see SURVEY §2) has no corpus
operators; these extend the surface per the north-star brief, in the
style of ``operators/corpus.py``.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.dedup import shingle_hashes
from duckdb_mpp_spark.operators.text import _duck_tokens, tokens
from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.sources import load_table
from duckdb_mpp_spark.table import plan_size_bytes

SPAN_WORDS = 8        # duplicated-span width (words)
KEYWORDS_PER_DOC = 3  # top-k keywords
MIN_KEYWORD_LEN = 4   # skip short/function words
IDF_SCALE = 1_000_000


def duplicated_span_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = SPAN_WORDS
) -> DataFrame:
    """Per-doc duplicated-span stats: total span positions, positions whose
    k-word gram occurs in ≥2 distinct documents, and the duplicated
    fraction.

    Shape (r8, replacing the r7 self-join): the complement identity
    ``n_dup_spans = n_spans − (spans of grams unique to this doc)`` lets
    the heavy gram stream be consumed EXACTLY ONCE by a single gram-keyed
    aggregate — ``groupBy(sh).agg(count, min(doc), max(doc))`` — with no
    join back against it. A gram is unique to one doc iff
    ``min(doc) == max(doc)`` (NULL ids handled explicitly below), and
    every aggregate is map-side combinable, so a boilerplate gram shared
    by 10⁸ docs arrives at its reducer as ≤ #map-tasks partial rows —
    skew-immune by construction, strictly better than both the r6 window
    (one hot key = one WindowExec task) and the r7 groupBy+join (hot key
    rows stream through the probe side). ``n_spans`` needs no gram data
    at all: the shingle generator emits exactly ``greatest(|tokens|−k+1,
    1)`` spans per non-empty doc, so the totals side is one narrow
    column-pruned scan with a tiny per-doc fold. Two key-partitioned
    shuffles on the gram stream path (sh, then doc — the second over
    unique-gram rows only, pre-aggregated) plus one broadcast-sized
    doc-keyed join. Grams are 64-bit hashes of the token window
    (:func:`shingle_hashes` — ``xxhash64`` over the k token columns, no
    gram string ever materialized; the r6 jaccard measurement put
    concat_ws string assembly at ~45% of the shingle stage), exact-match
    semantics preserved up to 2^-64-scale collisions (the same trade
    minhash makes)."""
    g = shingle_hashes(df, id_col, text_col, k=k)
    gram = g.groupBy("sh").agg(
        F.count(F.lit(1)).alias("tot"),
        F.count(id_col).alias("n_nonnull"),
        F.min(id_col).alias("_owner"),
        F.max(id_col).alias("mx"),
    )
    # unique-to-one-doc grams: all occurrences in one non-NULL doc, or all
    # in the NULL-id doc (SQL GROUP BY treats NULL ids as ONE document —
    # min/max skip NULLs, so the all-NULL case needs its own arm; a gram
    # mixing NULL and real docs is cross-document, matching the oracle's
    # per-row n_docs count)
    uniq = (
        gram.where(
            (
                (F.col("n_nonnull") == F.col("tot"))
                & (F.col("_owner") == F.col("mx"))
            )
            | (F.col("n_nonnull") == 0)
        )
        .groupBy("_owner")
        .agg(F.sum("tot").alias("n_uniq"))
    )
    # token COUNT is case-independent: skip tokens()'s lower() here (the
    # gram side still lowercases — gram equality is defined over
    # lowercased words). Value-identical, one less pass over corpus bytes.
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " "),
            lambda x: x != F.lit(""),
        )
    )
    totals = (
        df.select(
            F.col(id_col),
            F.when(
                n_tok > 0, F.greatest(n_tok - (k - 1), F.lit(1))
            ).cast("long").alias("n_spans"),
        )
        .where(F.col("n_spans").isNotNull())
        # duplicate ids in the input fold into one output row, matching
        # the old groupBy(id)-shaped rollup
        .groupBy(id_col)
        .agg(F.sum("n_spans").alias("n_spans"))
    )
    # uniq is ≤ one row per doc. AQE broadcasts it at runtime anyway
    # (measured), but the static hint saves one adaptive stage round-trip
    # (~0.14 s at sf0.1). The hint is SIZE-SWITCHED, not unconditional
    # (review r5/r6 convention, e.g. corpus.py's offsets switch): uniq is
    # O(#docs), so forcing a broadcast on a 10^8-doc corpus would ship GBs
    # to every executor — past the threshold we leave the doc-keyed
    # shuffle join to AQE's own runtime decision.
    docs_bytes = plan_size_bytes(df)
    small = docs_bytes is not None and docs_bytes < 4 << 30
    joined = totals.join(
        F.broadcast(uniq) if small else uniq,
        F.expr(f"{id_col} <=> _owner"),
        "left",
    )
    n_dup = F.col("n_spans") - F.coalesce(F.col("n_uniq"), F.lit(0))
    return joined.select(
        id_col,
        "n_spans",
        n_dup.alias("n_dup_spans"),
        F.round(
            n_dup.cast("double") / F.col("n_spans").cast("double"), 6
        ).alias("dup_frac"),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = KEYWORDS_PER_DOC,
) -> DataFrame:
    """Top-k terms per doc by tf·idf_scaled, idf_scaled = (1e6·N) div df
    (exact bigint). Deterministic tiebreak (score desc, token asc).

    df (document frequency) is a groupBy + join sharing the tf exchange —
    same skew/single-evaluation rationale as ``duplicated_span_stats``.

    Exchange budget (r10): the doc corpus is repartitioned on the doc id
    ONCE up front — id-partitioning satisfies the (id, tok) clustering of
    the tf aggregate AND the final top-k window, so the exploded token
    stream never re-shuffles. The cross-doc side (doc_freq: one row per
    VOCABULARY term) is size-switched: under the shared 256 MiB source
    budget it is broadcast back to the id-partitioned tf (vocabulary of a
    broadcast-sized corpus is MBs), leaving TWO data exchanges total (the
    id repartition + doc_freq's own tok aggregate) where the old shape
    had four ((id,tok) agg, tok agg, the tf join side re-hashed on tok,
    and the window's id exchange) — measured 0.88 → 0.61 s at sf0.1,
    value-identical. Past the budget the tok-keyed join returns: a 100 TB
    vocabulary (~10⁸ terms with long tails) must not be forced into a
    broadcast, and the hash join on tok degrades gracefully."""
    from duckdb_mpp_spark.table import is_small_source

    small = is_small_source(df)
    base = df.select(F.col(id_col), tokens(text_col).alias("t"))
    if small:
        base = base.repartition(F.col(id_col))
    toks = base.select(
        F.col(id_col), F.explode("t").alias("tok")
    ).where(F.length("tok") >= MIN_KEYWORD_LEN)
    # df via groupBy + join on tf, not a window on the token key (review
    # r7): a stop-word-class token appears in ~every doc, and the window
    # would buffer all its (doc, tok) rows in ONE task. doc_freq counts
    # count(nullif(tf, -1)) — value-identical to count(*) (tf ≥ 1, never
    # -1 or NULL) but NOT provably non-null to the optimizer, so the tf
    # column survives column pruning in this branch, both join branches'
    # tf-aggregate subtrees stay canonically equal, and Catalyst plans a
    # ReusedExchange: tokenize + map side run once (same rationale as
    # duplicated_span_stats above; a plain count(*) — or count(tf), which
    # the optimizer rewrites to count(1) — pruned tf from one branch and
    # the whole tokenize/explode silently ran per branch).
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    doc_freq = tf.groupBy("tok").agg(
        F.count(F.nullif("tf", F.lit(-1))).alias("df")
    )
    tf = tf.join(F.broadcast(doc_freq) if small else doc_freq, "tok")
    n_total = df.agg(F.count("*").alias("n_total"))  # 1 row — broadcast join
    # tf is widened to DECIMAL(38,0) before the product (review r4): under
    # Spark's default non-ANSI arithmetic, tf·idf_scaled wraps silently
    # past 2^63 (df=1 on a 10^10-doc corpus gives idf_scaled=10^16; a term
    # repeated ≥923 times then ranks LAST instead of first). Decimal keeps
    # the score exact to 38 digits on both engines; the inner
    # (IDF_SCALE·N) div df stays bigint — safe to N ≈ 9·10^12 docs.
    scored = tf.join(F.broadcast(n_total)).withColumn(
        "score",
        F.expr(f"CAST(tf AS DECIMAL(38,0)) * (({IDF_SCALE} * n_total) div df)"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "rank", "tok", "tf", "score")
    )


# ---------------------------------------------------------------------------
# gate queries + DuckDB oracles
# ---------------------------------------------------------------------------

# Tokenization comes from text._duck_tokens() — the one shared definition
# (review r7: two hand-inlined copies here would silently diverge from the
# next tokenizer fix). ``WHERE len(ws) > 0`` mirrors shingles()'s
# zero-token-doc contract: empty/whitespace/NULL docs emit NO spans — the
# oracle's greatest(…, 1) floor previously minted one empty-string span
# per empty doc that the Spark side (correctly) never produces.
_DUCK_SPANS = f"""
  WITH words AS (
    SELECT doc_id, {_duck_tokens()} AS ws
    FROM documents
  ),
  spans AS (
    SELECT doc_id, array_to_string(ws[i:i+{SPAN_WORDS - 1}], ' ') AS sh
    FROM words, LATERAL (
      SELECT unnest(range(1, greatest(len(ws) - {SPAN_WORDS - 1}, 1) + 1)) AS i
    ) t
    WHERE len(ws) > 0
  ),
  per AS (SELECT doc_id, sh, COUNT(*) AS occ FROM spans GROUP BY 1, 2),
  dpg AS (SELECT sh, COUNT(*) AS n_docs FROM per GROUP BY 1)
"""

_SPAN_ORACLE = _DUCK_SPANS + """
  SELECT p.doc_id,
         CAST(SUM(p.occ) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN d.n_docs >= 2 THEN p.occ ELSE 0 END) AS BIGINT) AS n_dup_spans,
         round(CAST(SUM(CASE WHEN d.n_docs >= 2 THEN p.occ ELSE 0 END) AS DOUBLE)
               / CAST(SUM(p.occ) AS DOUBLE), 6) AS dup_frac
  FROM per p JOIN dpg d USING (sh)
  GROUP BY 1
  ORDER BY doc_id
"""

_KEYWORD_ORACLE = f"""
  WITH toks AS (
    SELECT doc_id, tok
    FROM (
      SELECT doc_id,
             unnest({_duck_tokens()}) AS tok
      FROM documents
    )
    WHERE length(tok) >= {MIN_KEYWORD_LEN}
  ),
  tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
  doc_freq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
  n AS (SELECT COUNT(*) AS n_total FROM documents),
  scored AS (
    SELECT t.doc_id, t.tok, t.tf,
           CAST(t.tf AS DECIMAL(38,0)) * (({IDF_SCALE} * n.n_total) // d.df) AS score
    FROM tf t JOIN doc_freq d USING (tok) CROSS JOIN n
  ),
  ranked AS (
    SELECT doc_id, tok, tf, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rank
    FROM scored
  )
  SELECT doc_id, CAST(rank AS INT) AS rank, tok,
         CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score
  FROM ranked WHERE rank <= {KEYWORDS_PER_DOC}
  ORDER BY doc_id, rank
"""


def _register() -> None:
    def spans_fn(spark, sf_dir):
        return duplicated_span_stats(load_table(spark, sf_dir, "documents")).orderBy(
            "doc_id"
        )

    register("dedup_substring_spans", Query(spark=spans_fn, oracle=_SPAN_ORACLE))

    def keywords_fn(spark, sf_dir):
        # barrier form required (r10): the top-k window and its rank
        # filter ride the operator's id partitioning — no shuffle boundary
        # above the corpus-sized window, so coalesce(1) would serialize it
        from duckdb_mpp_spark.queries import ordered_result

        docs = load_table(spark, sf_dir, "documents")
        return ordered_result(
            tfidf_keywords(docs), docs, "doc_id", "rank", exchange=True
        )

    register("text_tfidf_keywords", Query(spark=keywords_fn, oracle=_KEYWORD_ORACLE))


_register()
