"""Round-8 performance-shape regressions: the checkpoint-free jaccard
flow (exchange reuse instead of localCheckpoint) and the production-hash
minhash variant's guaranteed-recall invariant.

Why these asserts exist: the lean flow deliberately removes every
localCheckpoint from the single-action jaccard path, so nothing FORCES
single evaluation anymore — it rests on Catalyst planning ReusedExchange
for canonically-equal subtrees, which silently vanishes if a future edit
makes the consumers prune different columns (the r7b trap: the whole LSH
pipeline then re-runs once per consumer with no error, just 2-5× wall).
"""

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.dedup import (
    jaccard_verify_from_docs,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_bands_fast,
    minhash_wide,
    minhash_wide_fast,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),  # token-identical to 1 (recall guaranteed)
            (3, base.upper()),  # token-identical after lowercasing
            (4, base + " extra tail words here"),  # near-dup
            (5, "completely different text about spark catalyst plans"),
            (6, None),
            (7, "   "),
        ],
        "doc_id bigint, text string",
    )


# --- fast family: guaranteed recall on token-identical docs ------------------

def test_fast_banding_token_identical_docs_always_candidates(spark):
    docs = _docs(spark)
    pairs = lsh_candidate_pairs(
        minhash_bands_fast(docs), materialize=False
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # identical token arrays => identical signatures under ANY hash
    # family => banded together in every band => always a candidate
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got


def test_fast_pipeline_verifies_identical_docs_at_one(spark):
    docs = _docs(spark)
    pairs = lsh_candidate_pairs(minhash_bands_fast(docs), materialize=False)
    found = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_verify_from_docs(docs, pairs)
        .where(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert found[(1, 2)] == 1.0 and found[(1, 3)] == 1.0


def test_fast_and_md5_signatures_have_same_shape(spark):
    docs = _docs(spark)
    a = minhash_wide(docs)
    b = minhash_wide_fast(docs)
    assert a.columns == b.columns
    # zero-token docs emit no signature in either family
    ids = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids == {1, 2, 3, 4, 5}
    # 56-bit range: h1 + (K-1)*h2 must never overflow int64 (ANSI mode)
    from duckdb_mpp_spark.operators.dedup import K_MINHASH

    mx = b.select(
        F.greatest(*[F.max(f"mh{i}") for i in range(K_MINHASH)])
    ).first()[0]
    assert mx < (1 << 61)


# --- lean flow: exchange reuse replaces the checkpoints ----------------------

def _executed(df):
    df.foreach(lambda r: None)
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_lean_lsh_pairs_reuse_band_exchange(spark):
    docs = _docs(spark)
    p = _executed(lsh_candidate_pairs(minhash_bands(docs), materialize=False))
    # the self-join's two sides must share ONE band-key exchange: exactly
    # one live minhash aggregate subtree (a second Generate/explode of the
    # corpus means the reuse silently vanished)
    assert "Reused" in p, p


def test_lean_verify_reuses_pair_and_shingle_exchanges(spark):
    docs = _docs(spark)
    pairs = lsh_candidate_pairs(minhash_bands(docs), materialize=False)
    q = jaccard_verify_from_docs(docs, pairs).where(F.col("jaccard") >= 0.5)
    p = _executed(q)
    # pairs feeds three consumers and dshn two — at least two distinct
    # Reused nodes must survive in the adaptive plan
    assert p.count("Reused") >= 2, p
    # and no per-consumer re-explode: each Generate node text appears once
    gen = [
        ln.strip().lstrip("+-: ")
        for ln in p.splitlines()
        if ln.strip().lstrip("+-: ").startswith("Generate ")
    ]
    assert len(gen) == len(set(gen)), p


def test_lean_and_checkpoint_pairs_agree(spark):
    docs = _docs(spark)
    lean = {
        tuple(r)
        for r in lsh_candidate_pairs(
            minhash_bands(docs), materialize=False
        ).collect()
    }
    ckpt = {
        tuple(r)
        for r in lsh_candidate_pairs(minhash_bands(docs)).collect()
    }
    assert lean == ckpt and lean


# --- r8 third pass: NULL-input robustness (similarity/corpus) ---------------

def test_blocked_pairs_survive_null_id_and_embedding(spark):
    from duckdb_mpp_spark.operators.similarity import blocked_pair_scores

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (None, [1.0, 0.0, 0.0, 0.0]),  # NULL id: must be skipped
            (4, None),                      # NULL embedding: skipped
        ],
        "vec_id bigint, embedding array<float>",
    )
    got = blocked_pair_scores(emb, min_score=0.5).collect()
    assert {(r.va, r.vb) for r in got} == {(1, 2)}


def test_kmeans_survives_null_embedding_in_init_range(spark):
    from duckdb_mpp_spark.operators.similarity import kmeans_fit

    rows = [(i, [float(i % 3), 1.0]) for i in range(1, 9)]
    rows[0] = (1, None)  # NULL embedding at the lowest id (init range)
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    log = []
    cent = kmeans_fit(emb, k=3, iters=2, inertia_log=log)
    assert cent.count() > 0
    assert all(x is not None for x in log)


def test_contamination_duplicate_ids_merge_like_oracle(spark):
    from duckdb_mpp_spark.operators.corpus import contamination_overlap

    docs = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon"), (7, "zeta eta theta iota kappa")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "zeta eta theta iota kappa")],
        "doc_id bigint, text string",
    )
    rows = contamination_overlap(docs, bench).collect()
    # one merged per-id row, frac bounded by 1.0 (pre-fix: two rows, 2.0)
    assert len(rows) == 1
    assert rows[0].n_shingles == rows[0].n_contaminated
    assert rows[0].contamination_frac == 1.0


def test_sequence_packing_validates_parameters(spark):
    from duckdb_mpp_spark.operators.corpus import sequence_packing

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="context"):
        sequence_packing(docs, context=0)
    with pytest.raises(ValueError, match="n_workers"):
        sequence_packing(docs, n_workers=0)
