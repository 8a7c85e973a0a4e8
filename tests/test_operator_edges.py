"""Edge-input regressions from the round-4 operator review: inputs the
oracle gates cannot exercise (the driver fixtures are null-free and
non-empty) but that real corpora contain — empty/NULL text, zero-norm
embeddings, adversarial graph diameters, simhash pairs whose differing
bits fall in any block."""

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_bands,
    simhash_neighbor_pairs,
    simhash64,
    simhash64_neighbor_pairs,
)
from duckdb_mpp_spark.operators.similarity import brute_force_topk, kmeans_fit
from duckdb_mpp_spark.operators.text import tokens


def test_simhash_banding_has_guaranteed_recall(spark):
    """review r4: the old top-16-bit prefix band missed pairs whose
    differing bit fell inside the prefix; max_hamming+1 disjoint blocks
    must find EVERY pair within the hamming budget (pigeonhole)."""
    base = 0b10110011_01011100_11110000_10101010
    fps = [("d0", base)]
    # flip each single bit — all 32 hamming-1 neighbors must be found
    fps += [(f"b{j:02d}", base ^ (1 << j)) for j in range(32)]
    sim = spark.createDataFrame(fps, "doc_id string, simhash long")
    pairs = simhash_neighbor_pairs(sim, max_hamming=4).collect()
    with_d0 = {r["doc_b"] for r in pairs if r["doc_a"] == "d0"} | {
        r["doc_a"] for r in pairs if r["doc_b"] == "d0"
    }
    assert with_d0 == {f"b{j:02d}" for j in range(32)}
    assert all(r["hamming"] <= 4 for r in pairs)
    # and no duplicate pairs despite multi-block agreement
    keys = [(r["doc_a"], r["doc_b"]) for r in pairs]
    assert len(keys) == len(set(keys))


def test_empty_docs_do_not_form_lsh_bucket(spark):
    """review r4: empty/whitespace/NULL-text docs must emit NO minhash
    signature (the old empty-string shingle gave them all one identical
    signature — one degenerate bucket, jaccard-1.0 'duplicates')."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, "   "), (4, None), (5, "")],
        "doc_id long, text string",
    )
    bands = minhash_bands(docs)
    assert {r["doc_id"] for r in bands.select("doc_id").distinct().collect()} == {1}
    assert lsh_candidate_pairs(bands).count() == 0


def test_exact_dedup_null_text_not_grouped(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["group_size"], r["kept"]) for r in exact_dedup(docs).collect()}
    assert got[1] == (1 + 1, True) and got[2] == (2, False)
    # NULL-text docs are singleton groups, each kept
    assert got[3] == (1, True) and got[4] == (1, True)


def test_connected_components_raises_on_diameter_overflow(spark):
    """review r4: exhausting max_iter must be a loud error, not silently
    split components (each split electing its own canonical doc)."""
    n = 12
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    # converges to one component labeled 0 — and in O(log^2 n) rounds now
    # (r13: alternating large-star/small-star replaced O(diameter)
    # min-label propagation), so a diameter-11 chain fits easily in 6
    labels = connected_components(chain, nodes, max_iter=6)
    assert {r["label"] for r in labels.collect()} == {0}
    # max_iter=1 can never observe a stationary edge signature (the check
    # compares round N to round N-1), so exhaustion must raise loudly
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, nodes, max_iter=1)


def test_tokens_null_text_is_empty_array(spark):
    df = spark.createDataFrame([(1, None), (2, " a b ")], "id long, text string")
    got = {r["id"]: r["n"] for r in df.select("id", F.size(tokens("text")).alias("n")).collect()}
    assert got == {1: 0, 2: 2}  # not -1 (legacy sizeOfNull)


def test_zero_norm_embedding_never_ranks(spark):
    """review r4: a zero vector's 0/0 cosine is NaN, which Spark sorts
    ABOVE every real score — it must never displace a true neighbor."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "cid long, cv array<float>",
    )
    queries = spark.createDataFrame([(10, [1.0, 0.0])], "qid long, qv array<float>")
    got = [(r["cid"], r["rank"]) for r in brute_force_topk(queries, corpus, k=2).collect()]
    assert [c for c, _ in got][:2] == [1, 2]  # zero vector not rank 1


def test_kmeans_keeps_k_centroids_on_empty_cluster(spark):
    """review r4: duplicate init vectors empty a cluster after the first
    assignment; the empty cluster must keep its centroid, not vanish."""
    vecs = [(i, [0.0, 0.0]) for i in range(4)] + [
        (10, [5.0, 5.0]), (11, [5.1, 5.1]), (12, [9.0, 9.0]), (13, [9.1, 9.1]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb, k=4, iters=2)
    assert cents.count() == 4


def test_multimodal_null_and_empty_text(spark):
    """review r4: NULL/empty text must flow through every mapInPandas
    operator as an empty (or placeholder) payload, not crash the task."""
    from duckdb_mpp_spark.operators.multimodal import (
        decode_sgm_features,
        encode_sgm_images,
        extract_features,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "hello world", "web", "en", 11), (2, None, "web", "en", 0),
         (3, "", "web", "en", 0)],
        "doc_id long, text string, source string, lang string, n_chars int",
    )
    payloads = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload"),
    )
    feats = {r["doc_id"]: r for r in extract_features(payloads).collect()}
    assert feats[2]["byte_len"] == 0 and feats[2]["head_byte"] == -1
    assert feats[3]["checksum"] == 0
    # frames: empty payloads emit zero frames
    frames = sample_frames(payloads).groupBy("doc_id").count().collect()
    assert {r["doc_id"] for r in frames} == {1}
    # SGM round trip: every doc yields a decodable image
    decoded = decode_sgm_features(encode_sgm_images(docs)).collect()
    assert {r["doc_id"] for r in decoded} == {1, 2, 3}
    by_id = {r["doc_id"]: r for r in decoded}
    assert by_id[2]["mean_pixel"] == 0 and by_id[2]["n_pixels"] >= 1


def test_zero_area_sgm_decodes(spark):
    from duckdb_mpp_spark.operators.multimodal import decode_sgm_features, encode_sgm

    payload = encode_sgm(0, 5, 1, b"")
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    got = decode_sgm_features(df).collect()[0]
    assert (got["n_pixels"], got["mean_pixel"]) == (0, 0)


def test_quality_score_empty_text_no_ansi_crash(spark):
    """review r4: length-0 text made the punct/upper ratios divide by zero
    — ANSI Spark raises where DuckDB yields NULL. Empty docs score the
    floor (all ratios 0)."""
    from duckdb_mpp_spark.operators.text import quality_features, quality_score_col

    docs = spark.createDataFrame(
        [(1, "The quick. Brown fox!"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert got[2]["punct_ratio"] == 0.0 and got[2]["upper_ratio"] == 0.0
    assert got[2]["quality_score"] is not None
    # the exported single-expression score agrees with the features column
    s = {r["doc_id"]: r["q"] for r in docs.select(
        "doc_id", quality_score_col("text").alias("q")).collect()}
    for k in got:
        assert s[k] == got[k]["quality_score"]


def test_array_surface_empty_array_no_ansi_crash(spark, shadow_views):
    """review r4: embedding[0] / embedding[size-1] throw INVALID_ARRAY_INDEX
    on empty arrays under ANSI Spark; the gate text must yield NULLs."""
    shadow_views(
        "embeddings",
        spark.createDataFrame(
            [(1, "a", [1.0, 2.0]), (2, "b", [])],
            "vec_id long, label string, embedding array<float>",
        ),
    )
    from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = {r["vec_id"]: r for r in
            spark.sql(REGISTRY["array_struct_surface"].spark).collect()}
    assert rows[1]["e_first"] == 1.0 and rows[1]["e_last"] == 2.0
    assert rows[2]["e_first"] is None and rows[2]["e_last"] is None


def test_simhash64_banding_has_guaranteed_recall(spark):
    """ADVICE r4: 64-bit fingerprints with the same 5-block construction —
    every hamming<=4 neighbor must be found regardless of WHICH bits
    differ, including bits spanning the hi/lo boundary (block 2 covers
    bits 25..37)."""
    hi, lo = 0b1011_0011_0101_1100_1111_0000_1010_1010, 0b0101_0101_0000_1111_0011_1010_1100_0110
    rows = [("d0", hi, lo)]
    # flip each of the 64 bits once (hamming-1 neighbors)
    rows += [(f"lo{j:02d}", hi, lo ^ (1 << j)) for j in range(32)]
    rows += [(f"hi{j:02d}", hi ^ (1 << j), lo) for j in range(32)]
    # a hamming-4 neighbor straddling the boundary, and a hamming-5 miss
    rows += [("h4", hi ^ 0b11, lo ^ (0b11 << 30))]
    rows += [("h5", hi ^ 0b111, lo ^ (0b11 << 30))]
    sim = spark.createDataFrame(rows, "doc_id string, sim_hi long, sim_lo long")
    pairs = simhash64_neighbor_pairs(sim, max_hamming=4).collect()
    with_d0 = {r["doc_b"] for r in pairs if r["doc_a"] == "d0"} | {
        r["doc_a"] for r in pairs if r["doc_b"] == "d0"
    }
    expect = {f"lo{j:02d}" for j in range(32)} | {f"hi{j:02d}" for j in range(32)} | {"h4"}
    assert with_d0 == expect
    assert all(r["hamming"] <= 4 for r in pairs)
    keys = [(r["doc_a"], r["doc_b"]) for r in pairs]
    assert len(keys) == len(set(keys))


def test_simhash64_halves_consistent_with_32bit_low_half(spark):
    """sim_lo of the 64-bit fingerprint is BY CONSTRUCTION the 32-bit
    fingerprint (same md5 digits 1..8), so the widening cannot drift from
    the oracle-anchored 32-bit implementation."""
    from duckdb_mpp_spark.operators.dedup import simhash32

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "over the lazy dog"), (3, "")],
        "doc_id long, text string",
    )
    lo64 = {r["doc_id"]: r["sim_lo"] for r in simhash64(docs).collect()}
    fp32 = {r["doc_id"]: r["simhash"] for r in simhash32(docs).collect()}
    assert lo64 == fp32
    hv = {r["doc_id"]: r["sim_hi"] for r in simhash64(docs).collect()}
    assert all(0 <= v < 2 ** 32 for v in hv.values())


def test_incremental_dedup_edge_shapes(spark):
    """r6 one-join rework guardrails: the left-outer + tagged-reference
    shape must preserve the old two-join semantics on inputs the sf
    fixtures' %7 split never produces — an EMPTY index (first crawl run),
    an index doc sharing the batch doc's id (index wins, dup_of may equal
    the doc itself), and a doc matching both an index doc and an earlier
    batch doc via different bands (index precedence, not band order)."""
    from duckdb_mpp_spark.operators.dedup import incremental_dedup

    schema = "doc_id long, band int, band_key string"

    # empty index: batch-internal precedence only
    idx = spark.createDataFrame([], schema)
    batch = spark.createDataFrame(
        [(3, 0, "x"), (1, 0, "x"), (2, 1, "y"), (9, 2, "z")], schema
    )
    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in incremental_dedup(idx, batch).collect()
    }
    assert got == {
        1: ("new", None),       # smallest id in its bucket
        2: ("new", None),       # alone in band 1
        3: ("dup_batch", 1),    # earlier (smaller-id) batch doc wins
        9: ("new", None),
    }

    # id collision + dual match: index match must win over an earlier
    # batch match even when the batch match has a smaller id
    idx = spark.createDataFrame([(7, 0, "x"), (5, 3, "q")], schema)
    batch = spark.createDataFrame(
        [(5, 3, "q"), (2, 0, "x"), (7, 0, "x"), (8, 0, "x"), (8, 5, "w"), (4, 5, "w")],
        schema,
    )
    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in incremental_dedup(idx, batch).collect()
    }
    assert got == {
        2: ("dup_index", 7),    # index match even though batch has no earlier doc
        4: ("new", None),
        5: ("dup_index", 5),    # same-id collision: index wins, self-referential
        7: ("dup_index", 7),
        8: ("dup_index", 7),    # index precedence over earlier batch docs 2 and 4
    }


def test_gemm_pairs_skip_null_embeddings(spark):
    """review r6: a NULL embedding (failed encoder output) must yield no
    pairs — np.stack would otherwise crash the whole kernel — and the
    in-kernel threshold must not change surviving values."""
    from duckdb_mpp_spark.operators.similarity import blocked_pair_scores

    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None), (4, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = blocked_pair_scores(emb, n_blocks=2).collect()
    assert {(r["va"], r["vb"]) for r in got} == {(1, 2)}  # 3 NULL, 4 zero-norm
    thr = blocked_pair_scores(emb, n_blocks=2, min_score=0.5).collect()
    assert {(r["va"], r["vb"], round(r["cos_raw"], 6)) for r in thr} == {
        (1, 2, 1.0)
    }
