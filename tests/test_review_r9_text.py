"""Regression tests for the r9 text/curation/multimodal review findings.
The crafted-fixture differential helper runs a REGISTRY gate and its
DuckDB oracle over a tmp sf-dir whose documents table contains the
inputs the driver fixtures never have (NULL text, duplicate doc_ids)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F


def _diff(spark, tmp_path, name, docs_rows):
    from duckdb_mpp_spark.queries import REGISTRY, run_spark_query

    docs = spark.createDataFrame(
        docs_rows, "doc_id bigint, text string, source string"
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )

    def norm(v):
        return round(v, 9) if isinstance(v, float) and not math.isnan(v) else v

    def key(t):
        return tuple((x is None, str(type(x)), str(x)) for x in t)

    sdf = run_spark_query(name, spark, str(tmp_path))
    scols = sorted(sdf.columns)
    s = sorted([tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=key)
    res = con.execute(REGISTRY[name].oracle_sql())
    cols = [d[0] for d in res.description]
    idx = [cols.index(c) for c in sorted(cols)]
    d = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=key)
    assert sorted(cols) == scols
    return s, d


# --- text_fingerprint: NULL-text docs stay in the report ---------------------

def test_fingerprint_null_text_docs_are_singletons(spark, tmp_path):
    rows = [
        (1, "the quick brown fox jumps over things", "web"),
        (2, "the quick brown fox jumps over things", "web"),
        (3, None, "crawl"),
        (4, None, "crawl"),
    ]
    s, d = _diff(spark, tmp_path, "text_fingerprint", rows)
    assert s == d
    by_id = {r[0]: r for r in s}
    assert set(by_id) == {1, 2, 3, 4}  # NULL docs no longer vanish
    # each NULL doc is its own singleton group, its own keeper
    for i in (3, 4):
        assert by_id[i][2] == 1 and by_id[i][3] == i
    # the real duplicate pair still groups
    assert by_id[1][2] == 2 and by_id[2][3] == 1


# --- token stats: bpe NULL -> 0 ------------------------------------------------

def test_token_stats_null_text_counts_zero_bpe(spark, tmp_path):
    rows = [(1, "hello world", "web"), (2, None, "web")]
    s, d = _diff(spark, tmp_path, "text_token_stats", rows)
    assert s == d
    cols = sorted(["doc_id", "n_tokens", "bpe_tokens", "len_chars"])
    by_id = {r[cols.index("doc_id")]: dict(zip(cols, r)) for r in s}
    # NULL-text doc must report 0 bpe tokens, not NULL
    assert by_id[2]["bpe_tokens"] == 0 and by_id[2]["n_tokens"] == 0


def test_bpe_estimate_null_is_zero(spark):
    from duckdb_mpp_spark.operators.text import bpe_token_estimate

    df = spark.createDataFrame([(None,), ("ab cd",)], "text string")
    got = [r[0] for r in df.select(bpe_token_estimate("text")).collect()]
    assert 0 in got and None not in got


def test_char_fingerprint_rejects_degenerate_k(spark):
    from duckdb_mpp_spark.operators.text import char_fingerprint

    with pytest.raises(ValueError, match="k must be"):
        char_fingerprint("text", k=0)


# --- fused language+quality binding ---------------------------------------------

def test_lang_quality_struct_matches_separate_expressions(spark):
    from duckdb_mpp_spark.operators.text import (
        lang_quality_struct,
        language_id,
        quality_score_col,
    )

    docs = spark.createDataFrame(
        [
            (1, "the of and to a in is it you that was for on are with"),
            (2, "der die und das ist ein nicht mit sich auf"),
            (3, ""),
            (4, None),
            (5, "xyzzy plugh"),
        ],
        "doc_id bigint, text string",
    )
    got = docs.select(
        "doc_id",
        lang_quality_struct("text").alias("lq"),
        language_id("text").alias("plang"),
        quality_score_col("text").alias("q"),
    ).collect()
    for r in got:
        assert r.lq.plang == r.plang, r
        assert r.lq.quality_score == pytest.approx(r.q), r


# --- curation: duplicate doc_id determinism ------------------------------------

def test_curation_duplicate_doc_ids_deterministic(spark, tmp_path):
    base = (
        "the of and to a in is it you that was for on are with as his "
        "they be at one have this from word but what some we can out"
    )
    rows = [
        (1, base, "web"),
        # duplicate doc_id, identical text, DIFFERENT source: the keeper
        # must be deterministic (source tiebreak) and identical in both
        # engines — pre-r9 each engine picked arbitrarily
        (2, base + " extra tail tokens here now", "crawl"),
        (2, base + " extra tail tokens here now", "web"),
    ]
    s, d = _diff(spark, tmp_path, "pipeline_corpus_curation", rows)
    assert s == d


# --- multimodal: undecodable payloads + resize validation ----------------------

def test_decode_features_survive_undecodable_payload(spark):
    from duckdb_mpp_spark.operators.multimodal import (
        decode_sgm_features,
        encode_sgm_images,
    )

    docs = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id bigint, text string"
    )
    good = encode_sgm_images(docs)
    bad = spark.createDataFrame(
        [(3, None), (4, bytearray(b"\x00garbage"))],
        "doc_id bigint, payload binary",
    )
    got = {r.doc_id: r for r in decode_sgm_features(good.union(bad)).collect()}
    assert got[1].width is not None and got[2].width is not None
    # NULL payload and unknown magic both yield NULL-feature rows, not a
    # dead task
    assert got[3].width is None and got[4].width is None


def test_pii_redact_null_text_counts_zero(spark):
    from duckdb_mpp_spark.operators.corpus import pii_redact

    docs = spark.createDataFrame(
        [(1, "mail a@b.com now"), (2, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert got[1].n_emails == 1
    assert got[2].n_emails == 0 and got[2].n_phones == 0
    assert got[2].redacted_md5 is None  # md5(NULL) stays NULL, both engines


def test_resize_media_rejects_degenerate_dimensions(spark):
    from duckdb_mpp_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, bytearray(b"abc"))], "doc_id bigint, payload binary"
    )
    with pytest.raises(ValueError, match="dimensions"):
        resize_media(df, 0, 4)
    ok = resize_media(df, 2, 3).collect()[0]
    assert len(ok.payload) == 6 and ok.meta.width == 2
