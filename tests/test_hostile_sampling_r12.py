"""Regression tests for the r12 sampling/split hostile sweep
(``scripts/hostile_sampling.py``, VERDICT r11 #6).

The sweep found ONE real bug — the silent-wrong-answer class:
``weighted_domain_sample`` with a NaN weight kept the ENTIRE domain.
Spark (and DuckDB) order NaN above every numeric value, so the keep
filter ``u < NaN`` was true for every row — an upstream 0/0 in a weight
computation would silently oversample a whole domain instead of
dropping it. The fix rejects NaN weights at call time; zero/negative
(keep nothing) and >=1 (keep all) follow from u ∈ [0,1) and stay
accepted. The other 17 sweep cases passed first-run; the cheapest
invariants are pinned here so they cannot rot.
"""

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.corpus import (
    sequence_packing,
    stratified_sample_exact,
    weighted_domain_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_nan_weight_raises_instead_of_keeping_domain(spark):
    docs = _docs(spark, [(i, "en", f"t {i}") for i in range(50)])
    with pytest.raises(ValueError, match="NaN"):
        weighted_domain_sample(docs, weights={"en": float("nan")})


def test_none_weight_raises_instead_of_dropping_domain(spark):
    # the sibling failure mode (review r12): lit(None) makes the keep
    # filter NULL for every row — a None weight from a failed upstream
    # lookup would silently DROP the whole domain
    docs = _docs(spark, [(i, "en", f"t {i}") for i in range(50)])
    with pytest.raises(ValueError, match="real numbers"):
        weighted_domain_sample(docs, weights={"en": None})


def test_zero_and_negative_weights_keep_nothing(spark):
    docs = _docs(spark, [(i, "en", f"t {i}") for i in range(100)])
    assert weighted_domain_sample(docs, weights={"en": 0.0}).count() == 0
    assert weighted_domain_sample(docs, weights={"en": -1.0}).count() == 0


def test_weight_above_one_keeps_everything(spark):
    docs = _docs(spark, [(i, "en", f"t {i}") for i in range(100)])
    assert weighted_domain_sample(docs, weights={"en": 2.0}).count() == 100


def test_stratified_small_stratum_fully_kept_contiguous_ranks(spark):
    docs = _docs(
        spark,
        [(i, "big", f"t {i}") for i in range(40)]
        + [(100 + i, "tiny", f"t {i}") for i in range(3)],
    )
    out = stratified_sample_exact(docs, k=10)
    assert out.where("lang = 'big'").count() == 10
    tiny = sorted(r.rank for r in out.where("lang = 'tiny'").collect())
    assert tiny == [1, 2, 3]


def test_packing_conserves_null_and_empty_text_docs(spark):
    rows = [(i, "en", "w " * 40) for i in range(20)] + [
        (100, "en", None), (101, "en", ""), (102, "en", "   ")
    ]
    out = sequence_packing(_docs(spark, rows), n_workers=4, context=64)
    agg = out.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert agg["d"] == 23
    assert agg["t"] == 20 * 40
