"""split_tag — the ONE hash-split definition (VERDICT r12 #2).

The md5 split-tag expression was inlined six times across
train_test_split / decontaminate_train / split_leakage and their DuckDB
oracles; a fraction change touching five of six sites would silently
decontaminate against a different split than it trains on. These tests
pin (a) the single-definition source contract, (b) Spark/DuckDB tag
equality including the NULL-id edge, and (c) that the three operators
actually derive their tags from the shared helper.

tests/test_decontaminate.py and scripts/hostile_sampling.py keep their
own INDEPENDENT reimplementations on purpose — they are audits that must
catch an accidental change to this helper, not follow it.
"""

import hashlib
import inspect

import duckdb

from duckdb_mpp_spark.operators import curation
from duckdb_mpp_spark.operators.curation import (
    SPLIT_TRAIN_MAX,
    SPLIT_VALID_MAX,
    decontaminate_train,
    duck_split_tag,
    split_leakage,
    split_tag,
    train_test_split,
)


def _ref_tag(doc_id):
    """Independent pure-Python reference of the split contract."""
    if doc_id is None:
        return "test"  # NULL hash fails every < comparison -> otherwise-arm
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
    return "train" if h < SPLIT_TRAIN_MAX else (
        "valid" if h < SPLIT_VALID_MAX else "test"
    )


def test_single_definition_source_contract():
    src = inspect.getsource(curation)
    # the fraction thresholds exist exactly once each (the constants)
    assert src.count("int(0.8 * 65536)") == 1
    assert src.count("int(0.9 * 65536)") == 1
    # and every split-aware operator + oracle builder goes through the
    # shared helpers, not a private copy
    for fn in (train_test_split, decontaminate_train, split_leakage):
        assert "split_tag(" in inspect.getsource(fn), fn.__name__
    for builder in (curation._build_decontaminate_gate,
                    curation._register_split_leakage):
        assert "_duck_split_cte()" in inspect.getsource(builder), builder
    # no stray md5-substring split expression outside the two helpers
    helpers = inspect.getsource(split_tag) + inspect.getsource(duck_split_tag)
    assert helpers.count("1, 4") == 2
    assert src.count("1, 4") == 2, (
        "an inlined copy of the 16-bit md5 split draw came back"
    )


def test_spark_and_duck_tags_agree_including_null_id(spark):
    ids = list(range(500)) + [None]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.split
        for r in df.select("doc_id", split_tag().alias("split")).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT doc_id, {duck_split_tag('doc_id')} FROM "
            "(SELECT unnest(range(500)) AS doc_id UNION ALL SELECT NULL)"
        ).fetchall()
    )
    assert got == want
    for i in ids:
        assert got[i] == _ref_tag(i), f"doc_id {i}"
    # all three splits actually occur in the probe range
    assert set(got.values()) == {"train", "valid", "test"}


def test_decontaminate_tags_identical_to_split_tag(spark):
    docs = spark.createDataFrame(
        [(i, f"totally unique text number {i} with words w{i} x{i}")
         for i in range(300)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.split for r in decontaminate_train(docs).collect()}
    want = {
        r.doc_id: r.split
        for r in docs.select("doc_id", split_tag().alias("split")).collect()
    }
    assert out == want
