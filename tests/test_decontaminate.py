"""decontaminate_train — split-leakage repair (drop TRAIN docs with an
LSH near-duplicate in valid/test; eval docs are never dropped).

Built in r12, gate registration deferred to r13 (rotation frozen,
VERDICT r11 #2) — this file is the correctness evidence until then:
crafted-semantics matrix plus exact value equality against the DuckDB
oracle (`decontaminate_oracle_sql`) on crafted parquet and the real
sf0.001 documents table.
"""

import hashlib
import os

import duckdb
import pytest

from duckdb_mpp_spark.operators.curation import (
    decontaminate_gate_fn,
    decontaminate_oracle_sql,
    decontaminate_train,
)

TRAIN_CUT = int(0.8 * 65536)
VALID_CUT = int(0.9 * 65536)


def _split_of(doc_id: int) -> str:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
    return "train" if h < TRAIN_CUT else ("valid" if h < VALID_CUT else "test")


def _ids_by_split(n=2000):
    out = {"train": [], "valid": [], "test": []}
    for i in range(n):
        out[_split_of(i)].append(i)
    return out


LONG = " ".join(f"w{j} tok{j} body{j}" for j in range(15))  # 45 words
OTHER = " ".join(f"x{j} y{j} z{j}" for j in range(15))


def test_contaminated_train_doc_dropped_eval_doc_kept(spark):
    ids = _ids_by_split()
    t1, t2 = ids["train"][0], ids["train"][1]
    te, va = ids["test"][0], ids["valid"][0]
    rows = [
        (t1, LONG),    # train, identical to the test doc -> dropped
        (te, LONG),    # test twin -> NEVER dropped
        (t2, OTHER),   # clean train -> kept
        (va, "completely separate valid content " + " ".join(
            f"v{j}" for j in range(40))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in decontaminate_train(docs).collect()}
    assert got[t1].split == "train" and got[t1].dropped is True
    assert got[te].split == "test" and got[te].dropped is False
    assert got[t2].dropped is False
    assert got[va].dropped is False


def test_train_train_neardup_is_not_contamination(spark):
    ids = _ids_by_split()
    t1, t2 = ids["train"][0], ids["train"][1]
    docs = spark.createDataFrame(
        [(t1, LONG), (t2, LONG)], "doc_id long, text string"
    )
    out = decontaminate_train(docs).collect()
    assert all(r.dropped is False for r in out), (
        "train-train duplicates are a dedup concern, not eval leakage"
    )


def test_valid_test_neardup_drops_neither(spark):
    ids = _ids_by_split()
    va, te = ids["valid"][0], ids["test"][0]
    docs = spark.createDataFrame(
        [(va, LONG), (te, LONG)], "doc_id long, text string"
    )
    out = decontaminate_train(docs).collect()
    assert all(r.dropped is False for r in out)


def _oracle_rows(path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    return sorted(tuple(r) for r in
                  con.execute(decontaminate_oracle_sql).fetchall())


def test_matches_duckdb_oracle_on_crafted_corpus(spark, tmp_path):
    ids = _ids_by_split()
    rows = (
        [(ids["train"][0], LONG), (ids["test"][0], LONG),
         (ids["train"][1], OTHER), (ids["valid"][0], LONG),
         (ids["train"][2], "short one"), (ids["test"][1], "short one")]
        + [(ids["train"][3 + j], f"unique{j} " + " ".join(
            f"u{j}w{i}" for i in range(20))) for j in range(5)]
    )
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    want = _oracle_rows(path + "/*.parquet")
    got = sorted(
        (r.doc_id, r.split, r.dropped)
        for r in decontaminate_train(spark.read.parquet(path)).collect()
    )
    assert got == want


def test_matches_duckdb_oracle_on_sf0001_documents(spark):
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata not present")
    want = _oracle_rows(f"{sf}/documents.parquet")
    got = sorted(
        (r.doc_id, r.split, r.dropped)
        for r in decontaminate_gate_fn(spark, sf).collect()
    )
    assert got == want
    # the corpus has engineered near-dups; at 80/10/10 odds some cross a
    # split boundary — if nothing is ever dropped the fixture stopped
    # exercising the operator
    assert any(r[2] for r in got), "no contaminated train docs flagged"
