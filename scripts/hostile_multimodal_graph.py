"""Hostile-fixture sweep for the MULTIMODAL and GRAPH/SKEW operator
families (VERDICT r10 #6) — the last two families that had only
clean-fixture coverage.

Multimodal cases exercise the Arrow `mapInPandas` boundary with payloads
a 100 TB crawl actually contains: NULL binary cells, empty buffers,
truncated SGM (valid magic, pixel buffer shorter than the header
declares), header-only prefixes, zero-dimension images, garbage bytes,
and a channels overflow. The contract under test: ONE bad payload must
never abort a task (the GEMM NULL-guard principle) — undecodable rows
degrade to NULL-feature rows.

Graph cases: self-loops, duplicate and reverse-duplicate edges (the
(a<b)-once contract violated), star hubs (all-one-key skew), isolated
cliques, and NULL endpoints — each compared against a DuckDB oracle
computing triangles from the canonicalized edge set (distinct, a<b,
no self-loops).

Skew cases: salted_agg / salted_join on all-one-key, NULL-key,
duplicate-row, and empty frames — verified by value identity with the
un-salted formulation (salting changes the shuffle, never the answer).

MUST run with cwd = repo root. Prints one JSON line with per-case
verdicts; exit code 1 when any case fails.
"""

import os
import sys

import duckdb
import pandas as pd

# derive the repo from this file's location, same as every other script
# in scripts/ (ADVICE r11 #4: a hardcoded absolute path imports a fixed
# checkout regardless of which repo the sweep is run from)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _hostile_common import Harness  # noqa: E402

_h = Harness("multimodal+graph+skew hostile fixtures")
case = _h.case

# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def _payload_frame(spark, payloads):
    rows = [(i, p) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def _hostile_payloads():
    from duckdb_mpp_spark.operators.multimodal import SGM_MAGIC, encode_sgm

    valid = encode_sgm(2, 2, 1, bytes([1, 2, 3, 4]))
    return {
        "null": None,
        "empty": b"",
        "valid": valid,
        "truncated_sgm": valid[:-2],  # header claims 4 pixels, 2 present
        "header_only": valid[:9],     # magic + dims, zero pixel bytes (claims 4)
        "short_header": SGM_MAGIC + b"\x00",  # shorter than the 9-byte header
        "zero_dim": encode_sgm(0, 5, 1, b""),  # header-valid zero-area
        "garbage": bytes(range(256)),  # no registered magic
        "oversize_channels": valid[:8] + bytes([255]),  # w*h*255 vs 4 bytes
    }


@case("mm_decode_sgm_features_survives_corrupt_payloads")
def _(spark):
    from duckdb_mpp_spark.operators.multimodal import decode_sgm_features

    pl = _hostile_payloads()
    names = list(pl)
    df = _payload_frame(spark, [pl[n] for n in names])
    rows = {r["doc_id"]: r for r in decode_sgm_features(df).collect()}
    assert len(rows) == len(names), "row count changed through decode"
    by = {n: rows[i] for i, n in enumerate(names)}
    assert by["valid"]["width"] == 2 and by["valid"]["n_pixels"] == 4
    assert by["zero_dim"]["n_pixels"] == 0 and by["zero_dim"]["mean_pixel"] == 0
    for n in ("null", "empty", "garbage", "truncated_sgm", "header_only",
              "short_header", "oversize_channels"):
        assert by[n]["width"] is None, (
            f"{n}: undecodable payload must yield a NULL-feature row, "
            f"got width={by[n]['width']}"
        )


@case("mm_extract_features_null_and_empty")
def _(spark):
    from duckdb_mpp_spark.operators.multimodal import extract_features

    df = _payload_frame(spark, [None, b"", b"abc"])
    rows = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert rows[0]["byte_len"] == 0 and rows[0]["head_byte"] == -1
    assert rows[1]["byte_len"] == 0
    assert rows[2]["byte_len"] == 3 and rows[2]["head_byte"] == ord("a")


@case("mm_sample_frames_null_empty_and_unaligned")
def _(spark):
    from duckdb_mpp_spark.operators.multimodal import (
        FRAME_BYTES, FRAME_STRIDE, sample_frames,
    )

    df = _payload_frame(spark, [None, b"", b"x" * (FRAME_BYTES + 3)])
    out = sample_frames(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc and 1 not in by_doc, "empty payloads emit no frames"
    frames = by_doc[2]
    assert [f["frame_idx"] for f in frames] == [0], (
        f"stride-{FRAME_STRIDE} sampling of a 2-frame payload keeps frame 0"
    )
    assert frames[0]["frame_len"] == FRAME_BYTES


@case("mm_resize_media_null_empty_and_reject_zero_dims")
def _(spark):
    from duckdb_mpp_spark.operators.multimodal import resize_media

    df = _payload_frame(spark, [None, b"", b"abcdef"])
    rows = {r["doc_id"]: r for r in resize_media(df, 3, 2).collect()}
    for i in range(3):
        assert len(rows[i]["payload"]) == 6, "resize contract: exactly w*h bytes"
        assert rows[i]["meta"]["width"] == 3
    try:
        resize_media(df, 0, 5)
        raise AssertionError("resize_media(0, 5) must raise")
    except ValueError:
        pass


@case("mm_encode_decode_roundtrip_hostile_text")
def _(spark):
    from duckdb_mpp_spark.operators.multimodal import (
        decode_sgm_features, encode_sgm_images,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, " "), (4, "Ünïcodé 🎉" * 50), (5, "x" * 5000)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           decode_sgm_features(encode_sgm_images(docs)).collect()}
    assert len(out) == 5
    for i in (1, 2, 3, 4, 5):
        assert out[i]["width"] is not None, f"doc {i}: every doc encodes validly"
        assert out[i]["n_pixels"] == out[i]["width"] * out[i]["height"]


# ---------------------------------------------------------------------------
# graph
# ---------------------------------------------------------------------------

def _oracle_triangle_total(edges_rows):
    """DuckDB oracle: triangles over the canonicalized simple graph
    (distinct undirected edges, self-loops dropped, NULLs dropped)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
    if edges_rows:
        con.executemany("INSERT INTO e VALUES (?, ?)", edges_rows)
    return con.execute(
        """
        WITH c AS (
          SELECT DISTINCT least(a,b) AS a, greatest(a,b) AS b
          FROM e WHERE a IS NOT NULL AND b IS NOT NULL AND a <> b
        )
        SELECT count(*) FROM c e1
        JOIN c e2 ON e1.b = e2.a
        JOIN c e3 ON e1.a = e3.a AND e2.b = e3.b
        """
    ).fetchone()[0]


def _spark_triangle_total(spark, edges_rows):
    from duckdb_mpp_spark.operators.graph import triangles

    df = spark.createDataFrame(
        pd.DataFrame(edges_rows, columns=["doc_a", "doc_b"]).astype("Int64"),
        "doc_a long, doc_b long",
    ) if edges_rows else spark.createDataFrame([], "doc_a long, doc_b long")
    return triangles(df).count()


GRAPH_FIXTURES = {
    "clean_clique4": [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
    "self_loops": [(1, 1), (1, 2), (2, 3), (1, 3), (5, 5)],
    "duplicate_edges": [(1, 2), (1, 2), (2, 3), (3, 2), (1, 3)],
    "reverse_contract_violation": [(2, 1), (3, 2), (3, 1)],
    "star_hub_no_triangles": [(1, k) for k in range(2, 40)],
    "two_cliques_plus_isolated_pair": [(1, 2), (1, 3), (2, 3),
                                       (10, 11), (10, 12), (11, 12), (20, 21)],
    "null_endpoints": [(1, 2), (None, 2), (1, None), (2, 3), (1, 3)],
    "empty": [],
}


for fix_name, rows in GRAPH_FIXTURES.items():
    def _mk(fix_name=fix_name, rows=rows):
        @case(f"graph_triangles_{fix_name}")
        def _(spark):
            got = _spark_triangle_total(spark, rows)
            want = _oracle_triangle_total(rows)
            assert got == want, f"spark {got} triangles vs oracle {want}"
    _mk()


# ---------------------------------------------------------------------------
# skew
# ---------------------------------------------------------------------------

def _assert_frames_equal(a, b, msg):
    def key(t):  # None-safe total order (NULL keys are a fixture here)
        return tuple((x is None, str(type(x)), str(x)) for x in t)

    ka = sorted(map(tuple, a.collect()), key=key)
    kb = sorted(map(tuple, b.collect()), key=key)
    assert ka == kb, f"{msg}: {ka[:5]} vs {kb[:5]} (lens {len(ka)}/{len(kb)})"


SKEW_FIXTURES = {
    "all_one_key": [("hot", float(i)) for i in range(500)],
    "one_hot_plus_tail": [("hot", float(i)) for i in range(300)]
    + [(f"k{i}", 1.0) for i in range(50)],
    "null_keys": [("a", 1.0), (None, 2.0), (None, 3.0), ("b", None)],
    "identical_rows": [("a", 1.0)] * 100,
    "single_row": [("z", 4.0)],
}


for fix_name, rows in SKEW_FIXTURES.items():
    def _mk(fix_name=fix_name, rows=rows):
        @case(f"skew_salted_agg_{fix_name}")
        def _(spark):
            from pyspark.sql import functions as F

            from duckdb_mpp_spark.operators.skew import salted_agg

            df = spark.createDataFrame(rows, "k string, v double")
            got = salted_agg(
                df, ["k"],
                [F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")],
                [F.sum("c").alias("n"), F.sum("s").alias("sv")],
                n_salts=8,
            )
            want = df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
            )
            _assert_frames_equal(got, want, "salted_agg != plain groupBy")

        @case(f"skew_salted_join_{fix_name}")
        def _(spark):
            from pyspark.sql import functions as F

            from duckdb_mpp_spark.operators.skew import salted_join

            left = spark.createDataFrame(rows, "k string, v double")
            right = (
                left.select("k").where(F.col("k").isNotNull()).distinct()
                .withColumn("klen", F.length("k"))
            )
            for how in ("inner", "left", "left_semi", "left_anti"):
                got = salted_join(left, right, on="k", n_salts=8, how=how)
                want = left.join(right, on="k", how=how)
                _assert_frames_equal(
                    got, want, f"salted_join({how}) != plain join"
                )
    _mk()


@case("skew_salted_join_empty_left")
def _(spark):
    from duckdb_mpp_spark.operators.skew import salted_join

    left = spark.createDataFrame([], "k string, v double")
    right = spark.createDataFrame([("a", 1)], "k string, klen int")
    assert salted_join(left, right, on="k", n_salts=4).count() == 0


if __name__ == "__main__":
    _h.main(app_name="hostile-mm-graph")
