"""Unit edges for the r9 additions: n-gram novelty scoring and vocabulary
coverage — the classes the NULL-free unique-id fixtures cannot exercise
(NULL/short text retention, all-duplicate corpora, exact coverage
boundaries)."""

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.corpus import novelty_scores
from duckdb_mpp_spark.operators.text import vocab_coverage


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestNoveltyScores:
    def test_null_and_short_docs_retained_with_null_novelty(self, spark):
        # 3-word shingles: a 2-token doc emits one (short) gram; a NULL or
        # empty doc emits none but must still appear in the output
        out = {
            r.doc_id: r
            for r in novelty_scores(
                _docs(
                    spark,
                    [(1, "alpha beta gamma delta"), (2, None), (3, "   ")],
                )
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[1].n_grams == 2 and out[1].novelty == 1.0
        for d in (2, 3):
            assert out[d].n_grams == 0 and out[d].n_novel == 0
            assert out[d].novelty is None

    def test_exact_duplicate_scores_zero(self, spark):
        # doc 2 repeats doc 1 verbatim: every gram's first occurrence is
        # doc 1, so doc 1 scores 1.0 and doc 2 scores 0.0
        out = {
            r.doc_id: r
            for r in novelty_scores(
                _docs(
                    spark,
                    [(1, "a b c d e"), (2, "a b c d e")],
                )
            ).collect()
        }
        assert out[1].novelty == 1.0
        assert out[2].novelty == 0.0 and out[2].n_grams == 3

    def test_within_doc_repeats_count_once(self, spark):
        # "a b a b a b" yields grams {a b a, b a b} — distinct per doc
        out = novelty_scores(_docs(spark, [(1, "a b a b a b")])).collect()
        assert out[0].n_grams == 2 and out[0].n_novel == 2

    def test_partial_overlap_fraction(self, spark):
        # doc 2 shares a 3-gram prefix with doc 1 but adds new material
        out = {
            r.doc_id: r
            for r in novelty_scores(
                _docs(spark, [(1, "a b c"), (2, "a b c x y")])
            ).collect()
        }
        # doc 2 grams: "a b c", "b c x", "c x y" — first is doc 1's
        assert out[2].n_grams == 3 and out[2].n_novel == 2
        assert out[2].novelty == pytest.approx(2 / 3, abs=1e-6)


class TestVocabCoverage:
    def test_empty_corpus_zero_rows(self, spark):
        assert vocab_coverage(_docs(spark, [(1, None), (2, " ")])).count() == 0

    def test_single_token_vocab(self, spark):
        rows = sorted(
            vocab_coverage(_docs(spark, [(1, "x x x")])).collect(),
            key=lambda r: r.target,
        )
        assert [r.target for r in rows] == [0.5, 0.9, 0.99]
        assert all(r.vocab_size == 1 and r.covered_share == 1.0 for r in rows)

    def test_exact_boundary_is_integer_decided(self, spark):
        # mass: a=2, b=2 (total 4): the 50% target lands EXACTLY on the
        # first token's share — vocab_size must be 1 (>= at the boundary),
        # not 2 (a float-rounded > would give 2)
        rows = {
            r.target: r
            for r in vocab_coverage(_docs(spark, [(1, "a a b b")])).collect()
        }
        assert rows[0.5].vocab_size == 1 and rows[0.5].covered_share == 0.5
        assert rows[0.99].vocab_size == 2 and rows[0.99].covered_share == 1.0

    def test_heavy_tail_counts(self, spark):
        # a×6, b×2, c×1, d×1 (total 10): 50% → just a (6/10); 90% → a,b,c
        # (9/10 exactly — boundary again, inside the c=1 class that also
        # holds d); 99% → all 4
        rows = {
            r.target: r
            for r in vocab_coverage(
                _docs(spark, [(1, "a a a a a a b b c d")])
            ).collect()
        }
        assert rows[0.5].vocab_size == 1 and rows[0.5].covered_share == 0.6
        assert rows[0.9].vocab_size == 3 and rows[0.9].covered_share == 0.9
        assert rows[0.99].vocab_size == 4 and rows[0.99].covered_share == 1.0


class TestKeywordSearch:
    def test_conjunction_and_ranking(self, spark):
        from duckdb_mpp_spark.operators.text import keyword_search

        docs = _docs(
            spark,
            [
                (1, "table merge window table"),   # all 3, 4 occurrences
                (2, "table merge window"),          # all 3, 3 occurrences
                (3, "table merge table merge"),     # only 2 terms — excluded
                (4, None),
            ],
        )
        rows = keyword_search(docs, ("Table", "MERGE", "window")).collect()
        assert [(r.doc_id, r.n_occurrences) for r in rows] == [(1, 4), (2, 3)]

    def test_top_k_tiebreak_is_doc_id(self, spark):
        from duckdb_mpp_spark.operators.text import keyword_search

        docs = _docs(spark, [(i, "x y") for i in range(10, 0, -1)])
        rows = keyword_search(docs, ("x", "y"), top_k=3).collect()
        assert [r.doc_id for r in rows] == [1, 2, 3]

    def test_empty_terms_rejected(self, spark):
        from duckdb_mpp_spark.operators.text import keyword_search

        with pytest.raises(ValueError):
            keyword_search(_docs(spark, [(1, "a")]), ())


class TestTopTransitions:
    def test_null_ts_and_null_type_semantics(self, spark, shadow_views):
        # NULL-ts events join no sequence (excluded BEFORE the window, so
        # they don't sit between neighbors either); NULL event_type makes
        # its two adjacent transitions NULL via || propagation — dropped
        # identically in both dialects.
        import datetime

        import duckdb

        from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded

        _ensure_loaded()
        t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

        def ts(m):
            return t0 + datetime.timedelta(minutes=m)

        rows = [
            # user 1 timeline: view -> click -> [NULL type] -> buy
            (1, ts(1), 1, "view", 1.0, None),
            (2, ts(2), 1, "click", 1.0, None),
            (3, ts(3), 1, None, 1.0, None),
            (4, ts(4), 1, "buy", 1.0, None),
            # NULL ts: must not pair with anything
            (5, None, 1, "view", 1.0, None),
            # user 2: view -> click
            (6, ts(1), 2, "view", 1.0, None),
            (7, ts(2), 2, "click", 1.0, None),
        ]
        events = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        q = REGISTRY["events_top_transitions"]
        shadow_views("events", events)
        got = sorted(tuple(r) for r in spark.sql(q.spark).collect())
        con = duckdb.connect()
        con.register("events", events.toPandas())
        want = sorted(tuple(r) for r in con.execute(q.oracle_sql()).fetchall())
        assert got == want
        assert got == [("view>click", 2)]


class TestHostileSweepFixes:
    """r9 hostile-fixture sweep findings: NULL-user cohort divergence and
    the DECIMAL(18,6) overflow class (one extreme telemetry value aborted
    six events gates in BOTH engines — widened to DECIMAL(38,6))."""

    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    def test_cohort_excludes_null_user_in_both_dialects(self, spark, shadow_views):
        import datetime

        import duckdb

        from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded

        _ensure_loaded()
        t0 = datetime.datetime(2024, 1, 1)
        events = self._events(
            spark,
            [
                (1, t0, 1, "view", 1.0, None),
                (2, t0, 2, "view", 1.0, None),
                # unattributable event: the old Spark shape grouped the
                # NULL user into the cohort (n_users 3) while the oracle's
                # USING join dropped it (n_users 2)
                (3, t0, None, "view", 1.0, None),
            ],
        )
        q = REGISTRY["events_cohort_retention"]
        shadow_views("events", events)
        got = [tuple(r) for r in q.spark(spark, "/root/testdata/sf0.001").collect()]
        con = duckdb.connect()
        con.register("events", events.toPandas())
        want = [tuple(r) for r in con.execute(q.oracle_sql()).fetchall()]
        assert got == want
        assert got[0][2] == 2  # NULL user not a cohort member

    def test_extreme_value_does_not_abort_events_aggs(self, spark, shadow_views):
        import datetime

        import duckdb

        from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded

        _ensure_loaded()
        t0 = datetime.datetime(2024, 1, 1)
        # 1e12 overflowed DECIMAL(18,6) under ANSI — the whole gate errored
        # in both engines on one outlier row; DECIMAL(38,6) keeps the sum
        # exact (decimal addition, integer part < 1e32) and the gate alive
        events = self._events(
            spark,
            [
                (1, t0, 1, "view", 1.0e12, None),
                (2, t0, 1, "view", 2.5, None),
            ],
        )
        q = REGISTRY["events_hourly_agg"]
        shadow_views("events", events)
        got = [tuple(r) for r in spark.sql(q.spark).collect()]
        con = duckdb.connect()
        con.register("events", events.toPandas())
        want = [tuple(r) for r in con.execute(q.oracle_sql()).fetchall()]
        assert got == want
        assert got[0][-1] == 1.0e12 + 2.5

    def test_gauntlet_concat_null_propagates_in_both_dialects(self, spark, shadow_views):
        # Spark concat() NULL-propagates, DuckDB concat() SKIPS NULL args —
        # the gate now spells it || (NULL-propagating in both). A NULL
        # p_brand must yield a NULL brand_type in BOTH engines.
        import duckdb

        from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded

        _ensure_loaded()
        part = spark.createDataFrame(
            [(1, "widget", None, "STANDARD TIN", 5, 9.99)],
            "p_partkey bigint, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double",
        )
        q = REGISTRY["scalar_function_gauntlet"]
        shadow_views("part", part)
        got = spark.sql(q.spark).collect()[0]
        con = duckdb.connect()
        con.register("part", part.toPandas())
        want = con.execute(q.oracle_sql()).fetchall()[0]
        cols = [d[0] for d in con.description]
        assert got["brand_type"] is None
        assert want[cols.index("brand_type")] is None


class TestSplitLeakage:
    def test_identical_docs_across_splits_flagged(self, spark, tmp_path):
        # doc 1 hashes to 'train', doc 3 to 'test' (md5 16-bit split); both
        # carry identical text, so LSH must band them together and the
        # audit must surface exactly one train<->test candidate pair.
        import pandas as pd

        from duckdb_mpp_spark.operators.curation import split_leakage

        sf = str(tmp_path / "sf")
        import os

        os.makedirs(sf)
        text = "the quick brown fox jumps over the lazy dog again and again"
        pd.DataFrame(
            {
                "doc_id": pd.array([1, 3], dtype="int64"),
                "text": [text, text],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": pd.array([len(text)] * 2, dtype="int64"),
            }
        ).to_parquet(f"{sf}/documents.parquet")
        rows = {(r.split_lo, r.split_hi): r.n_pairs
                for r in split_leakage(spark, sf).collect()}
        assert rows == {("test", "train"): 1}

    def test_null_element_embedding_excluded_in_both_dialects(self, spark, tmp_path):
        # a NULL ELEMENT inside an embedding diverged the engines before
        # the r9 valid-embedding convention: DuckDB's SUM skipped the
        # component (silently ranking a 63-of-64-dim cosine) while Spark's
        # aggregate NULL-propagated the score. Both sides now exclude the
        # row entirely.
        import os

        import duckdb
        import numpy as np
        import pandas as pd

        from duckdb_mpp_spark.operators.similarity import (
            DIM,
            _emb_oracle,
            load_embeddings,
        )

        sf = str(tmp_path / "sf")
        os.makedirs(sf)
        rng = np.random.RandomState(3)
        rows = [(i, rng.randn(DIM).astype("float64").tolist(), i % 3)
                for i in range(6)]
        bad = rows[2][1][:]
        bad[10] = None
        rows[2] = (2, bad, 2)
        rows[3] = (3, None, 0)
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
            f"{sf}/embeddings.parquet"
        )
        kept = sorted(r.vec_id for r in load_embeddings(spark, sf).collect())
        assert kept == [0, 1, 4, 5]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
        )
        duck_kept = sorted(
            r[0]
            for r in con.execute(
                _emb_oracle("SELECT vec_id FROM embeddings")
            ).fetchall()
        )
        assert duck_kept == kept
