"""Plan-shape regressions for the r10 perf findings (BENCH_SF1 30×).

The collapse trap: ``coalesce(1)`` propagates back to the nearest shuffle
boundary, and a groupBy that REUSES a window's hash partitioning leaves NO
boundary between the corpus-sized window sort and the result — so the
whole window stage ran as one task (events_sessionization: 3.2 s vs 1.2 s
at 30×). The fix is a real repartition(1) barrier (``ordered_small(...,
exchange=True)``): window parallel, one task sorts only the result rows.
These tests pin the plan shape so a refactor cannot silently reintroduce
the collapse.
"""

import pytest

from duckdb_mpp_spark.queries import run_spark_query

SF = "/root/testdata/sf0.001"


def _plan(spark, gate):
    df = run_spark_query(gate, spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("gate", ["events_sessionization", "events_user_features"])
def test_window_gates_keep_parallel_window_behind_barrier(spark, gate):
    plan = _plan(spark, gate)
    # the result sort is a REAL single-partition exchange, not a coalesce
    assert "Exchange SinglePartition" in plan, plan[:2000]
    assert "Coalesce 1" not in plan
    # the corpus window still runs behind its own hash exchange (parallel)
    assert "hashpartitioning(user_id" in plan


def test_ordered_small_exchange_flag(spark):
    from pyspark.sql import functions as F

    from duckdb_mpp_spark.queries import ordered_small

    df = spark.range(100).withColumn("k", F.col("id") % 7)
    base = df.groupBy("k").count()
    plain = ordered_small(base, "k")
    barrier = ordered_small(base, "k", exchange=True)
    pp = plain._jdf.queryExecution().executedPlan().toString()
    bp = barrier._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce 1" in pp and "Exchange SinglePartition" not in pp
    assert "Exchange SinglePartition" in bp and "Coalesce 1" not in bp
    # value-identity between the two shapes
    assert [tuple(r) for r in plain.collect()] == [tuple(r) for r in barrier.collect()]


def test_repetition_stats_bigrams_never_shuffle(spark):
    """r10: repetition_stats repartitions token arrays on doc_id ONCE;
    id-partitioning satisfies the (id, bigram) clustering of both
    aggregations, so the exploded bigram strings never reach an exchange
    (0.89 -> 0.47 s at sf0.1). Pin the invariant directly: no exchange is
    keyed on the bigram column (the old shape's first exchange was
    hashpartitioning(doc_id, bg)), every hash exchange is id-only, and
    the result sort is the barrier form."""
    import re

    plan = _plan(spark, "text_repetition_stats")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert " bg#" not in m.group(1) and not m.group(1).startswith("bg#"), m.group(0)
    assert "Exchange SinglePartition" in plan
    assert "Coalesce 1" not in plan
