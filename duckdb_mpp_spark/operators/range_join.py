"""Binned range (interval) join — the scale path for joins whose only
condition is a range containment, where Spark's planner would otherwise pick
BroadcastNestedLoopJoin (fine for a small build side, quadratic if not).

Technique (standard in time-series engines): quantize time into fixed bins;
a point joins its single bin, an interval explodes to every bin it overlaps;
the join becomes an equi-join on bin id followed by the exact residual
predicate. Each point matches a given interval in exactly one bin (the
point's own), so no dedup pass is needed. Shuffle volume: points × 1 +
intervals × (avg interval length / bin width) — tunable; at 100 TB pick the
bin so the exploded interval side stays small relative to the point side,
and both sides hash-partition by bin id with natural time locality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 7 * 24 * 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end``, via bin equi-join + residual filter."""

    def bin_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bin_seconds).cast("long")

    p = points.withColumn("__bin", bin_of(F.col(point_ts)))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                bin_of(F.col(start_col)),
                # end is exclusive: a point at exactly `end` must not match,
                # but the bin containing `end - 1s` must be covered
                bin_of(F.col(end_col) - F.expr("INTERVAL '1' SECOND")),
            )
        ),
    )
    joined = p.join(i, "__bin", how).where(
        (F.col(start_col) <= F.col(point_ts)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__bin")
