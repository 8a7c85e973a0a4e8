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
    ``start <= ts < end``, via bin equi-join + residual filter.

    Inner-only: the residual containment predicate is applied AFTER the
    bin equi-join, which is only sound for inner joins — under an outer
    join the post-filter would delete the null-extended unmatched rows
    (degenerating to inner), and the exploded interval side would emit
    one null-match per covered bin (review r4). Callers needing outer
    semantics should anti-join the matched keys back instead.
    """
    if how != "inner":
        raise ValueError(
            "interval_bin_join supports how='inner' only (the bin explode + "
            f"residual post-filter breaks outer semantics); got {how!r}"
        )
    if bin_seconds < 1:
        # non-ANSI division by zero is NULL, so bin_seconds=0 binned every
        # row NULL and the equi-join silently returned an EMPTY frame
        # (review r9; a caller deriving bin width from data can truncate
        # to 0 for sub-second intervals). Negative widths invert the bin
        # arithmetic just as silently.
        raise ValueError(f"bin_seconds must be >= 1, got {bin_seconds}")
    for df, name in ((points, "points"), (intervals, "intervals")):
        if "__bin" in df.columns:
            raise ValueError(
                f"interval_bin_join: {name} already has a '__bin' column — "
                "rename it (reserved as the internal bin key)"
            )

    def bin_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bin_seconds).cast("long")

    p = points.withColumn("__bin", bin_of(F.col(point_ts)))
    i = intervals.where(
        # Empty/inverted intervals (end <= start: corrupted rows, epoch-0
        # placeholders) contain no point by definition — and F.sequence
        # would DESCEND for them, fanning one bad row across every bin in
        # between (review r6). NOTE: a wide-but-valid interval still
        # explodes to (end-start)/bin_seconds rows — size bin_seconds so
        # the longest real interval covers a bounded bin count; an
        # open-ended sentinel end (9999-12-31) belongs capped upstream.
        F.col(end_col) > F.col(start_col)
    ).withColumn(
        "__bin",
        F.explode(
            # Cover every bin from bin(start) through bin(end) INCLUSIVE.
            # unix_timestamp truncates sub-second fractions, so the previous
            # `bin(end - 1s)` upper bound put an end like 00:00:00.500 in
            # the prior bin and silently missed points in the boundary bin
            # (review r4, empirically confirmed). Covering bin(end) can
            # only add one extra bin per interval; the exact residual
            # containment filter below discards any false pairs (a point at
            # exactly `end` still never matches — end stays exclusive).
            F.sequence(bin_of(F.col(start_col)), bin_of(F.col(end_col)))
        ),
    )
    # frame-qualified residual refs: bare F.col(start_col) is AMBIGUOUS
    # when points and intervals share a column name (review r6)
    joined = p.join(i, "__bin", how).where(
        (i[start_col] <= p[point_ts]) & (p[point_ts] < i[end_col])
    )
    return joined.drop("__bin")
