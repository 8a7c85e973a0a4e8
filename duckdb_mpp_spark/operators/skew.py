"""Skew-handling utilities: salted aggregation and salted join.

AQE's skew-join splitting (on in this engine's sessions) handles most skew
at runtime by splitting oversized shuffle partitions. These explicit
operators cover the two cases AQE cannot:

- **Salted two-phase aggregation**: a groupBy where one key holds a huge
  share of rows bottlenecks the single reducer that owns it even after AQE
  splits the partition (the final merge for that key is still one task).
  Salting splits the key into ``n_salts`` sub-keys for the partial phase,
  then merges the partials — the heavy key's work spreads over n_salts
  reducers, and the final merge handles n_salts rows, not the raw stream.
- **Salted broadcast-free join**: a shuffle join where some left keys are
  hot. The left side salts each row into one of ``n_salts`` sub-keys; the
  (smaller) right side replicates each row to all sub-keys. Works at any
  right-side size that tolerates n_salts× replication — the standard recipe
  when the hot side is too big to broadcast.

Only associative+commutative aggregates may be salted (sum/count/min/max);
the helpers take the partial and final expressions explicitly so the
algebra is visible at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_no_salt_col(df: DataFrame, caller: str) -> None:
    """A user column named ``__salt`` would be silently overwritten by
    ``withColumn`` and then dropped from the result — reject loudly, the
    same contract as the storage layer's reserved names (review r6)."""
    if "__salt" in df.columns:
        raise ValueError(
            f"{caller}: input already has a '__salt' column — rename it "
            "(reserved as the internal salting key)"
        )


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: xxhash64 over every hashable column.

    Deliberately NOT ``monotonically_increasing_id()``/``rand()`` — those are
    nondeterministic under task retry and speculative execution, so a retried
    map task would re-salt rows differently from the shuffle files reducers
    already fetched, silently double/under-counting. Hashing row content is
    retry-stable: the same input row always lands on the same sub-key.
    Identical duplicate rows share a salt, which only costs balance (bounded
    by the duplicate multiplicity), never correctness. Columns CONTAINING a
    map anywhere in their type (top-level, array element, struct field — the
    check is recursive, review r9: Spark's xxhash64 rejects any map-bearing
    type, so the old top-level-only filter crashed salting over an
    ``array<map>`` or ``struct<…, map>`` column) are excluded; a frame of
    ONLY map-bearing columns is rejected loudly — it cannot carry an
    equi-join/group key anyway.

    ``n_salts`` is validated ≥ 1 (review r9): under the non-ANSI session
    ``pmod(x, 0)`` is NULL, so n_salts=0 salted every left row NULL while
    the right side exploded ``sequence(0, -1)`` — an inner salted_join
    silently returned ZERO rows instead of erroring.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")

    def has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(has_map(f.dataType) for f in dt.fields)
        return False

    cols = [f.name for f in df.schema.fields if not has_map(f.dataType)]
    if not cols:
        raise ValueError(
            "cannot salt a frame whose columns all contain map types"
        )
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` merge the partials
    per keys. E.g. partial ``F.count('*').alias('c')`` merges with
    ``F.sum('c').alias('n')``; partial sum merges with sum of sums.
    """
    _check_no_salt_col(df, "salted_agg")
    salted = df.withColumn("__salt", _salt_col(df, n_salts))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot left keys: left rows pick a content-derived stable
    salt, right rows replicate to every salt, the join runs on (key, salt).

    Only left-preserving join types are legal: the right side is replicated
    ``n_salts``×, so right/full outer (and right semi/anti) would emit each
    unmatched right row once per salt — duplicated wrong results.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}; "
            f"got {how!r} (right rows are replicated {n_salts}x, so right/full "
            "outer would duplicate unmatched right rows)"
        )
    _check_no_salt_col(left, "salted_join")
    _check_no_salt_col(right, "salted_join")
    l_salted = left.withColumn("__salt", _salt_col(left, n_salts))
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")


# ---------------------------------------------------------------------------
# gate query + DuckDB oracle
# ---------------------------------------------------------------------------

def _register() -> None:
    from duckdb_mpp_spark.queries import Query, register
    from duckdb_mpp_spark.sources import load_table

    def skew_fn(spark, sf_dir):
        """Both skew operators composed end-to-end, verified by value
        identity with the un-salted formulation (the whole point of
        salting is that it changes the SHUFFLE, never the answer): events
        salted-join a small per-type dim (right side replicated per salt),
        then a salted two-phase aggregation computes per-type counts and
        exact quantized value sums. The oracle is the plain GROUP BY."""
        # NULL keys never match an inner join while GROUP BY would emit a
        # NULL group — filter explicitly on BOTH sides of the gate so the
        # comparison stays structural, not fixture-dependent (review r4)
        ev = (
            load_table(spark, sf_dir, "events")
            .select("event_type", "value")
            .where(F.col("event_type").isNotNull())
        )
        dim = (
            ev.select("event_type")
            .distinct()
            .withColumn("type_len", F.length("event_type").cast("int"))
        )
        joined = salted_join(ev, dim, on="event_type", n_salts=8)
        return salted_agg(
            joined,
            ["event_type", "type_len"],
            [
                F.count(F.lit(1)).alias("c"),
                F.sum(F.floor(F.col("value") * 256).cast("long")).alias("s"),
            ],
            [
                F.sum("c").alias("n_events"),
                (F.sum("s").cast("double") / 256).alias("total_value_q"),
            ],
            n_salts=8,
        )
        # ordered_small (r13): per-event-type summary is result-sized
        from duckdb_mpp_spark.queries import ordered_small

        return ordered_small(out, "event_type", exchange=True)

    register(
        "skew_salted_agg_join",
        Query(
            spark=skew_fn,
            oracle="""
            SELECT event_type,
                   CAST(length(event_type) AS INT) AS type_len,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(floor(value * 256) AS BIGINT)) AS DOUBLE) / 256
                     AS total_value_q
            FROM events
            WHERE event_type IS NOT NULL
            GROUP BY event_type
            ORDER BY event_type
            """,
        ),
    )


_register()
