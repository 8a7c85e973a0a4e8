"""Event-stream analytics (batch forms; the streaming runtime versions live
in ``duckdb_mpp_spark.streaming`` and are verified by stream-vs-batch
equivalence tests). Windowed time aggregation, sessionization, JSON
extraction, and an AS-OF join — an operator Spark lacks natively
(implemented as union + last-ignore-nulls window, one shuffle+sort, fully
distributed) and DuckDB has natively (the oracle uses ``ASOF JOIN``).
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_mpp_spark.queries import Query, ordered_small, register
from duckdb_mpp_spark.sources import load_table

# Tumbling-window aggregation (batch form of the streaming windowed agg).
register(
    "events_hourly_agg",
    Query(
        """
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        -- NULLS LAST: hour_start/event_type are nullable group keys and
        -- the engines' default asc NULL placement differs (review r7)
        ORDER BY 1 NULLS LAST, 2 NULLS LAST
        """
    ),
)

# Sessionization: 30-minute inactivity gap via lag + running sum.
_SESSIONIZATION_CORE = """
        SELECT user_id,
               CAST(SUM(new_session) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WHERE ts IS NOT NULL  -- engines disagree on NULL window order (review r4)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ) AS flagged
        GROUP BY user_id
"""


def _sessionization_fn(spark, sf_dir):
    # callable (r9, the q13 recipe): the result is one row per user —
    # O(source) — so the final total order is size-switched: under the
    # single-task budget it skips orderBy's range-sampling job (the gate
    # wall was ~98% scheduling constant), past it the parallel range sort
    # returns. Same inner SQL both engines.
    #
    # exchange=True (r10, BENCH_SF1 30× finding): the per-user groupBy
    # REUSES the window's hash partitioning — no shuffle boundary between
    # the corpus-sized window sort and the result — so a bare coalesce(1)
    # serialized the ENTIRE window stage into one task (3.2 s at 30× vs
    # 1.2 s with the barrier; value-identical). The repartition(1) barrier
    # keeps the window parallel at every scale and single-tasks only the
    # per-user result rows.
    from duckdb_mpp_spark.queries import ordered_result
    from duckdb_mpp_spark.sources import load_table

    return ordered_result(
        spark.sql(_SESSIONIZATION_CORE),
        load_table(spark, sf_dir, "events"),
        "user_id",
        exchange=True,
    )


register(
    "events_sessionization",
    Query(
        spark=_sessionization_fn,
        oracle=_SESSIONIZATION_CORE + "        ORDER BY user_id",
    ),
)

# Funnel-ish conditional aggregation over event types.
register(
    "events_funnel",
    Query(
        """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        FROM events
        GROUP BY user_id
        HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
        ORDER BY user_id
        """
    ),
)

# JSON property extraction (semi-structured column surface).
register(
    "events_json_props",
    Query(
        spark="""
        -- floor(double) parse: tolerant of fractional/junk/malformed values
        -- on BOTH engines (review r4: strict CAST rounds in DuckDB, errors
        -- in ANSI Spark, and DuckDB dies outright on malformed JSON).
        -- Outer TRY_CAST AS BIGINT (review r7): a k >= 2^31 made the old
        -- strict CAST AS INT error in DuckDB while non-ANSI Spark silently
        -- wrapped it into a garbage bucket; out-of-range now groups as the
        -- NULL bucket on both engines, same as malformed values.
        -- NULLS LAST: the NULL bucket is a designed output and the default
        -- sort placement differs (Spark asc NULLS FIRST, DuckDB LAST).
        SELECT TRY_CAST(FLOOR(TRY_CAST(get_json_object(props, '$.k') AS DOUBLE)) AS BIGINT)
                 % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        oracle="""
        SELECT TRY_CAST(FLOOR(TRY_CAST(
                 CASE WHEN json_valid(props)
                      THEN json_extract_string(props, '$.k') END
               AS DOUBLE)) AS BIGINT) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
    ),
)


def _asof_spark(spark, sf_dir):
    """AS-OF join, Spark-first: union both sides on a common (key, time)
    axis, sort within key, and carry the most recent order forward with
    ``last(..., ignorenulls)``. One shuffle + one sort — survives any scale
    (contrast: a per-key ``merge_asof`` in pandas would need the whole key
    group in memory; this streams).

    Orders are pre-deduped to max orderkey per (custkey, date) so ties are
    deterministic in both engines.
    """
    events = load_table(spark, sf_dir, "events")
    # NULL order dates can never satisfy the ASOF predicate (ts >= NULL is
    # NULL in SQL) — but unioned into the window they'd sort FIRST (Spark
    # asc NULLS FIRST) and back-fill their orderkey into every event
    # (review r7); drop them before the union like the oracle's ASOF does
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull())
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    o_side = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e_side = events.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("event_id"),
    )
    unioned = o_side.unionByName(e_side)
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "kind", F.coalesce("o_orderkey", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("last_order", F.last("o_orderkey", ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.col("last_order").alias("o_orderkey"),
        )
    )
    # size-switched result order (r10): one row per event, so under the
    # single-task budget the barrier sort skips orderBy's range-sampling
    # pass (0.73 → 0.59 s at sf0.1, value-identical); exchange=True is
    # REQUIRED — the filter/projection above rides the window's uid
    # partitioning, so a coalesce(1) would serialize the corpus-sized
    # window stage (see ordered_small). Past the budget the parallel
    # range sort returns.
    from duckdb_mpp_spark.queries import ordered_result

    return ordered_result(matched, events, "event_id", exchange=True)


register(
    "asof_join_events_orders",
    Query(
        spark=_asof_spark,
        oracle="""
        -- CASE pins the spec for NULL event times (review r7): ts >= date
        -- is never true for NULL ts in SQL, but DuckDB's ASOF sort-merge
        -- treats a NULL probe as +inf and matches the LATEST order — an
        -- implementation artifact, overridden here so both engines agree
        -- that a timeless event matches nothing. NULL o_orderdate rows
        -- also never match (the Spark side drops them pre-union).
        SELECT e.event_id, e.user_id,
               CASE WHEN e.ts IS NULL THEN NULL ELSE o.o_orderkey END
                 AS o_orderkey
        FROM events e
        ASOF LEFT JOIN (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
          FROM orders GROUP BY o_custkey, o_orderdate
          -- defensive mirror of the Spark-side filter: DuckDB's ASOF
          -- already never picks a NULL right key, but that is the same
          -- class of artifact the CASE above pins down
          HAVING o_orderdate IS NOT NULL
        ) o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
        """,
    ),
)


def _range_join_spark(spark, sf_dir):
    """Keyless interval join via bin explosion (operators/range_join.py):
    events counted inside the top-5 revenue months' promo windows. The
    windows deliberately do not align to the 7-day bins, so the residual
    predicate does real work."""
    from duckdb_mpp_spark.operators.range_join import interval_bin_join

    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    promo = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("win_start"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
        .orderBy(F.col("rev").desc(), F.col("win_start"))
        .limit(5)
        .select(
            "win_start",
            (F.col("win_start") + F.expr("INTERVAL '1' MONTH")).alias("win_end"),
        )
    )
    joined = interval_bin_join(events, promo, "ts", "win_start", "win_end")
    return (
        joined.groupBy("win_start")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("_tv"),
        )
        .select(
            F.col("win_start").cast("timestamp").alias("win_start"),
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
        .orderBy("win_start")
    )


register(
    "range_join_binned",
    Query(
        spark=_range_join_spark,
        oracle="""
        WITH promo AS (
          SELECT win_start, win_start + INTERVAL '1' MONTH AS win_end
          FROM (
            SELECT date_trunc('month', o_orderdate) AS win_start,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
            FROM orders GROUP BY 1
            ORDER BY rev DESC, win_start LIMIT 5
          ) t
        )
        SELECT p.win_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events e JOIN promo p
          ON p.win_start <= e.ts AND e.ts < p.win_end
        GROUP BY p.win_start
        ORDER BY p.win_start
        """,
    ),
)

# Per-user z-score outlier detection from exact quantized power sums (the
# anomaly-detection shape: two scans, one small join, no window state).
register(
    "events_zscore_outliers",
    Query(
        """
        WITH q AS (
          -- NULL values out up front (review r7): COUNT(*) over rows the
          -- NULL-skipping SUM(v)/SUM(v*v) never saw gave a wrong mean and
          -- variance, and counted never-scored rows into n_scored
          SELECT user_id, CAST(floor(value * 256) AS DOUBLE) / 256 AS v
          FROM events WHERE value IS NOT NULL
        ),
        st AS (
          SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n, SUM(v) AS s, SUM(v * v) AS s2
          FROM q GROUP BY user_id
        ),
        z AS (
          SELECT q.user_id, (v - s / n) / sqrt((s2 - s * s / n) / (n - 1)) AS z
          FROM q JOIN st ON q.user_id = st.user_id
          WHERE n >= 2 AND (s2 - s * s / n) > 0
        )
        SELECT user_id,
               COUNT(*) AS n_scored,
               CAST(SUM(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM z GROUP BY user_id
        ORDER BY user_id
        """
    ),
)


# Cohort retention: users grouped by first-activity week, counted in each
# subsequent week they return. ONE pass over events: the per-user distinct
# week set is a collect_set aggregate (bounded by the calendar — weeks per
# user ≤ #weeks in the data, never data-sized, so no hub risk), the cohort
# week is its array_min (date_trunc is monotone: min(week of ts) ≡ week of
# min ts), and exploding the set re-derives the user-week activity rows
# without the old second scan + DISTINCT shuffle + user_id join (r6 — the
# two shuffles keyed differently, (user) vs (user, week), so no exchange
# reuse was possible; this shape is 1 scan + 2 exchanges). The result is
# tiny (#cohorts × #weeks). Day difference is engine-split only in name:
# Spark datediff(end, start) ≡ DuckDB date_diff('day', start, end).
def _cohort_retention_fn(spark, sf_dir):
    # callable, not SQL text (r8): the result is #cohorts × #weeks —
    # calendar-bounded at ANY scale — so the final total order comes from
    # ordered_small (single-partition sort) instead of orderBy's
    # range-sampling job; one less job on a gate whose wall was ~99%
    # scheduling constant (26× DuckDB at sub-second absolute).
    return ordered_small(
        spark.sql(
            """
            WITH per_user AS (
              SELECT user_id,
                     collect_set(CAST(date_trunc('week', ts) AS DATE)) AS weeks
              -- ts IS NOT NULL in BOTH dialects: collect_set drops NULLs,
              -- the oracle's DISTINCT would keep a NULL week (review r6).
              -- user_id IS NOT NULL in BOTH dialects (hostile-fixture
              -- sweep r9): this shape GROUPs the NULL user into a real
              -- cohort row, while the oracle's JOIN ... USING (user_id)
              -- silently drops it (NULL never equals NULL) — divergent
              -- counts on any corpus with unattributable events. An
              -- unidentified user has no trackable retention; exclude it
              -- explicitly on both sides.
              FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
              GROUP BY user_id
            )
            SELECT array_min(weeks) AS cohort_week,
                   CAST(floor(datediff(act_week, array_min(weeks)) / 7) AS INT) AS weeks_since,
                   COUNT(*) AS n_users
            FROM per_user LATERAL VIEW explode(weeks) AS act_week
            GROUP BY 1, 2
            """
        ),
        "cohort_week",
        "weeks_since",
    )


register(
    "events_cohort_retention",
    Query(
        spark=_cohort_retention_fn,
        oracle="""
            WITH firsts AS (
              -- user_id IS NOT NULL mirrors the Spark side (the JOIN below
              -- would drop the NULL user anyway; the filter makes the
              -- exclusion explicit instead of an accident of NULL-join
              -- semantics — hostile-fixture sweep r9)
              SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
              FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
              GROUP BY user_id
            ),
            activity AS (
              SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
              FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
            )
            SELECT f.cohort_week,
                   CAST(floor(date_diff('day', f.cohort_week, a.act_week) / 7) AS INT) AS weeks_since,
                   COUNT(*) AS n_users
            FROM firsts f JOIN activity a USING (user_id)
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
    ),
)


# Fixed-bin value histogram per event type — the monitoring primitive for
# value-distribution drift. Bin id is floor(value/step) clamped to the last
# bucket: pure integer-exact expressions, one map-side-combined groupBy;
# at any scale the shuffle carries #types x #bins rows.
register(
    "events_value_histogram",
    Query(
        spark="""
            SELECT event_type,
                   CAST(least(floor(value / 25.0), 19) AS INT) AS bin,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS bin_value
            FROM events
            GROUP BY 1, 2
            ORDER BY 1 NULLS LAST, 2 NULLS LAST
        """,
    ),
)


# Sketch surface: HyperLogLog++ distinct counts and quantile-summary
# estimates. At 100 TB these replace exact DISTINCT/percentile shuffles with
# constant-size mergeable state per group (HLL registers / quantile
# summaries) — merge is max/merge-based, so results are partitioning- and
# order-independent (deterministic). Raw estimates have no cross-engine
# oracle (DuckDB's sketches differ bit-wise), so the GATE emits what IS
# exactly oracle-expressible: the exact distinct count per group plus
# per-sketch accuracy verdicts as booleans — Spark checks each estimate
# against the exact answer computed in the same query, DuckDB states the
# expected verdicts as literal TRUE. Both engines' sketches are
# deterministic functions of the data, so the verdicts are stable rows,
# not flaky assertions. tests/test_sketches.py keeps the tighter
# error-bound contracts.
def _sketch_stats_fn(spark, sf_dir):
    # Two single-pass aggregates instead of mixing COUNT(DISTINCT) with
    # percentile aggregates in one SELECT (r13): the mixed form plans an
    # Expand (row stream multiplied per distinct-aggregate group) under
    # every percentile's sort buffer — measured 4.94 s vs 0.79 s at sf0.1,
    # value-identical (the output's approx sketches only feed generous
    # boolean bounds; exact_users is exact in both shapes, and HLL merge
    # is bitwise-commutative so users_ok is plan-independent).
    ev = load_table(spark, sf_dir, "events")
    a1 = ev.groupBy("event_type").agg(
        F.expr("approx_count_distinct(user_id) AS apx_u"),
        F.expr("CAST(approx_percentile(value, 0.5) AS DOUBLE) AS apx50"),
        F.expr("CAST(approx_percentile(value, 0.99) AS DOUBLE) AS apx99"),
        F.expr("percentile(value, 0.40) AS p40"),
        F.expr("percentile(value, 0.60) AS p60"),
        F.expr("percentile(value, 0.95) AS p95"),
        F.expr("CAST(MAX(value) AS DOUBLE) AS mx"),
    )
    a2 = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.expr("count(user_id) AS exact_users"))
    )
    out = a1.join(a2, "event_type").selectExpr(
        "event_type",
        "exact_users",
        "abs(apx_u - exact_users)"
        " <= greatest(CAST(exact_users * 0.05 AS BIGINT), 10) AS users_ok",
        "apx50 BETWEEN p40 AND p60 AS p50_ok",
        "apx99 BETWEEN p95 AND mx AS p99_ok",
    )
    return ordered_small(out, "event_type", exchange=True)


register(
    "sketch_approx_stats",
    Query(
        spark=_sketch_stats_fn,
        oracle="""
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   TRUE AS users_ok,
                   TRUE AS p50_ok,
                   TRUE AS p99_ok
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
    ),
)


# Regular-grid resampling with forward fill — the time-series alignment
# primitive (metrics dashboards, feature matrices at fixed cadence). The
# 6-hour grid is generated per event type (sequence + explode — rows =
# #types x #grid-points, never data-sized), each observation is bucketed to
# its grid cell by one map-side-combined groupBy, and gaps forward-fill with
# last_value(IGNORE NULLS) over a per-type window ordered by the grid —
# partitioned by type, so the window shuffle is keyed and bounded. The
# decimal cell aggregate keeps the filled values engine-exact.
def _resample_ffill_fn(spark, sf_dir):
    # callable (r8): both join sides and the result are #types ×
    # #grid-slots — CALENDAR-bounded at any scale — so the broadcast hint
    # on the aggregated cells side is size-safe forever (it skips AQE's
    # materialize-then-decide round-trip), and the total order comes from
    # ordered_small instead of orderBy's range-sampling job.
    return ordered_small(
        spark.sql(
            """
            WITH grid AS (
              SELECT t.event_type, g.slot
              FROM (SELECT DISTINCT event_type FROM events) t,
                   LATERAL (
                     SELECT explode(sequence(
                       TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-30 18:00:00',
                       INTERVAL 6 HOURS)) AS slot
                   ) g
            ),
            cells AS (
              SELECT event_type,
                     to_timestamp(floor(unix_timestamp(ts) / 21600) * 21600) AS slot,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS cell_value
              FROM events
              GROUP BY 1, 2
            )
            SELECT /*+ BROADCAST(c) */ g.event_type, g.slot,
                   COALESCE(c.n, 0) AS n,
                   last_value(c.cell_value, true) OVER (
                     PARTITION BY g.event_type ORDER BY g.slot
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS ffill_value
            FROM grid g LEFT JOIN cells c
              ON c.event_type = g.event_type AND c.slot = g.slot
            """
        ),
        "event_type",
        "slot",
    )


register(
    "events_resample_ffill",
    Query(
        spark=_resample_ffill_fn,
        oracle="""
            WITH grid AS (
              SELECT t.event_type, g.slot
              FROM (SELECT DISTINCT event_type FROM events) t,
                   (
                     SELECT unnest(generate_series(
                       TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-30 18:00:00',
                       INTERVAL 6 HOUR)) AS slot
                   ) g
            ),
            cells AS (
              SELECT event_type,
                     TIMESTAMP '1970-01-01 00:00:00'
                       + CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                         * INTERVAL 1 SECOND AS slot,  -- TZ-free (review r4)
                     COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS cell_value
              FROM events
              GROUP BY 1, 2
            )
            SELECT g.event_type, g.slot,
                   COALESCE(c.n, 0) AS n,
                   last_value(c.cell_value IGNORE NULLS) OVER (
                     PARTITION BY g.event_type ORDER BY g.slot
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS ffill_value
            FROM grid g LEFT JOIN cells c
              ON c.event_type = g.event_type AND c.slot = g.slot
            ORDER BY 1, 2
        """,
    ),
)


# Per-user behavioral features — the feature-store primitive for training
# tables: activity counts/value totals, exact inter-event cadence (integer
# epoch seconds; the division is one double op), and the latest event type
# picked by a deterministic (ts, event_id) ordering. One groupBy + one
# keyed window, both partitioned by user — at any scale the shuffles carry
# per-user rows, and the two branches join on the same user key.
_USER_FEATURES_CORE = """
            WITH agg AS (
              SELECT user_id,
                     COUNT(*) AS n_events,
                     COUNT(DISTINCT event_type) AS n_types,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
                     CASE WHEN COUNT(ts) > 1
                          THEN round((unix_micros(CAST(MAX(ts) AS TIMESTAMP))
                                      - unix_micros(CAST(MIN(ts) AS TIMESTAMP)))
                                     / 1000000.0 / CAST(COUNT(ts) - 1 AS DOUBLE), 6)
                     END AS avg_gap_sec
              FROM events GROUP BY user_id
            ),
            latest AS (
              SELECT user_id, event_type AS last_type
              FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (
                         PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
              ) WHERE rn = 1
            )
            SELECT a.user_id, a.n_events, a.n_types, a.total_value,
                   a.avg_gap_sec, l.last_type
            FROM agg a JOIN latest l USING (user_id)
"""


def _user_features_fn(spark, sf_dir):
    # callable (r9): one row per user — size-switched final order, same
    # rationale as _sessionization_fn above. exchange=True (r10): the
    # "latest event per user" window branch shares the per-user hash
    # partitioning with the join/agg that consumes it, so a bare
    # coalesce(1) serialized that corpus-sized window into one task
    # (measured 1.99 → 1.60 s at 30×, value-identical) — same finding as
    # _sessionization_fn.
    from duckdb_mpp_spark.queries import ordered_result
    from duckdb_mpp_spark.sources import load_table

    return ordered_result(
        spark.sql(_USER_FEATURES_CORE),
        load_table(spark, sf_dir, "events"),
        "user_id",
        exchange=True,
    )


register(
    "events_user_features",
    Query(
        spark=_user_features_fn,
        oracle="""
            WITH agg AS (
              SELECT user_id,
                     COUNT(*) AS n_events,
                     COUNT(DISTINCT event_type) AS n_types,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
                     CASE WHEN COUNT(ts) > 1
                          THEN round((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
                                     / 1000000.0 / CAST(COUNT(ts) - 1 AS DOUBLE), 6)
                     END AS avg_gap_sec
              FROM events GROUP BY user_id
            ),
            latest AS (
              SELECT user_id, event_type AS last_type
              FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (
                         PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
              ) WHERE rn = 1
            )
            SELECT a.user_id, a.n_events, a.n_types, a.total_value,
                   a.avg_gap_sec, l.last_type
            FROM agg a JOIN latest l USING (user_id)
            ORDER BY a.user_id
        """,
    ),
)


# Linear-interpolation resampling — the other standard gap-fill (sensor /
# metric alignment where a step function is wrong). Same grid + cells shape
# as the ffill variant; empty cells take
#   prev + (next - prev) * (slot - prev_slot) / (next_slot - prev_slot)
# via IGNORE NULLS windows in both directions. Cross-engine exactness: cell
# values are exact decimal sums and the interpolation expression is written
# with the IDENTICAL IEEE-754 double operation order in both dialects, so
# results are bit-identical without rounding. Cells before the first known
# value stay NULL; cells after the last known value forward-fill.
_INTERP_CORE = """
    SELECT event_type, slot, n,
           CASE WHEN n > 0 THEN cell_value
                WHEN prev_v IS NULL THEN NULL
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v) * (
                  (CAST({EPOCH_SLOT} AS DOUBLE) - CAST(prev_s AS DOUBLE))
                  / (CAST(next_s AS DOUBLE) - CAST(prev_s AS DOUBLE)))
           END AS interp_value
    FROM (
      SELECT g.event_type, g.slot, COALESCE(c.n, 0) AS n, c.cell_value,
             {LAST_V} OVER (
               PARTITION BY g.event_type ORDER BY g.slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
             {LAST_S} OVER (
               PARTITION BY g.event_type ORDER BY g.slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_s,
             {FIRST_V} OVER (
               PARTITION BY g.event_type ORDER BY g.slot
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
             {FIRST_S} OVER (
               PARTITION BY g.event_type ORDER BY g.slot
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_s
      FROM grid g LEFT JOIN cells c
        ON c.event_type = g.event_type AND c.slot = g.slot
    ) w
    ORDER BY 1, 2
"""

register(
    "events_resample_interp",
    Query(
        spark="""
            WITH grid AS (
              SELECT t.event_type, g.slot
              FROM (SELECT DISTINCT event_type FROM events) t,
                   LATERAL (
                     SELECT explode(sequence(
                       TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-30 18:00:00',
                       INTERVAL 6 HOURS)) AS slot
                   ) g
            ),
            cells AS (
              SELECT event_type,
                     to_timestamp(floor(unix_timestamp(ts) / 21600) * 21600) AS slot,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS cell_value
              FROM events
              GROUP BY 1, 2
            )
        """
        + _INTERP_CORE.format(
            EPOCH_SLOT="unix_timestamp(slot)",
            LAST_V="last_value(c.cell_value, true)",
            LAST_S="last_value(CASE WHEN c.cell_value IS NOT NULL THEN unix_timestamp(g.slot) END, true)",
            FIRST_V="first_value(c.cell_value, true)",
            FIRST_S="first_value(CASE WHEN c.cell_value IS NOT NULL THEN unix_timestamp(g.slot) END, true)",
        ),
        oracle="""
            WITH grid AS (
              SELECT t.event_type, g.slot
              FROM (SELECT DISTINCT event_type FROM events) t,
                   (
                     SELECT unnest(generate_series(
                       TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-30 18:00:00',
                       INTERVAL 6 HOUR)) AS slot
                   ) g
            ),
            cells AS (
              SELECT event_type,
                     TIMESTAMP '1970-01-01 00:00:00'
                       + CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                         * INTERVAL 1 SECOND AS slot,  -- TZ-free (review r4)
                     COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS cell_value
              FROM events
              GROUP BY 1, 2
            )
        """
        + _INTERP_CORE.format(
            EPOCH_SLOT="epoch(slot)",
            LAST_V="last_value(c.cell_value IGNORE NULLS)",
            LAST_S="last_value(CASE WHEN c.cell_value IS NOT NULL THEN epoch(g.slot) END IGNORE NULLS)",
            FIRST_V="first_value(c.cell_value IGNORE NULLS)",
            FIRST_S="first_value(CASE WHEN c.cell_value IS NOT NULL THEN epoch(g.slot) END IGNORE NULLS)",
        ),
    ),
)


# Robust per-user anomaly detection: median / MAD (median absolute
# deviation) instead of mean / stddev — the outlier detector that is itself
# immune to the outliers it hunts (a single huge value shifts a z-score
# baseline but not a median). Exactness: percentile_disc returns an actual
# data element in both engines (same total order over exact doubles), the
# deviations |x - med| are exact IEEE subtractions, and the 3·1.4826·MAD
# threshold is the same two-multiply expression in both dialects — no
# cross-engine drift anywhere. Two keyed aggregations + one keyed join;
# everything shuffles on user_id only.
register(
    "events_anomaly_mad",
    Query(
        spark="""
            WITH med AS (
              SELECT user_id,
                     percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med_value,
                     COUNT(*) AS n_events
              FROM events GROUP BY user_id
            ),
            dev AS (
              SELECT e.user_id,
                     percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med_value)) AS mad
              FROM events e JOIN med m USING (user_id)
              GROUP BY e.user_id
            )
            SELECT m.user_id, m.n_events, m.med_value, d.mad,
                   CAST(SUM(CASE WHEN abs(e.value - m.med_value)
                                      > 3 * 1.4826 * d.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM events e
            JOIN med m USING (user_id)
            JOIN dev d ON d.user_id = e.user_id
            GROUP BY m.user_id, m.n_events, m.med_value, d.mad
            ORDER BY m.user_id
        """,
    ),
)

register(
    # Behavioral transition mining (r9): top event-type bigrams across all
    # user timelines — the "what do users do next" pattern table a
    # recommendation/abuse pipeline derives first. Shared-dialect SQL: the
    # LAG window partitions per user (bounded partitions — the
    # sessionization scale argument), the transition count map-side
    # combines, and the top-k is a tiny ordered frame with the transition
    # string as deterministic tiebreak. NULL handling pinned in-dialect:
    # NULL ts rows are excluded (an unordered event has no defined
    # neighbor — and Spark/DuckDB would otherwise ORDER them to opposite
    # ends of the timeline); a NULL event_type propagates through || to a
    # NULL transition, dropped identically by both engines. NULL-user rows
    # are excluded too (ADVICE r9): PARTITION BY lumps every unattributable
    # event into ONE pseudo-timeline, fabricating transitions between
    # unrelated events — the same "an unidentified user has no trackable
    # behavior" convention the cohort gate pinned in r9. event_id IS NOT
    # NULL guards the tiebreak: a NULL event_id sorts to opposite ends of
    # equal-ts runs in Spark vs DuckDB and would diverge the dialects.
    "events_top_transitions",
    Query(
        """
        WITH seq AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS prev
          FROM events
          WHERE ts IS NOT NULL
            AND user_id IS NOT NULL
            AND event_id IS NOT NULL
        ),
        pairs AS (SELECT prev || '>' || event_type AS transition FROM seq)
        SELECT transition, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE transition IS NOT NULL
        GROUP BY transition
        ORDER BY n DESC, transition
        LIMIT 25
        """
    ),
)
