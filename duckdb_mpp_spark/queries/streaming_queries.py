"""Streaming gate queries — results computed by the Structured Streaming
runtime, verified against batch SQL oracles (stream/batch parity)."""

from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.streaming import streaming_hourly_agg

register(
    "streaming_hourly_agg",
    Query(
        spark=streaming_hourly_agg,
        oracle="""
        -- ts IS NOT NULL: the streaming runtime drops NULL event times at
        -- window assignment; pinned explicitly in both dialects (r10
        -- hostile-streaming sweep). VARCHAR round-trip on the final double:
        -- DuckDB's direct DECIMAL(38,6)->DOUBLE goes through hugeint and is
        -- ~1 ulp off above 2^53/1e6 (a 1e12 value exposed it), while its
        -- string->double parse is correctly rounded, matching Spark's
        -- BigDecimal conversion exactly.
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
                 AS total_value
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 1, 2
        ORDER BY 1, 2
        """,
    ),
)

from duckdb_mpp_spark.streaming import (  # noqa: E402
    streaming_dedup_distinct,
    streaming_session_windows,
    streaming_static_join_agg,
)

register(
    "streaming_session_windows",
    Query(
        spark=streaming_session_windows,
        oracle="""
        -- ts/user_id IS NOT NULL: shared with session_windows() — a NULL ts
        -- has no timeline position (the lag-window would glue it onto the
        -- user's last session while the streaming runtime drops it) and a
        -- NULL user has no trackable behavior (r10 hostile-streaming sweep)
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
                 ) AS sid
          FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start
        """,
    ),
)

register(
    "streaming_dedup_distinct",
    Query(
        spark=streaming_dedup_distinct,
        oracle="""
        SELECT event_type, COUNT(*) AS n_pairs
        FROM (SELECT DISTINCT user_id, event_type FROM events) AS d
        GROUP BY event_type
        ORDER BY event_type
        """,
    ),
)

register(
    "streaming_static_join_agg",
    Query(
        spark=streaming_static_join_agg,
        oracle="""
        -- VARCHAR round-trip: see streaming_hourly_agg (DuckDB's direct
        -- DECIMAL(38,6)->DOUBLE is lossy above 2^53/1e6; string parse is
        -- correctly rounded, matching Spark)
        SELECT c_mktsegment, COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
                 AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
    ),
)

from duckdb_mpp_spark.streaming import user_running_totals  # noqa: E402

register(
    "streaming_stateful_running_totals",
    Query(
        spark=user_running_totals,
        oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 256) AS BIGINT)) AS DOUBLE) / 256 AS total_value_q
        FROM events
        GROUP BY user_id
        ORDER BY user_id
        """,
    ),
)

from duckdb_mpp_spark.streaming import streaming_stream_stream_join  # noqa: E402

register(
    "streaming_stream_stream_join",
    Query(
        spark=streaming_stream_stream_join,
        oracle="""
        SELECT c.user_id,
               COUNT(*) AS n_pairs,
               CAST(SUM(CAST(floor(p.value * 256) AS BIGINT)) AS DOUBLE) / 256
                 AS purchase_value_q
        FROM events c JOIN events p
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1' HOUR
        GROUP BY c.user_id
        ORDER BY c.user_id
        """,
    ),
)

from duckdb_mpp_spark.streaming import (  # noqa: E402
    streaming_ingest_distributed,
    streaming_upsert_distributed,
)

register(
    "streaming_mpp_upsert",
    Query(
        spark=streaming_upsert_distributed,
        oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 256) AS BIGINT)) AS DOUBLE) / 256
                 AS total_value_q
        FROM events
        WHERE user_id IS NOT NULL  -- NOT NULL rollup key, both dialects (r6)
        GROUP BY user_id
        ORDER BY user_id
        """,
    ),
)

register(
    "streaming_mpp_ingest",
    Query(
        spark=streaming_ingest_distributed,
        oracle="""
        -- VARCHAR round-trip: see streaming_hourly_agg (DuckDB's direct
        -- DECIMAL(38,6)->DOUBLE is lossy above 2^53/1e6; string parse is
        -- correctly rounded, matching Spark)
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
                 AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """,
    ),
)


from duckdb_mpp_spark.operators.dedup import _DUCK_BANDS  # noqa: E402
from duckdb_mpp_spark.streaming import streaming_incremental_dedup  # noqa: E402

# Same verdict semantics as the batch `dedup_incremental` gate (one
# delivery = one micro-batch), so the oracle is the same banded-join SQL;
# what the streaming gate adds is the runtime: foreachBatch, the persisted
# parquet index, and the verdict sink.
register(
    "streaming_incremental_dedup",
    Query(
        spark=streaming_incremental_dedup,
        oracle=_DUCK_BANDS
        + """,
        nb AS (SELECT * FROM bands WHERE doc_id % 7 = 0),
        ib AS (SELECT * FROM bands WHERE doc_id % 7 <> 0),
        vs_index AS (
          SELECT n.doc_id, MIN(i.doc_id) AS dup_index
          FROM nb n JOIN ib i ON n.band = i.band AND n.band_key = i.band_key
          GROUP BY 1
        ),
        vs_batch AS (
          SELECT a.doc_id, MIN(b.doc_id) AS dup_batch
          FROM nb a JOIN nb b
            ON a.band = b.band AND a.band_key = b.band_key AND b.doc_id < a.doc_id
          GROUP BY 1
        )
        SELECT d.doc_id,
               CASE WHEN c.dup_index IS NOT NULL THEN 'dup_index'
                    WHEN t.dup_batch IS NOT NULL THEN 'dup_batch'
                    ELSE 'new' END AS verdict,
               COALESCE(c.dup_index, t.dup_batch) AS dup_of
        FROM (SELECT DISTINCT doc_id FROM nb) d
        LEFT JOIN vs_index c USING (doc_id)
        LEFT JOIN vs_batch t USING (doc_id)
        ORDER BY d.doc_id
        """,
    ),
)
