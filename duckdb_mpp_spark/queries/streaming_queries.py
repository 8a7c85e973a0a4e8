"""Streaming gate queries — results computed by the Structured Streaming
runtime, verified against batch SQL oracles (stream/batch parity)."""

from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.streaming import streaming_hourly_agg

register(
    "streaming_hourly_agg",
    Query(
        spark=streaming_hourly_agg,
        oracle="""
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
        """,
    ),
)
