"""duckdb_mpp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the duckdb-mpp reference (a Citus-style
distributed-DuckDB extension; see SURVEY.md).

Architecture (Spark-first, not a port):

- The reference's *distribution layer* (gRPC scatter-gather, shuffle queues,
  coordinator catalog wrappers — reference ``src/mpp_service.cpp``,
  ``src/shuffle/``) maps to Spark's own shuffle/scheduler/catalog: zero code.
- What we build is the *distributed-table semantics layer*: hash-bucketed
  tables (``CREATE TABLE ... PARTITION BY (c) WITH BUCKETS n``), bucket-pruned
  scans with ``Shards: k/n`` explain parity, bucket-wise copy-on-write DML
  with summed row counts, and the queryable ``__mpp_system`` metadata —
  plus the full inherited SQL surface (joins/aggs/windows/set-ops) which is
  native Spark SQL, verified differentially against DuckDB.
- Beyond the reference: LLM-training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal columns) built on the same
  DataFrame-first discipline.
"""

from duckdb_mpp_spark.session import get_spark
from duckdb_mpp_spark.mpp import MppSession

__all__ = ["get_spark", "MppSession"]
__version__ = "0.1.0"
