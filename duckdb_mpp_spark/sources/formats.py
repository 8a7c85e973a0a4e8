"""File-format sources/sinks beyond parquet: CSV, JSON-lines, ORC, and
hive-partitioned parquet.

The reference's base catalog keeps DuckDB's file readers available next to
MPP tables (SURVEY §2.B scans; `/root/reference/src/mpp_service.cpp:30-33`
delegates arbitrary SQL, including read_csv/read_parquet, to the local
engine). Here the equivalent is the Spark DataSource API, which adds what
the reference lacks: distributed splits, schema enforcement, predicate
pushdown (parquet/orc), and partition pruning for hive layouts.

Scale notes:
- CSV/JSON are line-splittable → parallel reads at any size, but carry no
  statistics and no pushdown: land raw text once, convert to
  parquet/bucketed tables for anything queried twice.
- ``partitionBy`` directory layouts turn equality/range filters on the
  partition column into directory pruning (visible as ``PartitionFilters``
  in the scan node) — the same class of win as the engine's bucket pruning,
  but for low-cardinality columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Formats with a writer AND a reader in every stock Spark distribution.
FORMATS = ("parquet", "csv", "json", "orc")

_CSV_OPTS = {
    # explicit, lossless defaults: header for self-description, ISO
    # timestamps with microseconds so round-trips are exact. NULLs are
    # written as \N (the classic MySQL/Hive convention) so they stay
    # distinguishable from empty strings; external readers must be told
    # (DuckDB: read_csv(..., nullstr='\N') — its default is '').
    # Known CSV-format limitation (review r6): a STRING whose literal
    # value equals the null token (the two characters backslash-N) is
    # written unquoted and reads back as NULL — CSV has no universally
    # readable way to escape the null sentinel (Spark's reader compares
    # nullValue after unquoting, so quoteAll would not help). Adversarial
    # text corpora must land as parquet (the default), not CSV.
    "header": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "nullValue": "\\N",
}

_JSON_OPTS = {
    # Spark's JSON writer default truncates timestamps to milliseconds and
    # its reader never infers timestamps (inferTimestamp=false) — without
    # these, write→read via json silently degrades timestamp columns to
    # ms-truncated STRINGS (review r4); with them the round-trip is exact.
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "inferTimestamp": "true",
}


def write_df(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Write ``df`` at ``path``. ``mode`` follows DataFrameWriter semantics
    (``overwrite`` default matches COPY TO; pass ``append``/``error`` for
    incremental landings — review r6: the save mode was previously
    hard-coded and un-overridable through **options)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    opts = dict(_CSV_OPTS) if fmt == "csv" else dict(_JSON_OPTS) if fmt == "json" else {}
    opts.update(options)
    w = df.write.mode(mode).format(fmt).options(**opts)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_df(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` in ``fmt``. For schemaless text formats (csv/json) pass
    ``schema`` — inference costs an extra full pass over 100 TB and can
    drift between runs; production reads are always schema-pinned.

    CSV/JSON defaults are the ROUND-TRIP conventions of :func:`write_df`
    (header=true, ``\\N`` nulls, µs timestamps). For an EXTERNAL file that
    follows different conventions, override them explicitly (e.g.
    ``header="false"``, ``nullValue=""``) — the defaults are only correct
    for files this module wrote (review r6)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    opts = dict(_CSV_OPTS) if fmt == "csv" else dict(_JSON_OPTS) if fmt == "json" else {}
    opts.update(options)
    r = spark.read.format(fmt).options(**opts)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        r = r.option("inferSchema", "true")
    return r.load(path)
