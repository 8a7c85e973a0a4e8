"""Parquet source layer for the driver's synthetic TPC-H-ish tables.

Plain ``spark.read.parquet`` — Catalyst gives us column pruning and filter
pushdown into the scan for free (reference needed 400 LoC of SQL-string
generation for the same thing, ``src/function/mpp_table_scan.cpp``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_timestamp_cols(path: str, nanos_conf_set: bool = False) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — Spark has no native
    nanosecond timestamp; we read them as raw int64 and truncate to
    microseconds (identical to DuckDB's ns→us truncation, so oracle
    comparisons agree). Prefix match covers tz-aware variants
    (``timestamp[ns, tz=…]``) too — review r4: exact matching silently
    skipped those and the raw int64 read then leaked through untruncated."""
    try:
        import pyarrow.parquet as pq

        member_files = [path]  # concrete files to read physical types from
        try:
            schema = pq.read_schema(path)  # single-file parquet
        except Exception:
            import pyarrow.dataset as ds  # directory-style parquet

            dset = ds.dataset(path, format="parquet")
            schema = dset.schema
            member_files = list(getattr(dset, "files", None) or [])
    except Exception:
        # Detection impossible (pyarrow missing/broken). Only dangerous
        # when nanosAsLong is ALREADY set session-wide (streaming sets
        # it): ns columns would silently read as raw int64 BIGINTs
        # (review r6) — fail loudly then. Without the conf Spark itself
        # refuses ns files, so degrading to "no ns columns" is safe and
        # keeps ns-free tables loadable on pyarrow-less boxes (ADVICE r6).
        if nanos_conf_set:
            raise RuntimeError(
                "pyarrow is required to detect parquet TIMESTAMP(NANOS) "
                f"columns in {path} while nanosAsLong is active session-wide"
            )
        return []
    ns_names = [f.name for f in schema if str(f.type).startswith("timestamp[ns")]
    if not ns_names:
        return []
    # Arrow surfaces legacy INT96 timestamps as timestamp[ns] too, but
    # Spark reads INT96 NATIVELY — applying the raw-int64 truncation to an
    # INT96 file breaks the load outright (review r7; any Spark 3.x-written
    # file with the default outputTimestampType hits this). True
    # TIMESTAMP(NANOS) is physical INT64; keep only those. Checked across
    # EVERY member file, not a sample (ADVICE r7): a dataset mixing
    # INT96 and INT64 files has no single correct treatment — truncating
    # breaks the INT96 files, not truncating leaks raw int64 from the
    # INT64 files — so disagreement fails loudly. Footer-only reads, and
    # only when the unified Arrow schema already shows ns columns (rare),
    # so the all-files sweep stays metadata-cheap. Unknown physical types
    # stay treated as ns — the pre-r7 behavior, correct for the fixture
    # layouts.
    try:
        types_by_col: dict[str, set] = {n: set() for n in ns_names}
        for fp in member_files:
            md = pq.ParquetFile(fp).metadata
            for i in range(md.num_columns):
                col = md.schema.column(i)
                if col.name in types_by_col:
                    types_by_col[col.name].add(col.physical_type)
        keep = []
        for n in ns_names:
            types = types_by_col[n]
            if len(types) > 1:
                raise RuntimeError(
                    f"parquet dataset {path}: column {n!r} mixes physical "
                    f"timestamp encodings {sorted(types)} across files — "
                    "no uniform read treatment is correct (INT96 reads "
                    "natively, TIMESTAMP(NANOS) needs raw-int64 "
                    "truncation); rewrite the dataset with one encoding"
                )
            if types == {"INT96"}:
                continue  # uniformly INT96: Spark reads it natively
            # uniformly INT64, absent from every footer (schema-evolved
            # files), or unknown: treat as ns, the pre-r7 behavior
            keep.append(n)
        return keep
    except RuntimeError:
        raise
    except Exception:
        return ns_names


# Inferred (schema, ns_cols) per parquet path. Reading parquet WITHOUT a
# schema runs a one-task footer-inference Spark job on EVERY
# DataFrameReader call (observed r9: every gate paid one ~60-90 ms job per
# run just to re-learn a schema that never changes); passing the cached
# schema skips the job, and caching ns_cols beside it skips the per-call
# pyarrow footer sweep too. Keyed by (path, mtime_ns) — NOT path alone
# (review r9): a stale schema does not fail loudly — Spark silently
# prunes columns a rewrite added and null-fills columns it dropped — so
# staleness must be detected, not assumed away; a rewrite replaces the
# file (or the directory's files), which bumps the mtime and misses the
# cache. ``clear_schema_cache`` remains the belt-and-braces escape hatch.
_READ_SCHEMA_CACHE: dict[tuple[str, int], tuple[object, list[str]]] = {}


def clear_schema_cache() -> None:
    _READ_SCHEMA_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, adapting ns timestamps (see
    ``_nanos_timestamp_cols``).

    Session-conf note (review r4): ``nanosAsLong`` is set session-wide and
    deliberately NOT restored — the returned DataFrame is lazy and must
    still read under it at collect time. The conf only affects parquet
    files that contain ns-timestamp columns, which Spark otherwise refuses
    to read at all; code that reads such files DIRECTLY (not via
    load_table) in the same session gets raw int64 columns and must do its
    own ÷1000 truncation, exactly like ``streaming.stream_events`` does."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        key = (path, os.stat(path).st_mtime_ns)
    except OSError:
        key = (path, -1)
    cached = _READ_SCHEMA_CACHE.get(key)
    if cached is None:
        nanos_set = (
            str(
                spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            ).lower()
            == "true"
        )
        ns_cols = _nanos_timestamp_cols(path, nanos_conf_set=nanos_set)
        if ns_cols:
            # must be active BEFORE schema inference too — without it
            # Spark refuses the file outright
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        _READ_SCHEMA_CACHE[key] = (df.schema, ns_cols)
    else:
        schema, ns_cols = cached
        if ns_cols:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(schema).parquet(path)
    for c in ns_cols:
        # integer division keeps full precision (ns epoch overflows double)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the fixture tables as temp views for the SQL surface.

    Idempotent per (session, sf_dir): re-registering is cheap (metadata only)
    but we skip it when the same sf_dir is already registered to keep query
    helpers O(1).
    """
    key = "duckdb_mpp_spark.registered_sf_dir"
    local = spark.conf.get(key, None) if _conf_readable(spark) else None
    if local == sf_dir and names is None:
        return
    for name in names or TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    try:
        if names is None:
            spark.conf.set(key, sf_dir)
        elif local is not None and local != sf_dir:
            # a names-scoped registration from a DIFFERENT dir leaves the
            # session in a mixed state; the cache key must not let a later
            # full registration for the old dir early-return past it
            # (review r6 — silent cross-dir joins otherwise)
            spark.conf.unset(key)
    except Exception:
        pass


def _conf_readable(spark: SparkSession) -> bool:
    try:
        spark.conf.get("spark.sql.session.timeZone")
        return True
    except Exception:
        return False
