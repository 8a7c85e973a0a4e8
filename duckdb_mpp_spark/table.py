"""DistributedTable — hash-bucketed parquet table, the Spark-native analog of
the reference's distributed table (shards = bucket directories).

Layout: ``<warehouse>/<name>_<oid>/__bucket=<i>/part-*.parquet``

- Row routing: ``__bucket = pmod(hash(part_col), buckets)`` — the same single
  source of truth the reference derives from ``CAST(hash(col) % buckets AS
  USMALLINT)`` (``src/common/hash.cpp:39-48``). Spark's Murmur3 ``hash()`` ≠
  DuckDB's hash — internally consistent is all that correctness requires
  (SURVEY §2.A5); NULL hashes to a concrete bucket in both engines.
- Scan: plain ``spark.read.parquet`` + Catalyst. Projection/filter pushdown
  is built-in; bucket pruning is a derived constant-foldable predicate on the
  ``__bucket`` partition directory column (see ``pruning.py``), which Spark's
  file-index partition pruning turns into "read only k of n directories" —
  the reference's scatter-gather scan (``src/function/mpp_table_scan.cpp``)
  collapses to this.
- Insert: one shuffle on the bucket id, then a partitioned append — Spark's
  shuffle replaces the reference's ShuffleManager + gRPC pull loop
  (``src/execution/mpp_physical_insert.cpp``) wholesale. Row count comes from
  an ``Observation`` on the write job itself (no second pass over the data).

Commit protocol (manifest.py): data files are immutable and the versioned
snapshot manifest is the source of truth — every write stages new files,
then publishes a new snapshot via conditional-put; every read plans from the
current snapshot's explicit file list. No reader ever depends on a directory
listing or an atomic rename, which is what makes COW DML safe on an object
store and gives readers snapshot isolation against concurrent rewrites.

Scale notes (100 TB): a bucket is a *directory*, not a file — writes can
produce many files per bucket, so intra-bucket parallelism survives any data
size; pruning cost is O(#buckets) metadata; inserts are a single hash
shuffle, identical to what any Spark groupBy pays; scan planning is one
snapshot read (no filesystem listing).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from duckdb_mpp_spark import manifest as _manifest_mod
from duckdb_mpp_spark.catalog import MppCatalog, TableMeta
from duckdb_mpp_spark.pruning import (
    bucket_predicate_for_where,
    evaluate_bucket_ids,
)

BUCKET_COL = "__bucket"


def widen_bucket_pred(
    bucket_pred: str | None, dirty: list[int]
) -> str | None:
    """OR routing-dirty bucket ids into a derived ``__bucket`` predicate
    so misplaced rows (partition-column UPDATE history) always survive
    pruning. ``dirty`` must come from the SAME snapshot doc as the file
    list being planned (``snapshot_full``). No-op on clean tables."""
    if bucket_pred is None or not dirty:
        return bucket_pred
    ids = ", ".join(str(b) for b in dirty)
    return f"(({bucket_pred}) OR {BUCKET_COL} IN ({ids}))"

# commits touching more files than this run the footer-stats pass as a
# Spark job instead of a driver threadpool (see _ingest_staged)
_STATS_JOB_THRESHOLD = 64


def _max_partition_bytes(df: DataFrame) -> int:
    """``spark.sql.files.maxPartitionBytes`` as an int — the engine's own
    bytes-per-scan-task granularity, reused as bytes-per-write-task."""
    raw = str(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    ).strip().lower()
    m = re.match(r"^(\d+)\s*([kmgt]?)b?$", raw)
    if not m:
        return 128 << 20
    mult = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    return int(m.group(1)) * mult[m.group(2)]


# Catalyst's "statistics unavailable" sentinel region: RDD-backed plans
# (localCheckpoint) report spark.sql.defaultSizeInBytes = Long.MaxValue.
_STATS_UNKNOWN = 1 << 60


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimizedPlan sizeInBytes — a planner-side volume
    estimate that runs NO job (real for file scans and local relations;
    ``None`` when unavailable, e.g. RDD-backed plans after localCheckpoint
    — estimate BEFORE checkpointing). Deliberately not ``df.rdd
    .getNumPartitions()``: finalizing partitioning under AQE EXECUTES any
    upstream shuffle stages (review r6 — the same trap `_spread`'s
    docstring records), which would run a computed insert input twice."""
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return None
    return None if size >= _STATS_UNKNOWN else size


# The shared small-regime source budget (review r10: this bound was
# hand-inlined at five operator sites that document themselves as sharing
# one switch — tuning it in one place would silently de-synchronize the
# regimes). Below it a SOURCE is small enough that broadcast-fused /
# single-task plans beat the parallel shapes; past it every consumer's
# scale-safe branch is the default. Related but distinct:
# queries.SINGLE_SORT_BYTES governs the single-task RESULT sort (same
# value, different decision — kept separate deliberately).
SMALL_SOURCE_BYTES = 256 << 20


def is_small_source(df: DataFrame) -> bool:
    """True when ``df``'s planner-estimated size sits under the shared
    small-regime budget; False when past it OR unknown (unknown must take
    the scale-safe branch)."""
    b = plan_size_bytes(df)
    return b is not None and b < SMALL_SOURCE_BYTES


def check_unique_sides(
    table_name: str,
    col: str,
    modified: DataFrame,
    others: DataFrame,
    bucket_local: bool,
) -> None:
    """The ONE duplicate-detection primitive every UNIQUE/PRIMARY KEY
    enforcement path shares (insert via ``_enforce_unique``, COW
    UPDATE/upsert via ``dml._check_unique_sides`` — unified r8 so a
    semantics fix lands once). ``modified`` holds only the values the
    operation creates (inserted batch rows / re-derived SET values);
    ``others`` holds every other row's value that could share the group.
    A duplicate group raises only when a modified value participates: the
    operation is rejected for duplicates IT would create, never for an
    inconsistency already on disk (ADVICE r6/r7). ``bucket_local`` groups
    by (bucket, value) — the reference's per-shard index semantics
    (create_distributed_table.cpp:107); the value-GLOBAL partition-column
    constraint groups by value alone (review r6). Multiple NULLs allowed
    (SQL UNIQUE)."""
    group = [BUCKET_COL, col] if bucket_local else [col]
    side = (
        modified.select(*group)
        .where(F.col(col).isNotNull())
        .withColumn("_is_modified", F.lit(True))
        .unionByName(
            others.select(*group)
            .where(F.col(col).isNotNull())
            .withColumn("_is_modified", F.lit(False))
        )
    )
    dup = (
        side.groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("_is_modified").alias("has_modified"),
        )
        .where((F.col("n") > 1) & F.col("has_modified"))
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"Constraint Error: Duplicate key \"{col}: {dup[0][col]}\" "
            f'violates unique constraint in table "{table_name}"'
        )


def write_split_factor(df: DataFrame, n_groups: int, cap: int = 64) -> int:
    """Intra-bucket write fan-out for a bucket-routed write:
    ``plan bytes / (n_groups × maxPartitionBytes)``, floored at 1 and
    capped at ``cap`` files per bucket per write — one write task per
    scan-task-sized slice of each bucket. A batch smaller than one write
    task per bucket keeps the one-file-per-bucket layout (no small-file
    explosion on incremental writes); a 100 TB initial load or big-bucket
    COW rewrite fans each bucket out across the cluster instead of
    serializing on #buckets single-task writers (SCALING.md's named
    write-side wall). Unknown volume (checkpointed input) conservatively
    keeps split = 1 — layout-only, never a correctness risk."""
    return split_from_bytes(plan_size_bytes(df), n_groups, _max_partition_bytes(df), cap)


def split_from_bytes(
    size: int | None, n_groups: int, bytes_per_task: int, cap: int = 64
) -> int:
    if size is None:
        return 1
    return max(1, min(size // (max(n_groups, 1) * bytes_per_task), cap))


def spread_for_bucket_write(df: DataFrame, n_groups: int, split: int) -> DataFrame:
    """Repartition a bucket-routed frame for writing: ~``split`` tasks per
    bucket when ``split > 1``, else one per bucket.

    The split key is ``pmod(spark_partition_id(), split)`` — the one key
    that is simultaneously (a) CONTENT-independent, so a bucket full of
    identical rows — the norm in a dedup corpus — still spreads (ADVICE
    r5; a row-content hash cannot do this, and xxhash64 errors on MapType
    columns), and (b) RETRY-deterministic: a recomputed map task keeps its
    partition id and emits every row to the same reducer, so a partial
    map-stage recompute after a fetch failure can never lose or duplicate
    rows (review r6 — a monotonically_increasing_id key depends on row
    ORDER, which is not stable for shuffle-fed inputs; that is the exact
    hazard SPARK-23207 fixed for round-robin repartition). Granularity:
    each INPUT partition maps wholly to one split, which is exactly the
    fan-out wanted — a bucket's rows arriving from many input partitions
    spread over ~split writers; split never exceeds the input partition
    count for any volume-derived factor.

    Partition count is 2× the (bucket, split) group count: hash
    partitioning is approximate, and at small split factors two groups of
    one bucket colliding into one partition would silently halve that
    bucket's write parallelism — the oversubscription makes collisions
    rare (empty partitions schedule a no-op task and write nothing)."""
    if split > 1:
        return (
            df.withColumn(
                "__split", F.pmod(F.spark_partition_id(), F.lit(split))
            )
            .repartition(n_groups * split * 2, BUCKET_COL, "__split")
            .drop("__split")
        )
    return df.repartition(n_groups, BUCKET_COL)


class DistributedTable:
    def __init__(self, spark: SparkSession, catalog: MppCatalog, meta: TableMeta):
        self.spark = spark
        self.catalog = catalog
        self.meta = meta
        self.path = catalog.table_path(meta)
        # (kept, total) file counts of the most recent zone-map-skipped scan
        self.last_file_skip: tuple[int, int] | None = None

    # -- helpers ----------------------------------------------------------
    @property
    def _part_type_ddl(self) -> str:
        from duckdb_mpp_spark.catalog import resolve_field

        dtype = resolve_field(self.meta.schema, self.meta.partition_column)
        return dtype.simpleString()

    def _has_data(self) -> bool:
        return bool(self.snapshot_files())

    def _empty_df(self, with_bucket: bool = False) -> DataFrame:
        df = self.spark.createDataFrame([], self.meta.schema)
        if with_bucket:
            df = df.withColumn(BUCKET_COL, F.lit(None).cast("int"))
        return df

    # -- snapshot state ----------------------------------------------------
    def snapshot(self) -> tuple[int, dict[str, dict]]:
        """Current committed snapshot ``(version, {relpath: {rows,min,max}})``
        — the single source of truth for which data files are live and for
        their plan-time footer stats (manifest.py)."""
        return _manifest_mod.load(self.path, BUCKET_COL, self.meta.sort_column)

    def snapshot_full(
        self, version: int | None = None, pinned: bool = False
    ) -> tuple[int, dict[str, dict], list[int]]:
        """``(version, files, routing_dirty_bucket_ids)`` — all three from
        ONE version doc. Every read or DML that both plans from a file list
        and consults the dirty set must use this (not ``snapshot_files`` +
        ``routing_dirty_ids`` separately): a concurrent OPTIMIZE committing
        between two reads would pair old files with a cleared dirty set and
        silently un-widen pruning over still-misplaced rows (review r6).

        ``pinned`` marks an INTERNAL DML base pin (the scan must describe
        exactly the version the writer will commit against). Only that
        path takes the v0 re-resolve branch below: user time travel
        ``version=0`` without it falls through to ``load_version_full``'s
        clear "no snapshot v0" ValueError instead of a misleading
        ``CommitConflict`` — and on an empty table it must NOT silently
        serve an empty frame (review r7)."""
        if version == 0 and pinned:
            # v0 is never a committed doc — it is the empty table or the
            # read-only-storage bootstrap listing. DML pins its scans to
            # the base it will commit against; the old ``version=base or
            # None`` idiom silently un-pinned 0 to a head read (ADVICE
            # r6). Re-resolve: still v0 → serve it; head moved → the pin
            # is unsatisfiable, fail exactly like a lost commit race.
            v, files, dirty = _manifest_mod.load_full(
                self.path, BUCKET_COL, self.meta.sort_column
            )
            if v != 0:
                raise _manifest_mod.CommitConflict(
                    f"pinned base v0 of {self.meta.name!r} is no longer "
                    f"current (head is v{v})"
                )
            return 0, files, dirty
        if version is not None:
            files, dirty = _manifest_mod.load_version_full(self.path, version)
            return version, files, dirty
        return _manifest_mod.load_full(
            self.path, BUCKET_COL, self.meta.sort_column
        )

    def snapshot_files(self, version: int | None = None) -> dict[str, dict]:
        """Current snapshot's files, or — time travel — the files of an
        explicit committed ``version`` (readable until vacuumed past)."""
        if version is not None:
            return _manifest_mod.load_version(self.path, version)
        return self.snapshot()[1]

    def history(self) -> list[tuple[int, int, int]]:
        """Commit history: (version, n_files, n_rows) per retained
        snapshot, oldest first — metadata only."""
        out = []
        for v in _manifest_mod._list_versions(self.path):
            files = _manifest_mod.load_version(self.path, v)
            out.append((v, len(files), sum(e["rows"] for e in files.values())))
        return out

    def _read_files(self, rels) -> DataFrame | None:
        """Scan an explicit snapshot file list (``basePath`` keeps the
        ``__bucket`` partition column derivable from the paths). None when
        the list is empty — callers substitute their empty frame."""
        paths = [os.path.join(self.path, rel) for rel in sorted(rels)]
        if not paths:
            return None
        return self.spark.read.option("basePath", self.path).parquet(*paths)

    def _ingest_staged(self, tmp_path: str) -> dict[str, dict]:
        """Move a staged write's data files into the table's bucket layout
        under commit-unique names and return their manifest entries (one
        footer read per NEW file — commit-time, never scan-time). On an
        object store this per-file move is the standard rename-less
        committer pattern; the files stay invisible until the snapshot
        referencing them is published."""
        import uuid as _uuid
        from concurrent.futures import ThreadPoolExecutor

        tag = _uuid.uuid4().hex[:8]
        new_rels = []
        for rel in _manifest_mod._list_data_files(tmp_path, BUCKET_COL):
            bdir, fname = rel.split("/", 1)
            os.makedirs(os.path.join(self.path, bdir), exist_ok=True)
            new_rel = f"{bdir}/c{tag}-{fname}"
            os.replace(
                os.path.join(tmp_path, rel), os.path.join(self.path, new_rel)
            )
            new_rels.append(new_rel)
        # footer reads are I/O-bound and independent. Small commits read
        # them on the driver in a threadpool (pyarrow releases the GIL;
        # no job-scheduling overhead); past _STATS_JOB_THRESHOLD files the
        # pass runs as a Spark job over the file list (VERDICT r4 #3 —
        # Iceberg-style: a 100 TB initial load writes 10^5-10^6 files, and
        # a 16-way driver threadpool over object-store footers would be
        # the last driver-side O(#new files) step; the collected manifest
        # entries are O(#files) metadata the driver must hold anyway to
        # author the — sharded — manifest).
        if len(new_rels) > _STATS_JOB_THRESHOLD:
            table_path, sort_col = self.path, self.meta.sort_column
            n_slices = min(max(len(new_rels) // 8, 1), 256)
            pairs = (
                self.spark.sparkContext.parallelize(sorted(new_rels), n_slices)
                .map(
                    lambda r: (
                        r,
                        _manifest_mod.file_entry(
                            os.path.join(table_path, r), sort_col
                        ),
                    )
                )
                .collect()
            )
            return dict(pairs)
        with ThreadPoolExecutor(max_workers=16) as pool:
            stats = pool.map(
                lambda r: _manifest_mod.file_entry(
                    os.path.join(self.path, r), self.meta.sort_column
                ),
                new_rels,
            )
        return dict(zip(new_rels, stats))

    def _commit_append(
        self,
        new_entries: dict[str, dict],
        base: int,
        files: dict[str, dict],
        revalidate=None,
        stream_batch: tuple[str, int] | None = None,
    ) -> None:
        """Publish snapshot ∪ new files. ``(base, files)`` must be the
        snapshot read BEFORE the staged files were ingested. Appends
        commute, so a concurrent head move just means rebase-and-retry —
        bounded (ADVICE r3: an unbounded loop turns any head pathology
        into a liveness hang; ~100 retries is far beyond any real writer
        concurrency, so exhausting it means something is genuinely wrong).

        ``revalidate(rebased_files, rebased_dirty)``: called after every
        rebase, BEFORE the retry (review r4). Constraint checks made
        against the original base are stale once the head moves — two
        concurrent inserts of the same UNIQUE key would otherwise both
        pass their pre-commit check and both land. The rebased head's
        routing-dirty set rides along so the value-global partition-column
        check can look at misplaced rows a racing partition-column UPDATE
        just created (review r6). A raising revalidation aborts the
        commit; the already-ingested files stay unreferenced orphans
        (vacuumable), same as a crashed insert."""
        for _ in range(100):
            try:
                _manifest_mod.commit(
                    self.path, {**files, **new_entries}, base,
                    stream_batch=stream_batch,
                )
                return
            except _manifest_mod.CommitConflict:
                base, files, dirty = self.snapshot_full()
                if revalidate is not None:
                    revalidate(files, dirty)
        raise RuntimeError(
            f"append to {self.meta.name} lost 100 consecutive commit races; "
            "giving up (check for a stuck or runaway concurrent writer)"
        )

    def _commit_replace(
        self,
        bucket_ids: list[int],
        new_entries: dict[str, dict],
        base: int,
        base_files: dict[str, dict],
        dirty_buckets: list[int] | None = None,
        stream_batch: tuple[str, int] | None = None,
    ) -> None:
        """Publish a COW rewrite: the affected buckets' old files leave the
        snapshot, the staged files enter. The base version pins optimistic
        concurrency — if another writer committed since this rewrite read
        its input, the rewrite is stale and the conflict surfaces instead of
        silently losing the other write. Old files become unreferenced
        garbage but are NOT deleted here — in-flight readers planned on the
        previous snapshot still hold their file lists; physical deletion is
        deferred to an explicit ``vacuum()`` (SQL: ``VACUUM t``), which at
        scale runs behind a retention window.

        ``(base, base_files)`` must be the snapshot read BEFORE the staged
        files were ingested (a post-ingest load on an empty commit log
        would bootstrap-absorb them — same contract as _commit_append)."""
        rewritten = {f"{BUCKET_COL}={b}/" for b in bucket_ids}
        survivors = {
            rel: ent
            for rel, ent in base_files.items()
            if not any(rel.startswith(p) for p in rewritten)
        }
        _manifest_mod.commit(
            self.path, {**survivors, **new_entries}, base,
            dirty_buckets=dirty_buckets, stream_batch=stream_batch,
        )

    def vacuum(
        self, keep_commits: int = 1, orphan_grace_seconds: float = 300.0
    ) -> int:
        """Physically delete data files no current snapshot references and
        prune the commit log; returns files removed (see manifest.vacuum).
        The sort column rides along so a legacy-bootstrap commit keeps its
        zone-map stats populated (ADVICE r3). Unreferenced files younger
        than ``orphan_grace_seconds`` are kept — they may be an in-flight
        writer's ingested-but-uncommitted batch (review r5)."""
        return _manifest_mod.vacuum(
            self.path,
            BUCKET_COL,
            keep_commits,
            self.meta.sort_column,
            orphan_grace_seconds,
        )

    def applied_stream_batch(self, lineage: str) -> int | None:
        """Highest streaming micro-batch id committed for checkpoint
        ``lineage`` (manifest.applied_stream_batch) — the transactional
        replay check for idempotent foreachBatch sinks (r7)."""
        return _manifest_mod.applied_stream_batch(self.path, lineage)

    def route(self, df: DataFrame) -> DataFrame:
        """Append the bucket-id column (the reference's hash-partitioning
        expression, src/common/hash.cpp:39-48, re-expressed in Catalyst)."""
        n = self.meta.buckets
        return df.withColumn(
            BUCKET_COL,
            F.pmod(F.hash(F.col(self.meta.partition_column)), F.lit(n)).cast("int"),
        )

    # -- write path -------------------------------------------------------
    def _aligned_for_insert(self, df: DataFrame) -> DataFrame:
        """Column-order/type alignment + NOT NULL enforcement shared by both
        storage flavors (directory-per-bucket here, native bucketed in
        colocated.py)."""
        cols = [f.name for f in self.meta.schema.fields]
        aligned = df.select(
            *[
                F.col(c).cast(self.meta.schema[c].dataType).alias(c)
                for c in cols
            ]
        )
        # NOT NULL enforcement: the reference carries column constraints into
        # the shard DDL, where DuckDB rejects null inserts
        # (src/function/create_distributed_table.cpp:107-108). Enforced here
        # inline with raise_error — single pass, no validation pre-scan; a
        # failing write job never commits files (FileOutputCommitter), so the
        # table is untouched on rejection.
        for field in self.meta.schema.fields:
            if not field.nullable:
                msg = (
                    f"NOT NULL constraint failed: NULL value in column "
                    f'"{field.name}" of table "{self.meta.name}"'
                )
                aligned = aligned.withColumn(
                    field.name,
                    F.when(
                        F.col(field.name).isNull(),
                        F.raise_error(F.lit(msg)).cast(field.dataType),
                    ).otherwise(F.col(field.name)),
                )
        return aligned

    def _enforce_unique(
        self,
        routed: DataFrame,
        base: int | None = None,
        dirty: list[int] | None = None,
    ) -> None:
        """BUCKET-LOCAL uniqueness for declared UNIQUE/PRIMARY KEY columns —
        the reference's semantics exactly: constraints ride into shard DDL
        and DuckDB's per-shard index enforces them within each shard only
        (create_distributed_table.cpp:107), so a duplicate landing in a
        DIFFERENT bucket is accepted there and here. The one constraint
        users read as GLOBAL — the unique column IS the partition column,
        where routing makes same-value-same-bucket — is enforced by VALUE
        (bucket-ignorant), so it stays global even when a partition-column
        UPDATE has left misplaced rows in routing-dirty buckets (which the
        existing-side filter therefore includes; review r6). Multiple NULLs
        are allowed (SQL UNIQUE). Cost: one keyed shuffle per declared
        unique column over the batch plus the AFFECTED (+dirty) buckets
        only — opt-in, and the batch is already checkpointed so nothing is
        re-evaluated. A failing check raises before any file is staged, so
        the table is untouched."""
        ids = sorted(
            r[0]
            for r in routed.select(BUCKET_COL).distinct().collect()
            if r[0] is not None
        )
        if dirty is None:
            dirty = self.routing_dirty_ids()
        scan_ids = sorted(set(ids) | set(dirty))
        # pinned to the version the caller will commit against: anything
        # landing after it conflicts the commit and revalidates (review r6)
        existing = self.scan(keep_bucket=True, version=base, pinned=True)
        if len(scan_ids) < self.meta.buckets:
            existing = existing.where(F.col(BUCKET_COL).isin(scan_ids))
        for col in self.meta.unique_columns:
            # partition-column constraint: value-global (same value can sit
            # in different buckets only via routing-dirty misplacement, and
            # that's exactly the duplicate this must catch)
            check_unique_sides(
                self.meta.name,
                col,
                modified=routed,
                others=existing,
                bucket_local=col != self.meta.partition_column,
            )

    def insert(
        self, df: DataFrame, stream_batch: tuple[str, int] | None = None
    ) -> int:
        """Bucket-routed append; returns inserted row count (the reference's
        single BIGINT result row, src/execution/mpp_physical_insert.cpp:215-221).

        ``stream_batch=(lineage, batch_id)`` records the streaming
        micro-batch IN the snapshot commit (manifest.commit) so replay
        detection is transactional with the data — see
        ``applied_stream_batch``.

        Stage → ingest → commit: the write job lands in a temp dir, files
        move to commit-unique final names, then one snapshot publish makes
        them visible atomically. A failed/crashed insert leaves only
        unreferenced orphans (vacuumable), never a half-visible append.
        """
        import shutil as _shutil
        import uuid as _uuid

        routed = self.route(self._aligned_for_insert(df))
        # volume estimate BEFORE any checkpoint (an RDD-backed plan reports
        # Long.MaxValue stats — see write_split_factor)
        split = self._insert_split_factor(routed)
        # snapshot resolved ONCE, before the pre-write uniqueness check:
        # the check scans THIS version and the commit below pins it as
        # base, so any commit landing in between (e.g. a partition-column
        # UPDATE creating new routing-dirty misplacement) forces a
        # CommitConflict → rebase → revalidation against the NEW head's
        # dirty set, instead of slipping through unchecked (review r6)
        base, files, dirty = self.snapshot_full()
        if self.meta.unique_columns:
            # single evaluation: the uniqueness check and the write job
            # both read the materialized batch
            routed = routed.localCheckpoint(eager=True)
            self._enforce_unique(routed, base=base, dirty=dirty)
        # One shuffle so each bucket directory is written by few tasks (no
        # small-file explosion when every input task holds every bucket).
        # Routing on BUCKET_COL alone caps write parallelism at #affected
        # buckets (SCALING.md names it as the first write-side wall at
        # initial-load scale): when the batch is large relative to the
        # bucket count, add a content-independent intra-bucket split key so
        # each bucket spreads over ~input_parts/buckets write tasks. Small
        # batches (the common incremental case) keep one file per bucket —
        # no small-file explosion, and the bench insert path is unchanged.
        routed = spread_for_bucket_write(routed, self.meta.buckets, split)
        if self.meta.sort_column:
            # SORT BY clustering: rows inside each written file are ordered
            # on the sort column, so footer min/max become tight zone maps
            # (zonemap.py). Sort, not range-partition — no extra shuffle.
            routed = routed.sortWithinPartitions(BUCKET_COL, self.meta.sort_column)
        obs = Observation()
        routed = routed.observe(obs, F.count(F.lit(1)).alias("cnt"))
        tmp = self.path + f".stage-{_uuid.uuid4().hex[:8]}"
        # (base, files) read above, before the pre-check AND before ingest
        # — see _commit_append
        try:
            routed.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
            new_entries = self._ingest_staged(tmp)
            # An EMPTY insert still publishes a (no-op) snapshot: one
            # version per insert call is a load-bearing contract — time
            # travel / VERSION AS OF arithmetic counts operations, and the
            # r5 attempt to skip the commit broke exactly that. Pipelines
            # with frequently-empty batches guard with df.isEmpty() at the
            # source (the streaming sinks already do).
            revalidate = (
                (lambda bf, bd: self._revalidate_unique(new_entries, bf, bd))
                if self.meta.unique_columns
                else None
            )
            self._commit_append(
                new_entries, base, files, revalidate, stream_batch=stream_batch
            )
        finally:
            _shutil.rmtree(tmp, ignore_errors=True)
        try:
            return int(obs.get["cnt"])
        except Exception:
            # provably-empty input: AQE can plan CollectMetrics away and
            # leave the metrics row schema-less (review r4; same hazard as
            # dml._observed_matched). The committed footer row counts are
            # the exact answer and cost nothing.
            return sum(e["rows"] for e in new_entries.values())

    def _insert_split_factor(self, routed: DataFrame) -> int:
        return write_split_factor(routed, self.meta.buckets)

    def _revalidate_unique(
        self,
        new_entries: dict[str, dict],
        base_files: dict[str, dict],
        base_dirty: list[int] | None = None,
    ) -> None:
        """Re-check uniqueness of an ingested (not yet committed) batch
        against a REBASED snapshot — the commit-race closure of
        ``_enforce_unique`` (review r4). Bucket-local columns read only the
        new files plus the rebased snapshot's files in the affected
        buckets; the value-global partition-column constraint additionally
        reads the rebased head's routing-dirty buckets (a racing
        partition-column UPDATE may have just misplaced a colliding value
        there — review r6)."""
        affected = {rel.split("/", 1)[0] for rel in new_entries}
        paths = [os.path.join(self.path, rel) for rel in new_entries] + [
            os.path.join(self.path, rel)
            for rel in base_files
            if rel.split("/", 1)[0] in affected
        ]
        merged = self.spark.read.option("basePath", self.path).parquet(*paths)
        dirty_dirs = {f"{BUCKET_COL}={b}" for b in (base_dirty or [])} - affected
        dirty_paths = [
            os.path.join(self.path, rel)
            for rel in base_files
            if rel.split("/", 1)[0] in dirty_dirs
        ]
        for col in self.meta.unique_columns:
            group = [col] if col == self.meta.partition_column else [BUCKET_COL, col]
            side = merged.select(BUCKET_COL, col)
            if group == [col] and dirty_paths:
                side = side.unionByName(
                    self.spark.read.option("basePath", self.path)
                    .parquet(*dirty_paths)
                    .select(BUCKET_COL, col)
                )
            dup = (
                side.where(F.col(col).isNotNull())
                .groupBy(*group)
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"Constraint Error: Duplicate key \"{col}: {dup[0][col]}\" "
                    f'violates unique constraint in table "{self.meta.name}"'
                )

    # -- read path --------------------------------------------------------
    def scan(
        self,
        where: str | None = None,
        columns: list[str] | None = None,
        aliases: set[str] | None = None,
        keep_bucket: bool = False,
        qualifiers: set[str] | None = None,
        version: int | None = None,
        pinned: bool = False,
    ) -> DataFrame:
        """Bucket-pruned scan planned from the current snapshot's file list
        (or a historical one: ``version`` = time travel, free because every
        commit is a full snapshot; ``pinned`` = internal DML base pin, see
        ``snapshot_full``). ``where`` is applied in full by Catalyst; the
        derived ``__bucket`` predicate only narrows which partition
        directories the file index keeps (pruning is an optimization,
        never a filter)."""
        _v, snap_files, dirty = self.snapshot_full(version, pinned=pinned)
        if not snap_files:
            df = self._empty_df(with_bucket=keep_bucket)
            if where:
                df = df.where(where)
            out_cols = columns or [f.name for f in self.meta.schema.fields]
            if keep_bucket:
                out_cols = out_cols + [BUCKET_COL]
            return df.select(*out_cols)
        # derive the bucket predicate ONCE; _zonemap_read reuses it (the
        # old flow derived it twice and paid an extra O(#buckets) Spark
        # job per filtered scan — review r4)
        bucket_pred = bucket_predicate_for_where(
            where, self.meta.partition_column, self._part_type_ddl,
            self.meta.buckets, aliases, qualifiers or {self.meta.name},
        )
        # routing-dirty buckets always survive pruning — dirty set from
        # the SAME version doc as snap_files (see snapshot_full)
        bucket_pred = widen_bucket_pred(bucket_pred, dirty)
        df = self._zonemap_read(
            where, aliases, qualifiers, snap_files, bucket_pred=bucket_pred
        )
        if df is None:
            df = self._read_files(snap_files)
        if bucket_pred:
            df = df.where(bucket_pred)
        if where:
            df = df.where(where)
        out_cols = columns or [f.name for f in self.meta.schema.fields]
        if keep_bucket:
            out_cols = out_cols + [BUCKET_COL]
        return df.select(*out_cols)

    _UNSET = object()

    def _zonemap_read(
        self,
        where: str | None,
        aliases: set[str] | None,
        qualifiers: set[str] | None,
        snap_files: dict[str, dict],
        bucket_pred=_UNSET,
    ) -> DataFrame | None:
        """Zone-map file skipping for SORT BY tables: derive conservative
        bounds on the sort column from ``where``, keep only files whose
        footer min/max can overlap, and scan that explicit file list
        (``basePath`` preserves the __bucket partition column). Returns None
        when skipping doesn't apply — caller falls back to the full scan.

        Like bucket pruning this is an optimization, never a filter: the
        full ``where`` is still applied by Catalyst, so a too-wide file set
        is only wasted IO, and files lacking stats are always kept. The
        min/max come from the committed snapshot (manifest.py) — one
        metadata read per scan, no per-file footer opens (the Iceberg/Delta
        shape; survives millions of files).

        Since r4 skipping is no longer limited to the SORT BY column: the
        manifest carries Iceberg-style per-column min/max (``cols``), so a
        conjunct on ANY column whose file range provably excludes the
        bound skips the file — SORT BY still matters because clustering is
        what makes ranges tight, but range-disjoint APPENDS (daily
        time-partitioned loads, monotone ids) now skip too, on any table.

        ``last_file_skip = (kept, total)`` counts only files in NON-pruned
        buckets, so ``Files: k/n`` measures zone-map skipping alone and
        composes with (rather than double-counts) ``Shards: k/n``."""
        if not where:
            return None
        from duckdb_mpp_spark import zonemap

        bounds = zonemap.all_bounds(where, qualifiers or {self.meta.name})
        if not bounds:
            return None
        if bucket_pred is DistributedTable._UNSET:
            bucket_pred = self.widen_pred_for_dirty(
                bucket_predicate_for_where(
                    where, self.meta.partition_column, self._part_type_ddl,
                    self.meta.buckets, aliases, qualifiers or {self.meta.name},
                )
            )
        bucket_ids = set(
            evaluate_bucket_ids(self.spark, bucket_pred, self.meta.buckets)
        )
        sort_lc = (self.meta.sort_column or "").lower()
        total, kept = 0, []
        for rel, ent in sorted(snap_files.items()):
            b = int(rel.split("=", 1)[1].split("/", 1)[0])
            if b not in bucket_ids:
                continue
            total += 1
            cols = {k.lower(): v for k, v in (ent.get("cols") or {}).items()}
            if sort_lc and sort_lc not in cols and ent["min"] is not None:
                cols[sort_lc] = [ent["min"], ent["max"]]  # pre-r4 snapshot
            keep = True
            for cname, bnd in bounds.items():
                stat = cols.get(cname)
                if stat is None:
                    continue  # no stats for this column → cannot exclude
                mn = _manifest_mod._dec(stat[0])
                mx = _manifest_mod._dec(stat[1])
                if mn is not None and not zonemap.file_overlaps(mn, mx, bnd):
                    keep = False
                    break
            if keep:
                kept.append(rel)
        self.last_file_skip = (len(kept), total)
        if not kept:
            return self._empty_df(with_bucket=True)
        return self._read_files(kept)

    def _file_rowid_offsets(self) -> list[tuple[str, int]]:
        """Per-file starting rowid: cumulative row counts over
        lexicographically ordered snapshot files within each bucket. Row
        counts come from the committed snapshot (manifest.py) — a single
        metadata read, no per-file footer opens."""
        out = []
        off = {}
        for rel, ent in sorted(self.snapshot_files().items()):
            bucket = rel.split("/", 1)[0]
            out.append(("file:" + os.path.join(self.path, rel), off.get(bucket, 0)))
            off[bucket] = off.get(bucket, 0) + ent["rows"]
        return out

    def scan_with_rowid(
        self,
        where: str | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Scan with the ``rowid`` pseudo-column — shard-LOCAL row ids like
        the reference (mpp_table_scan.cpp:310-322 projects DuckDB's per-shard
        rowid; "Global row id" is an unchecked TODO in its README:117), so
        ids are dense 0..n_b-1 within each bucket and repeat across buckets.

        rowid = file_start_offset + ``_metadata.row_index``: the per-file
        offsets come from parquet footers (driver metadata pass), the row
        index from the scan itself — no shuffle, no window, any scale.
        Like DuckDB rowids, values are stable across reads but NOT across
        copy-on-write rewrites (UPDATE/DELETE/compact)."""
        base_cols = columns or [f.name for f in self.meta.schema.fields]
        snap_files = self.snapshot_files()
        if not snap_files:
            df = self._empty_df().withColumn("rowid", F.lit(None).cast("bigint"))
            if where:
                df = df.where(where)
            return df.select("rowid", *base_cols)
        offsets = self.spark.createDataFrame(
            self._file_rowid_offsets(), "__fp string, __off long"
        )
        df = (
            self._read_files(snap_files)
            .withColumn("__fp", F.col("_metadata.file_path"))
            .withColumn("__ri", F.col("_metadata.row_index"))
            .join(F.broadcast(offsets), "__fp")
            .withColumn("rowid", F.col("__off") + F.col("__ri"))
        )
        if where:
            df = df.where(where)
        return df.select("rowid", *base_cols)

    def routing_dirty_ids(self, version: int | None = None) -> list[int]:
        """Buckets that may hold rows whose partition-column value no
        longer hashes to their bucket: an UPDATE assigned the partition
        column, and (reference parity — ``test/sql/mpp_update.test:63``
        updates it in place, shard-locally) the row stays where it is.
        Every pruned read must include these buckets or it silently loses
        the re-valued rows; ``compact()``/OPTIMIZE re-routes and clears.
        Tracked per-snapshot in the manifest so time travel sees the dirty
        set that matches the files it reads.

        Diagnostic accessor: code that also resolves a file list must take
        BOTH from one ``snapshot_full`` call instead (review r6)."""
        return _manifest_mod.dirty_buckets(self.path, version)

    def widen_pred_for_dirty(
        self, bucket_pred: str | None, version: int | None = None
    ) -> str | None:
        """OR the HEAD snapshot's routing-dirty buckets into a derived
        ``__bucket`` predicate — for callers that don't hold a resolved
        snapshot (EXPLAIN); plan-from-file-list paths use
        ``widen_bucket_pred`` with ``snapshot_full``'s dirty set."""
        if bucket_pred is None:
            return None
        return widen_bucket_pred(bucket_pred, self.routing_dirty_ids(version))

    def pruned_bucket_ids(
        self,
        where: str | None,
        aliases: set[str] | None = None,
        qualifiers: set[str] | None = None,
        dirty: "list[int] | None" = None,
    ) -> list[int]:
        """Surviving bucket ids for ``where``. ``dirty``: the routing-dirty
        set of the snapshot the caller plans against (from
        ``snapshot_full``); None reads the head — only for callers that
        don't pair the result with a file list."""
        bucket_pred = bucket_predicate_for_where(
            where, self.meta.partition_column, self._part_type_ddl,
            self.meta.buckets, aliases, qualifiers or {self.meta.name},
        )
        if dirty is None:
            dirty = self.routing_dirty_ids()
        bucket_pred = widen_bucket_pred(bucket_pred, dirty)
        return evaluate_bucket_ids(self.spark, bucket_pred, self.meta.buckets)

    def explain(self, where: str | None = None, aliases: set[str] | None = None) -> str:
        """Reference-style explain: the custom scan annotations ``Table``,
        ``Shards: k/n``, ``Filter`` (src/function/mpp_table_scan.cpp:373-380,
        asserted by test/sql/mpp_filter.test:60-87) followed by the real
        Spark physical plan."""
        ids = self.pruned_bucket_ids(where, aliases)
        lines = [
            f"Table: {self.meta.name}",
            f"Shards: {len(ids)}/{self.meta.buckets}",
        ]
        if where:
            lines.append(f"Filter: {where}")
        self.last_file_skip = None
        plan = self.scan(where=where, aliases=aliases)._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        if self.last_file_skip is not None:
            k, n = self.last_file_skip
            lines.append(f"Files: {k}/{n}")
        return "\n".join(lines) + "\n" + plan


    # -- operational maintenance ------------------------------------------
    def bucket_stats(self) -> DataFrame:
        """Per-bucket file/row statistics — the operational view for skew
        and small-file monitoring (the reference exposes shard placement in
        ``__mpp_system.shards`` but no sizes; at 100 TB you watch this to
        decide when to ``compact()`` and whether the partition column is
        skewed). Entirely snapshot-metadata-driven — no scan job, no
        directory listing."""
        import os as _os

        stats = {b: [0, 0, 0] for b in range(self.meta.buckets)}
        for rel, ent in self.snapshot_files().items():
            b = int(rel.split("=", 1)[1].split("/", 1)[0])
            stats[b][0] += 1
            stats[b][1] += _os.path.getsize(_os.path.join(self.path, rel))
            stats[b][2] += ent["rows"]
        return self.spark.createDataFrame(
            [(b, s[0], s[1], s[2]) for b, s in sorted(stats.items())],
            "bucket int, n_files int, total_bytes long, n_rows long",
        ).orderBy("bucket")

    def compact(self, target_files_per_bucket: int = 1) -> int:
        """Rewrite every non-empty bucket down to
        ``target_files_per_bucket`` files (appends accumulate one file set
        per insert — the COW small-file problem); returns the number of
        buckets rewritten. At 100 TB run per-bucket (or per-bucket-range)
        compactions incrementally; the bucket is the natural unit of
        isolation. Same stage → ingest → snapshot-publish commit as DML:
        readers on the old snapshot keep a consistent view, no directory
        renames."""
        import shutil as _shutil
        import uuid as _uuid

        base, snap_files, dirty = self.snapshot_full()
        if not snap_files:
            return 0
        df = self._read_files(snap_files)
        # Repair routing-dirty buckets (a partition-column UPDATE left rows
        # whose value no longer hashes to their bucket — see
        # routing_dirty_ids): recompute __bucket from the live column
        # values, so rows migrate home and full pruning power returns. The
        # commit below clears the dirty flag; clean tables skip this
        # entirely (no recompute, no flag churn). Dirty set and file list
        # from ONE snapshot doc; a racing commit aborts ours (base pin).
        if dirty:
            df = self.route(df)
        tmp = self.path + f".compact-{_uuid.uuid4().hex[:8]}"
        n_parts = max(self.meta.buckets * target_files_per_bucket, 1)
        sort_cols = [BUCKET_COL] + (
            [self.meta.sort_column] if self.meta.sort_column else []
        )
        # repartition on BUCKET_COL alone hashes every row of a bucket to
        # ONE task — target_files_per_bucket > 1 would be a silent no-op
        # and a 100 TB bucket a single-task rewrite (review r5). The split
        # key is CONTENT-INDEPENDENT (ADVICE r5): a row-content hash would
        # collapse a bucket full of identical rows — the norm in a dedup
        # framework — back onto one task/file, and xxhash64 errors on
        # MapType columns. monotonically_increasing_id is retry-safe HERE
        # because compact's input is a raw parquet scan — partition
        # contents and row order are deterministic, so a recomputed map
        # task re-emits identical split keys (the DML paths, whose inputs
        # may be shuffle-fed, use the spark_partition_id key instead —
        # see spread_for_bucket_write, review r6). Sort clustering stays
        # per-file, which is what footer zone maps need.
        if target_files_per_bucket > 1:
            split = F.pmod(
                F.monotonically_increasing_id(),
                F.lit(target_files_per_bucket),
            ).alias("__split")
            df = df.withColumn("__split", split)
            shuffle_cols = [BUCKET_COL, "__split"]
        else:
            shuffle_cols = [BUCKET_COL]
        try:
            (
                df.repartition(n_parts, *shuffle_cols)
                .drop("__split")
                .sortWithinPartitions(*sort_cols)  # re-clusters SORT BY tables
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(tmp)
            )
            new_entries = self._ingest_staged(tmp)
        finally:
            _shutil.rmtree(tmp, ignore_errors=True)
        rewritten = {rel.split("/", 1)[0] for rel in new_entries}
        replaced = {int(b.split("=", 1)[1]) for b in rewritten}
        # every base bucket was read and rewritten — when re-routing moved
        # rows OUT of a bucket entirely, its old files must still leave the
        # snapshot even though no new file landed there
        replaced |= {
            int(rel.split("=", 1)[1].split("/", 1)[0]) for rel in snap_files
        }
        self._commit_replace(
            sorted(replaced),
            new_entries,
            base,
            snap_files,
            dirty_buckets=[] if dirty else None,
        )
        return len(rewritten)
