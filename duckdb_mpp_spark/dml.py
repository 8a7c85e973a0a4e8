"""Copy-on-write UPDATE / DELETE over pruned buckets.

The reference decompiles the bound plan back to per-shard SQL text and runs
``UPDATE shard_i SET ... WHERE ...`` on every surviving shard in parallel
(``src/execution/mpp_physical_update.cpp:79-119``, ``mpp_physical_delete.cpp``).
The Spark-native equivalent: read ONLY the surviving bucket directories,
apply the mutation as a projection (``CASE WHEN pred THEN new ELSE old``) or
an anti-filter, and atomically swap the rewritten directories. Unaffected
buckets are never read or written — that is the same pruning win the
reference gets, and at 100 TB it is the difference between rewriting the
table and rewriting k/n of it.

Counts: both ops return the summed matched-row count, matching the
reference's single BIGINT result (``mpp_physical_update.cpp:105-107``). The
count comes from an ``Observation`` on the rewrite job itself (the same
pattern as ``DistributedTable.insert``), so the surviving buckets are read
exactly ONCE per DML — no separate count pass. When the predicate matches
nothing the rewritten temp dir is discarded and the table is left untouched
(no spurious file-generation churn, rowids stay stable).

Semantics matched deliberately:
- Updating the partition column does NOT re-route rows to new buckets —
  reference shard-local UPDATE keeps rows on their shard
  (``test/sql/mpp_update.test:63`` updates the partition column in place).
- A NULL predicate result neither updates nor deletes the row (SQL 3VL).
- ``DEFAULT`` in a SET list resolves to the column's declared default or
  NULL (``ResolveDefaults``, ``src/execution/mpp_physical_insert.cpp:150-181``).

Atomicity: rewrite to a temp dir, ingest the staged files as new immutable
data files, then publish ONE new snapshot replacing the affected buckets'
file lists (table._commit_replace / manifest.commit). The publish is a
conditional-put of a single manifest file — object-store-safe, no directory
renames — and the base-version check surfaces write-write conflicts instead
of silently losing a concurrent writer's commit (optimistic concurrency;
the reference's remote DML is not transactional at all, SURVEY §2.A17).
"""

from __future__ import annotations

import re
import shutil
import uuid

from pyspark.sql import Observation
from pyspark.sql import functions as F

from duckdb_mpp_spark.table import (
    BUCKET_COL,
    DistributedTable,
    _max_partition_bytes,
    check_unique_sides,
    plan_size_bytes,
    split_from_bytes,
    spread_for_bucket_write,
    write_split_factor,
)

_DEFAULT_RE = re.compile(r"^\s*DEFAULT\s*$", re.IGNORECASE)


def _resolve_default(table: DistributedTable, colname: str) -> str:
    return table.meta.defaults.get(colname, "NULL")


def _commit_rewrite(
    table: DistributedTable,
    tmp_path: str,
    bucket_ids: list[int],
    base: int,
    base_files: dict[str, dict],
    dirty_buckets: list[int] | None = None,
    stream_batch: tuple[str, int] | None = None,
) -> None:
    """Ingest the staged rewrite and publish the snapshot that swaps the
    affected buckets' files. A bucket with no surviving rows simply has no
    files in the new snapshot. ``dirty_buckets``: None inherits the base
    snapshot's routing-dirty set; a list replaces it (partition-column
    UPDATE widens it — see ``DistributedTable.routing_dirty_ids``)."""
    try:
        new_entries = table._ingest_staged(tmp_path)
    finally:
        shutil.rmtree(tmp_path, ignore_errors=True)
    table._commit_replace(
        bucket_ids, new_entries, base, base_files, dirty_buckets=dirty_buckets,
        stream_batch=stream_batch,
    )


def _observed_matched(obs: Observation, df, pred) -> int:
    """Read the matched-row metric off the rewrite job. When Catalyst (or
    AQE's empty-relation propagation) proves the rewrite output empty it
    drops the CollectMetrics node with the rest of the subtree and the
    metrics row comes back schema-less — fall back to a direct count, which
    only happens when the surviving-rows side was degenerate anyway."""
    try:
        return int(obs.get["matched"])
    except Exception:
        return df.where(pred).count()


def _assert_deterministic_assignment(
    scan_df, text: str, col: str, what: str = "assignment"
) -> None:
    """UNIQUE enforcement for COW rewrites validates the operation's new
    values by re-deriving them from the base scan (the staged files mix
    modified rows with carried-through survivors, so they cannot supply a
    modified-only side). Re-derivation is only sound when every expression
    it replays is DETERMINISTIC — ``SET k = CAST(rand()*1e6 AS INT)``
    (review r8) would be validated against a different draw than the one
    the staged write committed, so it is rejected loudly instead. WHERE
    predicates have their own guard (:func:`_assert_deterministic_where`,
    which applies to EVERY COW rewrite, not only unique-assigned ones)."""
    if not _is_deterministic(scan_df, text):
        raise ValueError(
            f"nondeterministic {what} ({text!r}) is not supported when a "
            f"unique column ({col!r}) is assigned: the constraint check "
            "would validate a different evaluation than the one committed"
        )


def _is_deterministic(scan_df, text: str) -> bool:
    proj = scan_df.select(F.expr(text).alias("_v"))
    exprs = proj._jdf.queryExecution().analyzed().expressions()
    return all(exprs.apply(i).deterministic() for i in range(exprs.size()))


def _assert_deterministic_where(scan_df, where: str) -> None:
    """Every COW rewrite rejects a nondeterministic WHERE up front (review
    r9 — the r8 guard ran only when a unique column was assigned and only
    after staging): the staged write's matched-count ``observe()`` metric
    embeds the predicate, and Spark rejects nondeterministic observed
    metrics with an opaque analyzer error regardless, so the only choices
    are this named, actionable error or that one. When a unique column IS
    assigned there is the further re-derivation unsoundness (review r8b:
    the predicate partitions both constraint-check sides, so a different
    draw would be validated than the one committed)."""
    if not _is_deterministic(scan_df, where):
        raise ValueError(
            f"nondeterministic WHERE predicate ({where!r}) is not "
            "supported in UPDATE/DELETE: the matched-row observation and "
            "any constraint re-derivation would evaluate a different "
            "draw than the one the rewrite commits"
        )


def _check_unique_sides(
    table: DistributedTable,
    col: str,
    modified,
    others,
    bucket_local: bool,
) -> None:
    """UNIQUE/PRIMARY KEY enforcement for COW rewrites/merges (review r4 —
    the reference's per-shard index rejects duplicate-creating DML on
    every path, not just INSERT). Delegates to the ONE shared primitive
    (``table.check_unique_sides`` — unified r8 with the insert path, so
    contract fixes land once). ``modified`` holds ONLY the values this
    operation actually assigned/inserted (one row per modified row);
    ``others`` holds every OTHER post-commit row's value that could share
    the group; a duplicate group aborts only when a modified value
    participates (ADVICE r7, extended to bucket-local constraints in r8:
    the old staged-files formulation flagged carried-through survivor
    rows as operation-owned too, so a pre-existing on-disk duplicate —
    constraint added after a legacy load — with one copy inside a
    rewritten bucket aborted an UNRELATED update).

    ``bucket_local=True``: the rewrite never re-routes and MERGE replaces
    by key, so modified rows can only collide within their own bucket and
    ``others`` needs only the REWRITTEN buckets' surviving rows.
    ``bucket_local=False`` is the value-GLOBAL partition column (review
    r6), where ``others`` must cover untouched buckets too. Both inputs
    are narrow projections of already-planned scans — one pass each, only
    when a unique column is actually written."""
    check_unique_sides(
        table.meta.name, col, modified, others, bucket_local=bucket_local
    )


def _check_unique_global(
    table: DistributedTable,
    col: str,
    modified,
    others,
) -> None:
    """Value-global flavor of :func:`_check_unique_sides` (kept as the
    named entry point the partition-column callers and the ADVICE-r7
    regression tests use)."""
    _check_unique_sides(table, col, modified, others, bucket_local=False)


def _dml_bucket_ids(
    table: DistributedTable,
    where: str | None,
    dirty: list[int],
    base: int,
) -> list[int]:
    """Buckets a COW rewrite must touch: the pruning survivors for
    ``where``, plus only those routing-dirty buckets that actually HOLD a
    matching row. Blindly widening to every dirty bucket made each
    subsequent UPDATE/DELETE rewrite their full contents forever until
    OPTIMIZE (review r6 — the same write-amplification hole upsert's probe
    closed); the probe is one cheap job over the dirty buckets only, and
    clean tables never run it."""
    ids = table.pruned_bucket_ids(where, dirty=[])
    extra = sorted(set(dirty) - set(ids))
    if not extra or where is None:
        return ids
    hits = (
        table.scan(where=None, keep_bucket=True, version=base, pinned=True)
        .where(F.col(BUCKET_COL).isin(extra))
        .where(F.coalesce(F.expr(where), F.lit(False)))
        .select(BUCKET_COL)
        .distinct()
        .collect()
    )
    return sorted(set(ids) | {r[0] for r in hits})


def _rewrite_sort_cols(table: DistributedTable) -> list[str]:
    """COW rewrites preserve SORT BY clustering (zone maps stay tight after
    UPDATE/DELETE); unsorted tables just cluster by bucket."""
    cols = [BUCKET_COL]
    if table.meta.sort_column:
        cols.append(table.meta.sort_column)
    return cols


def update(
    table: DistributedTable,
    assignments: dict[str, str],
    where: str | None = None,
) -> int:
    """``UPDATE t SET col=expr,... [WHERE pred]`` → matched-row count."""
    meta = table.meta
    base, snap_files, dirty0 = table.snapshot_full()
    ids = _dml_bucket_ids(table, where, dirty0, base)
    if not snap_files or not ids:
        return 0
    # scan pinned to the SAME version the commit below is based on — a
    # concurrent commit aborts ours (CommitConflict) instead of leaking
    # its rows into our rewrite (review r6)
    df = table.scan(where=None, keep_bucket=True, version=base, pinned=True)
    if len(ids) < meta.buckets:
        df = df.where(F.col(BUCKET_COL).isin(ids))

    pred = F.coalesce(F.expr(where), F.lit(False)) if where else F.lit(True)

    # WHERE determinism is validated BEFORE staging, for EVERY update
    # (ADVICE r8 + review r9): see _assert_deterministic_where.
    if where is not None:
        _assert_deterministic_where(df, where)

    out_cols = []
    for field in meta.schema.fields:
        if field.name in assignments:
            text = assignments[field.name]
            if _DEFAULT_RE.match(text):
                text = _resolve_default(table, field.name)
            new_val = F.expr(text).cast(field.dataType)
            out_cols.append(
                F.when(pred, new_val).otherwise(F.col(field.name)).alias(field.name)
            )
        else:
            out_cols.append(F.col(field.name))
    out_cols.append(F.col(BUCKET_COL))

    obs = Observation()
    tmp = table.path + f".cow-{uuid.uuid4().hex[:8]}"
    (
        df.observe(
            obs,
            F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias("matched"),
        )
        .select(*out_cols)
        .transform(
            # big-bucket rewrites fan out over input_parts/len(ids) tasks
            # per bucket (content-independent split key; see table.py)
            lambda d: spread_for_bucket_write(
                d, len(ids), write_split_factor(df, len(ids))
            )
        )
        .sortWithinPartitions(*_rewrite_sort_cols(table))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(tmp)
    )
    matched = _observed_matched(obs, df, pred)
    if matched == 0:
        shutil.rmtree(tmp, ignore_errors=True)
        return 0
    changed_unique = [c for c in meta.unique_columns if c in assignments]
    if changed_unique:
        # The modified side is re-derived from the base scan (pred + the
        # assignment expression), NOT read back from the staged files —
        # staged files mix modified rows with carried-through survivors,
        # and flagging survivors as operation-owned aborted unrelated
        # UPDATEs on pre-existing duplicates (ADVICE r7, extended to the
        # bucket-local columns in r8). Re-derivation requires the
        # assignment to be deterministic (guarded below, review r8). The
        # partition-column constraint is value-GLOBAL (table.py
        # _enforce_unique): an assignment like SET k = 1 lands the new
        # value in a bucket the staged rewrite never touched, so its
        # others side must cover the whole table; every other unique
        # column is bucket-local and — because the rewrite never re-routes
        # — both sides restrict to the rewritten buckets (review r8: the
        # first cut scanned all buckets for the modified side too;
        # _dml_bucket_ids guarantees pred-matching rows live only in ids).
        try:
            full = table.scan(
                where=None, keep_bucket=True, version=base, pinned=True
            )
            in_ids = (
                full.where(F.col(BUCKET_COL).isin(ids))
                if len(ids) < meta.buckets
                else full
            )
            # the WHERE predicate partitions BOTH sides of the check, so it
            # must be deterministic too (review r8b: UPDATE ... WHERE
            # rand() < 0.9 would stage one set of matches and validate a
            # different one — silent UNIQUE violation or spurious abort).
            # Checked before staging (early_unique above); nothing to
            # re-check here.
            for col in changed_unique:
                text = assignments[col]
                if _DEFAULT_RE.match(text):
                    text = _resolve_default(table, col)
                _assert_deterministic_assignment(full, text, col)
                dt = meta.schema[col].dataType
                modified = in_ids.where(pred).select(
                    BUCKET_COL, F.expr(text).cast(dt).alias(col)
                )
                is_global = col == meta.partition_column
                # pred is NULL-coalesced to false, so ~pred is exactly
                # the not-updated rows (their values survive the rewrite)
                others = (full if is_global else in_ids).where(~pred).select(
                    BUCKET_COL, col
                )
                _check_unique_sides(
                    table, col, modified, others, bucket_local=not is_global
                )
        except ValueError:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
    # Assigning the partition column keeps rows in their bucket (reference
    # shard-local semantics, see module docstring) — which breaks the
    # bucket == pmod(hash(col), n) invariant pruning relies on. Flag every
    # rewritten bucket routing-dirty so pruned reads keep including them
    # (wrong-results class caught by tests/test_pruning_property.py r6);
    # OPTIMIZE/compact re-routes and clears. A STRUCT-typed partition
    # column ('s.a') is re-valued by assigning its top-level field ('s'),
    # so match on the top-level name too (review r6).
    dirty = None
    part_top = meta.partition_column.split(".", 1)[0]
    if meta.partition_column in assignments or part_top in assignments:
        dirty = sorted(set(dirty0) | set(ids))
    _commit_rewrite(table, tmp, ids, base, snap_files, dirty_buckets=dirty)
    return matched


def upsert(
    table: DistributedTable,
    df,
    key_cols: list[str],
    stream_batch: tuple[str, int] | None = None,
) -> int:
    """MERGE-style upsert: input rows REPLACE existing rows with equal
    ``key_cols`` (standard SQL MERGE matching — NULL keys never match, so
    NULL-key input rows APPEND; declare the key NOT NULL to forbid them);
    non-matching input rows append — all in ONE snapshot
    commit, so readers see either the pre-merge or the post-merge table,
    never a half-applied mix (the daily-crawl dedup-merge step of a
    training-data pipeline, built directly on the snapshot-commit protocol).

    Requirements, both MPP-shape-honest:
    - the partition column must be among ``key_cols`` — routing then makes
      matching strictly bucket-local, so only buckets that receive input
      rows are rewritten (the same pruning win COW DML gets); without it a
      match could live in a bucket the merge never looks at;
    - input keys are assumed unique (dedupe upstream) — with duplicates,
      all duplicates land (same as a blind append would).

    Returns the number of input rows applied. Work: one pass over the input
    for bucket discovery (O(#buckets) driver metadata), one staged rewrite
    of affected buckets anti-joined on the (broadcastable) input keys.
    """
    meta = table.meta
    if meta.partition_column not in key_cols:
        raise ValueError(
            f"upsert key {key_cols} must include the partition column "
            f"{meta.partition_column!r} (bucket-local matching)"
        )
    for c in key_cols:
        if c not in [f.name for f in meta.schema.fields]:
            raise ValueError(f"unknown key column {c!r}")

    base, snap_files, dirty0 = table.snapshot_full()
    # localCheckpoint: the input batch is evaluated exactly ONCE — the
    # bucket-discovery count and the staged union both read the
    # materialized blocks, so a computed input pipeline (or a re-readable
    # file batch) is never run twice (VERDICT r3 "What's wrong" #1).
    routed = table.route(table._aligned_for_insert(df))
    # volume estimate BEFORE the checkpoint (RDD-backed plans report no
    # stats); the batch is often the dominant write volume — an initial
    # load via upsert into an empty table must still fan out (review r6)
    batch_bytes = plan_size_bytes(routed)
    new_rows = routed.localCheckpoint(eager=True)
    # one O(#buckets) job yields both the affected-bucket set and the
    # applied count (no Observation: foreachBatch + AQE empty-relation
    # propagation can plan CollectMetrics away and leave .get blocking)
    per_bucket = new_rows.groupBy(BUCKET_COL).count().collect()
    applied = sum(r[1] for r in per_bucket)
    if not per_bucket:
        return 0
    batch_ids = {r[0] for r in per_bucket}
    # Routing-dirty buckets (partition-column UPDATE history — see
    # routing_dirty_ids) may hold a matching key that no longer hashes to
    # its bucket; bucket-local matching must look there too or the merge
    # would duplicate the key. But REWRITING every dirty bucket on every
    # merge forever would be unbounded write amplification for a one-time
    # UPDATE (review r6) — probe which dirty buckets actually contain a
    # matching key (one cheap semi-join, dirty buckets only) and widen the
    # rewrite set to just those. Clean tables: no probe, no widening.
    dirty_extra = sorted(set(dirty0) - batch_ids)
    if dirty_extra:
        hit = (
            table.scan(where=None, keep_bucket=True, version=base, pinned=True)
            .where(F.col(BUCKET_COL).isin(dirty_extra))
            .join(new_rows.select(*key_cols).distinct(), key_cols, "left_semi")
            .select(BUCKET_COL)
            .distinct()
            .collect()
        )
        batch_ids |= {r[0] for r in hit}
    ids = sorted(batch_ids)

    # pinned to the commit's base version — see update()
    existing = table.scan(where=None, keep_bucket=True, version=base, pinned=True)
    if len(ids) < meta.buckets:
        existing = existing.where(F.col(BUCKET_COL).isin(ids))
    # anti-join on the input's key set; AQE broadcasts it when the batch is
    # small (the common daily-merge case) and falls back to a key-partitioned
    # join for huge batches — don't force either. Equality is deliberately
    # null-UNSAFE (standard SQL MERGE matching: NULL never equals NULL), so
    # NULL-key input rows APPEND — a contract, not an accident
    # (tests/test_upsert_timetravel.py::test_upsert_null_keys_append);
    # re-adjudicated r5: keeping MERGE parity beats silent NULL<=>NULL
    # matching, and pipelines that must not accumulate NULL keys declare
    # the key NOT NULL (enforced on every DML path).
    survivors = existing.join(
        new_rows.select(*key_cols).distinct(), key_cols, "left_anti"
    )

    staged = survivors.unionByName(new_rows)
    # staged volume ≈ surviving-bucket bytes + batch bytes (either side
    # may dominate: daily merge into a big table vs bulk load into an
    # empty one)
    staged_bytes = (plan_size_bytes(existing) or 0) + (batch_bytes or 0)
    split = split_from_bytes(
        staged_bytes or None, len(ids), _max_partition_bytes(staged)
    )
    tmp = table.path + f".cow-{uuid.uuid4().hex[:8]}"
    (
        spread_for_bucket_write(staged, len(ids), split)
        .sortWithinPartitions(*_rewrite_sort_cols(table))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(tmp)
    )
    if meta.unique_columns:
        # The modified side is the (checkpointed) input batch itself —
        # values fixed, no re-evaluation hazard. partition-column
        # constraint stays value-GLOBAL (review r6, live repro): with a
        # COMPOSITE upsert key, a misplaced row in a dirty bucket can
        # share the partition value but differ on the other key fields —
        # it is then neither replaced (full-key match fails) nor visible
        # bucket-locally; its surviving value rides the global others
        # side. Every other unique column is bucket-local: routed input
        # rows collide only within their own bucket, so both sides
        # restrict to the rewritten buckets (``existing`` is exactly
        # that). Survivor-only duplicate groups no longer abort (ADVICE
        # r7, extended to bucket-local in r8).
        try:
            full = table.scan(
                where=None, keep_bucket=True, version=base, pinned=True
            )
            keys = new_rows.select(*key_cols).distinct()
            for col in meta.unique_columns:
                is_global = col == meta.partition_column
                others = (full if is_global else existing).join(
                    keys, key_cols, "left_anti"
                ).select(BUCKET_COL, col)
                _check_unique_sides(
                    table,
                    col,
                    modified=new_rows.select(BUCKET_COL, col),
                    others=others,
                    bucket_local=not is_global,
                )
        except ValueError:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
    _commit_rewrite(
        table, tmp, ids, base, snap_files, stream_batch=stream_batch
    )
    return applied


def delete(table: DistributedTable, where: str | None = None) -> int:
    """``DELETE FROM t [WHERE pred]`` → deleted-row count."""
    meta = table.meta
    base, snap_files, dirty0 = table.snapshot_full()
    ids = _dml_bucket_ids(table, where, dirty0, base)
    if not snap_files or not ids:
        return 0

    if where is None:
        # delete-all: metadata-only — count from the snapshot and publish
        # an empty one. No scan job, no file deletion (vacuum reclaims).
        total = sum(e["rows"] for e in snap_files.values())
        from duckdb_mpp_spark import manifest as _manifest_mod

        _manifest_mod.commit(table.path, {}, base)
        return total

    df = table.scan(where=None, keep_bucket=True, version=base, pinned=True)
    if len(ids) < meta.buckets:
        df = df.where(F.col(BUCKET_COL).isin(ids))
    # same up-front guard as update() (review r9): the observe() below
    # embeds the predicate and Spark rejects nondeterministic observed
    # metrics with an opaque analyzer error otherwise
    _assert_deterministic_where(df, where)
    pred = F.coalesce(F.expr(where), F.lit(False))
    obs = Observation()
    tmp = table.path + f".cow-{uuid.uuid4().hex[:8]}"
    (
        # observe BEFORE the anti-filter so the metric counts matched
        # (deleted) rows while the write keeps the survivors — one read
        df.observe(
            obs,
            F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias("matched"),
        )
        .where(~pred)
        .transform(
            # size on the SURVIVOR plan (anti-filter applied): a delete
            # removing most of a bucket must not oversplit the small
            # remainder into near-empty files (review r6); Catalyst's
            # filter-selectivity estimate is the best job-free proxy
            lambda d: spread_for_bucket_write(
                d, len(ids), write_split_factor(df.where(~pred), len(ids))
            )
        )
        .sortWithinPartitions(*_rewrite_sort_cols(table))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(tmp)
    )
    matched = _observed_matched(obs, df, pred)
    if matched == 0:
        shutil.rmtree(tmp, ignore_errors=True)
        return 0
    _commit_rewrite(table, tmp, ids, base, snap_files)
    return matched
