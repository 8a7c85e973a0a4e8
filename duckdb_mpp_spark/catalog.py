"""Metadata layer — the Spark-native equivalent of the reference's
``__mpp_system`` coordinator tables (nodes / tables / shards).

Reference keeps three DuckDB tables (``src/storage/mpp_nodes.cpp:19-34``,
``src/storage/mpp_tables.cpp:22-44``, ``src/storage/mpp_shards.cpp:18-41``)
and soft-deletes table rows on DROP (``src/storage/mpp_tables.cpp:96-125``).
Here the catalog is a JSON document per warehouse; on a real cluster this
would live on the shared FS (S3/HDFS) next to the data — it is tiny
(O(#tables) rows), read once per session, and never on the per-row hot path,
so a single JSON object is the right scale design. The three system tables
are exposed as DataFrames with the reference's exact schemas for test parity
(``test/sql/mpp.test:33-52``), including the DROP tombstone
(``test/sql/mpp.test:168-171``).
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CATALOG_FILE = "_mpp_catalog.json"


def resolve_field(schema: T.StructType, path: str) -> T.DataType | None:
    """Resolve a possibly-dotted column path (``s.a``) through nested
    structs; None if any step is missing."""
    dtype: T.DataType = schema
    for part in path.split("."):
        if not isinstance(dtype, T.StructType) or part not in dtype.fieldNames():
            return None
        dtype = dtype[part].dataType
    return dtype

# Reference schema: nodes(host VARCHAR, port USMALLINT) — unsigned types map
# to the next signed Spark type (SURVEY §1.3).
NODES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("port", T.IntegerType(), False),
    ]
)
TABLES_SCHEMA = T.StructType(
    [
        T.StructField("table_oid", T.LongType(), False),
        T.StructField("partition_column_index", T.LongType(), True),
        T.StructField("buckets", T.IntegerType(), True),
        T.StructField("deleted", T.BooleanType(), True),
    ]
)
SHARDS_SCHEMA = T.StructType(
    [
        T.StructField("table_oid", T.LongType(), False),
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("node", T.StringType(), False),
    ]
)


@dataclass
class TableMeta:
    name: str
    oid: int
    partition_column: str
    partition_column_index: int
    buckets: int
    schema_json: str  # StructType.json() of the user-visible schema
    defaults: dict[str, str] = field(default_factory=dict)  # col -> SQL literal text
    deleted: bool = False
    # Storage flavor: False → directory-per-bucket parquet (COW DML capable);
    # True → Spark native bucketed table (append-only, co-located joins).
    colocated: bool = False
    # SORT BY column: files are written clustered on it, enabling zone-map
    # file skipping for range predicates (see zonemap.py). COW flavor only.
    sort_column: str | None = None
    # UNIQUE / PRIMARY KEY columns: enforced BUCKET-LOCALLY at insert time
    # (the reference carries constraints into shard DDL where DuckDB's
    # per-shard index enforces them — create_distributed_table.cpp:107 —
    # so cross-shard duplicates are invisible there too; same semantics
    # here). COW flavor only.
    unique_columns: list[str] = field(default_factory=list)
    # Shard placement, FROZEN at create time (reference semantics: shard i
    # → node (start + i) % #nodes over the nodes registered at creation,
    # create_distributed_table.cpp:135-140 — registering a node later never
    # moves existing shards). One "host:port" string per shard. Spark owns
    # *physical* placement (SURVEY §1.1); this is the observable metadata
    # surface the reference's multi-DB test reads
    # (test/sql/mpp.test:47-52). None on legacy metas → derived on read.
    placement: list[str] | None = None

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))


class MppCatalog:
    """Warehouse-scoped catalog: node registry + distributed-table metadata.

    Thread-safe for the single-coordinator (driver) usage pattern that the
    reference also assumes (its metadata is coordinator-local DuckDB).
    """

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        self._lock = threading.RLock()
        self._nodes: list[tuple[str, int]] = []
        self._tables: dict[str, TableMeta] = {}  # live tables by name
        self._tombstones: list[TableMeta] = []  # dropped tables (deleted=True)
        self._next_oid = 1000
        os.makedirs(warehouse, exist_ok=True)
        self._load()
        if not self._nodes:
            # Reference auto-registers the local node
            # (src/storage/mpp_nodes.cpp:36-40).
            self._nodes.append(("localhost", 0))
            self._save()

    # -- persistence ------------------------------------------------------
    def _path(self) -> str:
        return os.path.join(self.warehouse, CATALOG_FILE)

    def _load(self) -> None:
        if not os.path.exists(self._path()):
            return
        with open(self._path()) as f:
            doc = json.load(f)
        self._nodes = [tuple(n) for n in doc.get("nodes", [])]
        self._next_oid = doc.get("next_oid", 1000)
        self._tables = {}
        self._tombstones = []
        for row in doc.get("tables", []):
            meta = TableMeta(**row)
            if meta.deleted:
                self._tombstones.append(meta)
            else:
                self._tables[meta.name] = meta

    def _save(self) -> None:
        doc = {
            "nodes": self._nodes,
            "next_oid": self._next_oid,
            "tables": [vars(m) for m in list(self._tables.values()) + self._tombstones],
        }
        tmp = self._path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, self._path())  # atomic on POSIX

    # -- nodes ------------------------------------------------------------
    def add_node(self, host: str, port: int) -> None:
        """``master_add_node`` (src/function/master_add_node.cpp:27-63)."""
        with self._lock:
            if (host, port) in self._nodes:
                raise ValueError(f"node {host}:{port} already registered")
            self._nodes.append((host, port))
            self._save()

    def remove_node(self, host: str, port: int) -> None:
        # Parity: RemoveNode unimplemented in reference
        # (src/storage/mpp_nodes.cpp:83-85).
        raise NotImplementedError("remove_node is not implemented")

    # -- tables -----------------------------------------------------------
    def create_table(
        self,
        name: str,
        schema: T.StructType,
        partition_column: str,
        buckets: int,
        defaults: dict[str, str] | None = None,
        colocated: bool = False,
        sort_column: str | None = None,
        unique_columns: list[str] | None = None,
    ) -> TableMeta:
        with self._lock:
            if name in self._tables:
                raise ValueError(f'table "{name}" already exists')
            # "__bucket" is the storage layout's partition directory column
            # and "__split" the transient write fan-out key — a user column
            # with either name would be silently clobbered by the write
            # path (review r6)
            for f in schema.fields:
                if f.name in ("__bucket", "__split"):
                    raise ValueError(
                        f'column name "{f.name}" is reserved by the storage '
                        "layout"
                    )
            for uc in unique_columns or []:
                if colocated:
                    raise NotImplementedError(
                        "UNIQUE/PRIMARY KEY constraints are supported on the "
                        "copy-on-write flavor only (COLOCATED tables are "
                        "append-only native bucketed tables)"
                    )
                if uc not in {f.name for f in schema.fields}:
                    raise ValueError(f'unique column "{uc}" does not exist')
            if sort_column is not None:
                if colocated:
                    raise ValueError(
                        "SORT BY is supported on the copy-on-write flavor only"
                    )
                if sort_column not in {f.name for f in schema.fields}:
                    raise ValueError(
                        f'sort column "{sort_column}" does not exist'
                    )
            if colocated and "." in partition_column:
                # Spark bucketBy takes top-level columns only; the COW layout
                # supports struct-field partition columns, this flavor doesn't.
                raise ValueError(
                    "COLOCATED tables require a top-level partition column"
                )
            cols = [f.name for f in schema.fields]
            # the partition column may be a struct-field path (``s.a``) —
            # the reference resolves partition refs through struct_extract
            # (src/include/common/expression_helper.hpp:16-34)
            base = partition_column.split(".")[0]
            if base not in cols or resolve_field(schema, partition_column) is None:
                # matches reference error (create_distributed_table.cpp:78-82)
                raise ValueError(f'partition column "{partition_column}" does not exist')
            partition_column_index = cols.index(base)
            if buckets <= 0:
                raise ValueError("buckets must be positive")
            meta = TableMeta(
                name=name,
                oid=self._next_oid,
                partition_column=partition_column,
                partition_column_index=partition_column_index,
                buckets=buckets,
                schema_json=schema.json(),
                defaults=defaults or {},
                colocated=colocated,
                sort_column=sort_column,
                unique_columns=list(unique_columns or []),
                # round-robin over the nodes registered NOW; start offset is
                # a deterministic stand-in for the reference's random start
                # (placement counts per node — what the reference test
                # asserts — are identical for any start)
                placement=[
                    "{}:{}".format(
                        *self._nodes[(self._next_oid + i) % len(self._nodes)]
                    )
                    for i in range(buckets)
                ],
            )
            self._next_oid += 1
            self._tables[name] = meta
            self._save()
            return meta

    def drop_table(self, name: str) -> TableMeta:
        """Soft delete: tombstone row stays, data files stay (reference drops
        only the coordinator entry; worker shard tables survive —
        src/storage/mpp_schema_entry.cpp:141-156)."""
        with self._lock:
            meta = self._tables.pop(name, None)
            if meta is None:
                raise ValueError(f'table "{name}" does not exist')
            meta.deleted = True
            self._tombstones.append(meta)
            self._save()
            return meta

    def restore_table(self, name: str) -> TableMeta:
        """Undo a DROP: move the newest tombstone for ``name`` back into the
        live set (used by transaction rollback of a DROP — the reference's
        DuckDB-transactional catalog restores the entry; review r4)."""
        with self._lock:
            for i in range(len(self._tombstones) - 1, -1, -1):
                if self._tombstones[i].name == name:
                    meta = self._tombstones.pop(i)
                    meta.deleted = False
                    self._tables[name] = meta
                    self._save()
                    return meta
            raise ValueError(f'no dropped table "{name}" to restore')

    def forget_table(self, name: str) -> None:
        """Hard removal without tombstone — used by transaction rollback of a
        CREATE (reference DDL rollback, test/sql/mpp_transaction.test:14-24)."""
        with self._lock:
            self._tables.pop(name, None)
            self._save()

    def get(self, name: str) -> TableMeta:
        meta = self._tables.get(name)
        if meta is None:
            raise ValueError(f'table "{name}" does not exist')
        return meta

    def exists(self, name: str) -> bool:
        return name in self._tables

    def table_path(self, meta: TableMeta) -> str:
        # oid in the dir name: DROP leaves files behind (by design), so a
        # re-created table must get a fresh directory.
        return os.path.join(self.warehouse, f"{meta.name}_{meta.oid}")

    # -- system views (reference __mpp_system schema) ---------------------
    def nodes(self) -> list[tuple[str, int]]:
        return list(self._nodes)

    def nodes_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._nodes, NODES_SCHEMA)

    def tables_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (m.oid, m.partition_column_index, m.buckets, m.deleted)
            for m in list(self._tables.values()) + self._tombstones
        ]
        return spark.createDataFrame(rows, TABLES_SCHEMA)

    def shards_df(self, spark: SparkSession) -> DataFrame:
        # PHYSICAL placement is Spark's job (SURVEY §1.1) — this is the
        # reference's observable metadata surface: placement frozen at
        # CREATE (TableMeta.placement), so later master_add_node calls
        # never move existing shards, exactly as in the reference's
        # two-database test (test/sql/mpp.test:47-52). Legacy metas
        # (pre-r5, placement=None) derive round-robin over current nodes.
        rows = []
        for m in self._tables.values():
            for shard in range(m.buckets):
                if m.placement is not None:
                    node = m.placement[shard]
                else:
                    host, port = self._nodes[shard % len(self._nodes)]
                    node = f"{host}:{port}"
                rows.append((m.oid, shard, node))
        return spark.createDataFrame(rows, SHARDS_SCHEMA)

    def register_system_views(self, spark: SparkSession) -> None:
        self.nodes_df(spark).createOrReplaceTempView("mpp_nodes")
        self.tables_df(spark).createOrReplaceTempView("mpp_tables")
        self.shards_df(spark).createOrReplaceTempView("mpp_shards")
