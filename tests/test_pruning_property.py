"""Property-based safety test for bucket pruning (hypothesis).

The invariant the reference also guarantees (SURVEY §2.A4: "anything else
keeps all shards"): for ANY predicate — inside or outside the pruning
mini-grammar — a pruned scan returns exactly the rows a full-table filter
returns. Pruning may only ever *skip* buckets the predicate cannot touch;
it must never change results.

Strategy: generate predicates over the partition column (equality, IN,
IS [NOT] NULL, ranges, arithmetic the grammar intentionally rejects, and
random AND/OR/NOT nestings), run each against a 8-bucket table, and compare
with the same predicate applied to the raw (unbucketed) DataFrame.
"""

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_mpp_spark.mpp import MppSession

VALUES = [(-2, "apple"), (-1, "banana"), (None, "pear"), (0, None),
          (1, "watermelon"), (2, "grape"), (7, "fig"), (13, "lime")]


@pytest.fixture(scope="module")
def table(spark):
    wh = tempfile.mkdtemp(prefix="mpp_prop_")
    mpp = MppSession(spark, wh)
    mpp.sql("CREATE TABLE p(c0 INT, c1 TEXT) PARTITION BY (c0) WITH BUCKETS 8")
    vals = ", ".join(
        f"({ 'NULL' if v is None else v }, { 'NULL' if s is None else repr(s) })"
        for v, s in VALUES
    )
    mpp.sql(f"INSERT INTO p VALUES {vals}")
    raw = spark.createDataFrame(VALUES, "c0 int, c1 string")
    raw.createOrReplaceTempView("p_raw")
    yield mpp, spark
    shutil.rmtree(wh, ignore_errors=True)


_int = st.integers(min_value=-3, max_value=14)

_atom = st.one_of(
    _int.map(lambda k: f"c0 = {k}"),
    st.lists(_int, min_size=1, max_size=4).map(
        lambda ks: f"c0 IN ({', '.join(map(str, ks))})"
    ),
    st.just("c0 IS NULL"),
    st.just("c0 IS NOT NULL"),
    _int.map(lambda k: f"c0 < {k}"),
    _int.map(lambda k: f"c0 >= {k}"),
    st.tuples(_int, _int).map(lambda t: f"c0 BETWEEN {min(t)} AND {max(t)}"),
    _int.map(lambda k: f"c0 = {k} + 1"),          # arithmetic → must not prune
    _int.map(lambda k: f"abs(c0) = {abs(k)}"),    # function → must not prune
    st.sampled_from(["c1 = 'apple'", "c1 = 'zzz'", "c1 IS NULL"]),
)


def _combine(children):
    preds, op = children
    joined = f" {op} ".join(f"({p})" for p in preds)
    return joined


_pred = st.recursive(
    _atom,
    lambda inner: st.one_of(
        st.tuples(st.lists(inner, min_size=2, max_size=3), st.sampled_from(["AND", "OR"])).map(_combine),
        inner.map(lambda p: f"NOT ({p})"),
    ),
    max_leaves=4,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=_pred)
def test_pruned_scan_equals_full_filter(table, pred):
    mpp, spark = table
    key = lambda t: tuple((x is None, str(x)) for x in t)
    got = sorted(
        (tuple(r) for r in mpp.sql(f"SELECT c0, c1 FROM p WHERE {pred}").collect()),
        key=key,
    )
    want = sorted(
        (tuple(r) for r in spark.sql(f"SELECT c0, c1 FROM p_raw WHERE {pred}").collect()),
        key=key,
    )
    assert got == want, f"predicate {pred!r}: {got} != {want}"


_set_expr = st.sampled_from(
    ["c1 = upper(c1)", "c1 = 'zap'", "c1 = NULL", "c0 = c0 + 100", "c0 = 0"]
)
_op = st.tuples(st.sampled_from(["UPDATE", "DELETE"]), _atom, _set_expr)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=1, max_size=2))
def test_cow_dml_matches_plain_semantics(spark, tmp_path_factory, ops):
    """COW UPDATE/DELETE over pruned buckets must leave exactly the state a
    plain (unbucketed) SQL rewrite produces — for any predicate, including
    ones the pruner can't parse and updates touching the partition column."""
    import shutil as _sh
    import tempfile

    wh = tempfile.mkdtemp(prefix="mpp_dmlprop_")
    mpp = MppSession(spark, wh)
    mpp.sql("CREATE TABLE d(c0 INT, c1 TEXT) PARTITION BY (c0) WITH BUCKETS 8")
    vals = ", ".join(
        f"({'NULL' if v is None else v}, {'NULL' if s is None else repr(s)})"
        for v, s in VALUES
    )
    mpp.sql(f"INSERT INTO d VALUES {vals}")
    expected = spark.createDataFrame(VALUES, "c0 int, c1 string")

    try:
        for kind, pred, setx in ops:
            expected.createOrReplaceTempView("d_expected")
            if kind == "UPDATE":
                mpp.sql(f"UPDATE d SET {setx} WHERE {pred}")
                col, _, expr = setx.partition("=")
                col, expr = col.strip(), expr.strip()
                other = "c1" if col == "c0" else "c0"
                expected = spark.sql(
                    f"SELECT CASE WHEN coalesce({pred}, false) THEN CAST(({expr}) AS "
                    f"{'INT' if col == 'c0' else 'STRING'}) ELSE {col} END AS {col}, {other} "
                    "FROM d_expected"
                ).select("c0", "c1")
            else:
                mpp.sql(f"DELETE FROM d WHERE {pred}")
                expected = spark.sql(
                    f"SELECT * FROM d_expected WHERE NOT coalesce({pred}, false)"
                )
            expected = expected.localCheckpoint(eager=True)

        key = lambda t: tuple((x is None, str(x)) for x in t)
        got = sorted((tuple(r) for r in mpp.sql("SELECT c0, c1 FROM d").collect()), key=key)
        want = sorted((tuple(r) for r in expected.collect()), key=key)
        assert got == want, f"ops {ops}: {got} != {want}"
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@pytest.fixture(scope="module")
def gen_table(spark):
    """Multi-generation table: three range-disjoint inserts, so the r4
    all-column zone maps actually SKIP files for range predicates — the
    property then guards the skipping, not just the bucket pruning."""
    wh = tempfile.mkdtemp(prefix="mpp_zprop_")
    mpp = MppSession(spark, wh)
    mpp.sql("CREATE TABLE z(c0 INT, c1 TEXT) PARTITION BY (c0) WITH BUCKETS 4")
    gens = [VALUES[:3], VALUES[3:6], VALUES[6:]]
    for gen in gens:
        vals = ", ".join(
            f"({'NULL' if v is None else v}, {'NULL' if s is None else repr(s)})"
            for v, s in gen
        )
        mpp.sql(f"INSERT INTO z VALUES {vals}")
    raw = spark.createDataFrame(VALUES, "c0 int, c1 string")
    raw.createOrReplaceTempView("z_raw")
    yield mpp, spark
    shutil.rmtree(wh, ignore_errors=True)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=_pred)
def test_zonemap_skipping_never_changes_results(gen_table, pred):
    """Zone-map file skipping (any-column, r4) is an optimization, never a
    filter: for ANY predicate, a scan over the skipped file set returns
    exactly what a full filter over the raw rows returns."""
    mpp, spark = gen_table
    key = lambda t: tuple((x is None, str(x)) for x in t)
    got = sorted(
        (tuple(r) for r in mpp.sql(f"SELECT c0, c1 FROM z WHERE {pred}").collect()),
        key=key,
    )
    want = sorted(
        (tuple(r) for r in spark.sql(f"SELECT c0, c1 FROM z_raw WHERE {pred}").collect()),
        key=key,
    )
    assert got == want, pred


_setop_kw = st.sampled_from(["UNION ALL", "UNION", "EXCEPT", "INTERSECT"])
_templates = st.sampled_from([
    # {T} = the distributed table's name in the front-door text and the
    # raw view's name in the ground-truth text; every shape the r5 set-op
    # guard must handle: WHERE in first leg, WHERE in later leg, table in
    # either leg, comma-join with and without a space.
    "SELECT c0 FROM {T} WHERE {P} {OP} SELECT c0 FROM tvx",
    "SELECT c0 FROM tvx WHERE {P} {OP} SELECT c0 FROM {T}",
    "SELECT c0 FROM {T} {OP} SELECT c0 FROM tvx WHERE {P}",
    "SELECT c0 FROM tvx {OP} SELECT c0 FROM {T} WHERE {P}",
    "SELECT {T}.c0 AS c0 FROM tvx,{T} WHERE {P}",
    "SELECT {T}.c0 AS c0 FROM tvx, {T} WHERE {P}",
    "SELECT c0 FROM {T} WHERE {P} {OP} SELECT {T}.c0 FROM tvx,{T}",
    # CTE indirection (ADVICE r5): the CTE body feeds EVERY leg, so a
    # WHERE in any one leg must never prune the CTE's source table.
    "WITH x AS (SELECT c0, c1 FROM {T}) "
    "SELECT c0 FROM x WHERE {P} {OP} SELECT c0 FROM x",
    "WITH x AS (SELECT c0, c1 FROM {T}) "
    "SELECT c0 FROM x {OP} SELECT c0 FROM x WHERE {P}",
    # CTE renames the partition column: pruning the source on the main
    # WHERE would restrict on the WRONG values even without a set-op.
    "WITH x AS (SELECT c0 + 100 AS c0, c1 FROM {T}) "
    "SELECT c0 FROM x WHERE {P}",
])


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=_atom, op=_setop_kw, tmpl=_templates)
def test_setop_shapes_never_lose_rows_to_pruning(table, pred, op, tmpl):
    """review r5 regression class, generalized: for ANY set-op shape and
    ANY predicate, the front door (with bucket pruning / zone maps active)
    must return exactly what the same query over the raw unbucketed data
    returns — pruning may only skip buckets a leg cannot touch."""
    mpp, spark = table
    spark.createDataFrame(
        [(5, "mango"), (-2, "apple"), (None, "kiwi")], "c0 int, c1 string"
    ).createOrReplaceTempView("tvx")
    if ",{T}" in tmpl or ", {T}" in tmpl:
        # comma-join legs see BOTH relations — qualify the predicate's
        # column refs or Spark rejects them as ambiguous (both tables
        # carry c0/c1; the fruit literals contain no such substring)
        pred = pred.replace("c0", "{T}.c0").replace("c1", "{T}.c1")
    q_mpp = tmpl.replace("{T}", "p").format(P=pred.replace("{T}", "p"), OP=op)
    q_raw = tmpl.replace("{T}", "p_raw").format(
        P=pred.replace("{T}", "p_raw"), OP=op
    )
    key = lambda t: tuple((x is None, str(x)) for x in t)
    got = sorted((tuple(r) for r in mpp.sql(q_mpp).collect()), key=key)
    want = sorted((tuple(r) for r in spark.sql(q_raw).collect()), key=key)
    assert got == want, f"{q_mpp!r}: {got} != {want}"


def test_partition_column_update_keeps_pruned_reads_exact(spark):
    """r6 wrong-results regression (hypothesis counterexample, pinned):
    UPDATE assigning the partition column keeps rows in their bucket
    (reference shard-local semantics, mpp_update.test:63), so the bucket
    routing invariant breaks. The snapshot flags the rewritten buckets
    routing-dirty; every pruned read — scan, front-door SQL, a second
    UPDATE — must keep including them, and OPTIMIZE re-routes + clears."""
    import shutil as _sh
    import tempfile

    wh = tempfile.mkdtemp(prefix="mpp_dirty_")
    mpp = MppSession(spark, wh)
    try:
        mpp.sql("CREATE TABLE dd(c0 INT, c1 TEXT) PARTITION BY (c0) WITH BUCKETS 8")
        vals = ", ".join(
            f"({'NULL' if v is None else v}, {'NULL' if s is None else repr(s)})"
            for v, s in VALUES
        )
        mpp.sql(f"INSERT INTO dd VALUES {vals}")
        # pruning fully active pre-update
        assert "Shards: 1/8" in mpp.sql("EXPLAIN SELECT * FROM dd WHERE c0 = 0")

        # (NULL, 'pear') becomes (0, 'pear') but STAYS in NULL's bucket
        mpp.sql("UPDATE dd SET c0 = 0 WHERE c0 IS NULL")

        # pruned front-door read must still see the re-valued row
        got = sorted(
            (r["c1"] or "") for r in mpp.sql("SELECT c1 FROM dd WHERE c0 = 0").collect()
        )
        assert got == ["", "pear"]
        # a second pruned UPDATE must reach it too (the falsifying sequence)
        assert mpp.sql("UPDATE dd SET c1 = upper(c1) WHERE c0 = 0") == 2
        got = sorted(
            (r["c1"] or "") for r in mpp.sql("SELECT c1 FROM dd WHERE c0 = 0").collect()
        )
        assert got == ["", "PEAR"]
        # explain header reflects the widened (honest) shard set
        shards_line = [
            ln for ln in mpp.sql("EXPLAIN SELECT * FROM dd WHERE c0 = 0").splitlines()
            if ln.startswith("Shards:")
        ][0]
        k = int(shards_line.split()[1].split("/")[0])
        assert k > 1  # dirty buckets force extra shards into the pruned read

        # OPTIMIZE re-routes rows home and restores full pruning
        mpp.sql("OPTIMIZE dd")
        assert "Shards: 1/8" in mpp.sql("EXPLAIN SELECT * FROM dd WHERE c0 = 0")
        got = sorted(
            (r["c1"] or "") for r in mpp.sql("SELECT c1 FROM dd WHERE c0 = 0").collect()
        )
        assert got == ["", "PEAR"]
        # nothing lost or duplicated table-wide
        assert mpp.sql("SELECT count(*) AS n FROM dd").collect()[0]["n"] == len(VALUES)
    finally:
        _sh.rmtree(wh, ignore_errors=True)


def test_upsert_matches_misplaced_key_after_partition_update(spark):
    """A key whose partition value changed via UPDATE lives in the 'wrong'
    bucket; a later upsert of that key must still replace it (via the
    routing-dirty widening), not duplicate it."""
    import shutil as _sh
    import tempfile

    wh = tempfile.mkdtemp(prefix="mpp_dirty_ups_")
    mpp = MppSession(spark, wh)
    try:
        mpp.sql("CREATE TABLE du(k INT, v TEXT) PARTITION BY (k) WITH BUCKETS 8")
        mpp.sql("INSERT INTO du VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        mpp.sql("UPDATE du SET k = 40 WHERE k = 2")  # (40,'b') stays in k=2's bucket
        t = mpp.catalog  # sanity: table is dirty now
        tbl = mpp.table("du")
        assert tbl.routing_dirty_ids()
        batch = spark.createDataFrame([(40, "B2")], "k int, v string")
        from duckdb_mpp_spark.dml import upsert

        assert upsert(tbl, batch, ["k"]) == 1
        rows = sorted(
            tuple(r) for r in mpp.sql("SELECT k, v FROM du").collect()
        )
        assert rows == [(1, "a"), (3, "c"), (40, "B2")]
    finally:
        _sh.rmtree(wh, ignore_errors=True)


def test_struct_partition_update_flags_dirty(spark):
    """review r6: a STRUCT-typed partition column ('s.a') is re-valued by
    assigning its TOP-LEVEL field ('s') — the dirty flag must key on the
    top-level name too, or pruned reads lose the re-valued rows."""
    import shutil as _sh
    import tempfile

    wh = tempfile.mkdtemp(prefix="mpp_dirty_struct_")
    mpp = MppSession(spark, wh)
    try:
        mpp.sql(
            "CREATE TABLE sd(id INT, s STRUCT(a INT, b TEXT)) "
            "PARTITION BY (s.a) WITH BUCKETS 6"
        )
        mpp.sql(
            "INSERT INTO sd VALUES (1, named_struct('a', 1, 'b', 'x')), "
            "(2, named_struct('a', 2, 'b', 'y')), (3, named_struct('a', 5, 'b', 'z'))"
        )
        # re-value the partition field via the top-level struct assignment
        mpp.sql("UPDATE sd SET s = named_struct('a', 1, 'b', 'moved') WHERE id = 2")
        assert mpp.table("sd").routing_dirty_ids()
        got = sorted(
            r["id"] for r in mpp.sql("SELECT id FROM sd WHERE s.a = 1").collect()
        )
        assert got == [1, 2]
        mpp.sql("OPTIMIZE sd")
        assert not mpp.table("sd").routing_dirty_ids()
        got = sorted(
            r["id"] for r in mpp.sql("SELECT id FROM sd WHERE s.a = 1").collect()
        )
        assert got == [1, 2]
    finally:
        _sh.rmtree(wh, ignore_errors=True)


def test_upsert_rewrites_only_matched_dirty_buckets(spark):
    """review r6: an upsert on a routing-dirty table must rewrite the
    batch's buckets plus only the dirty buckets that actually hold a
    matching key — NOT every dirty bucket forever (write amplification)."""
    import shutil as _sh
    import tempfile

    from duckdb_mpp_spark.dml import upsert

    wh = tempfile.mkdtemp(prefix="mpp_dirty_amp_")
    mpp = MppSession(spark, wh)
    try:
        mpp.sql("CREATE TABLE da(k INT, v TEXT) PARTITION BY (k) WITH BUCKETS 8")
        mpp.sql("INSERT INTO da VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        mpp.sql("UPDATE da SET k = 40 WHERE k = 2")  # dirty: k=2's bucket
        tbl = mpp.table("da")
        dirty = set(tbl.routing_dirty_ids())
        assert dirty
        before = {
            rel for rel in tbl.snapshot_files()
            if int(rel.split("=", 1)[1].split("/", 1)[0]) in dirty
        }
        # unrelated-key upsert: dirty bucket's files must survive untouched
        batch = spark.createDataFrame([(7, "new")], "k int, v string")
        assert upsert(tbl, batch, ["k"]) == 1
        after = {
            rel for rel in tbl.snapshot_files()
            if int(rel.split("=", 1)[1].split("/", 1)[0]) in dirty
        }
        assert after == before
        # matching-key upsert: the misplaced key IS replaced (no duplicate)
        batch = spark.createDataFrame([(40, "B2")], "k int, v string")
        assert upsert(tbl, batch, ["k"]) == 1
        rows = sorted(tuple(r) for r in mpp.sql("SELECT k, v FROM da").collect())
        assert rows == [(1, "a"), (3, "c"), (7, "new"), (40, "B2")]
    finally:
        _sh.rmtree(wh, ignore_errors=True)


def test_time_travel_keeps_versioned_dirty_set(spark):
    """The dirty set is per-snapshot: after OPTIMIZE clears it at head, a
    time-travel scan of the pre-OPTIMIZE version must still widen pruning
    with THAT version's dirty buckets (its files still hold the misplaced
    row), and a pre-UPDATE version must scan clean."""
    import shutil as _sh
    import tempfile

    wh = tempfile.mkdtemp(prefix="mpp_dirty_tt_")
    mpp = MppSession(spark, wh)
    try:
        mpp.sql("CREATE TABLE tt(k INT, v TEXT) PARTITION BY (k) WITH BUCKETS 8")
        mpp.sql("INSERT INTO tt VALUES (1, 'a'), (2, 'b')")       # v2 (v1 = CREATE)
        tbl = mpp.table("tt")
        v_clean = tbl.snapshot()[0]
        mpp.sql("UPDATE tt SET k = 40 WHERE k = 2")               # dirty
        v_dirty = tbl.snapshot()[0]
        mpp.sql("OPTIMIZE tt")                                    # re-routed, clean
        assert not tbl.routing_dirty_ids()
        assert tbl.routing_dirty_ids(version=v_dirty)
        assert not tbl.routing_dirty_ids(version=v_clean)
        # pruned time-travel read of the dirty version sees the misplaced row
        got = sorted(
            r["v"] for r in tbl.scan(where="k = 40", version=v_dirty).collect()
        )
        assert got == ["b"]
        # head read after repair still exact
        got = sorted(r["v"] for r in tbl.scan(where="k = 40").collect())
        assert got == ["b"]
        # pre-update version: k=40 never existed
        assert tbl.scan(where="k = 40", version=v_clean).count() == 0
    finally:
        _sh.rmtree(wh, ignore_errors=True)
