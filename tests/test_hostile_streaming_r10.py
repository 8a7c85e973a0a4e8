"""Regression tests for the r10 hostile-STREAMING sweep findings
(scripts/hostile_streaming.py; VERDICT r9 #6 asked for hostile
micro-batch content through the stateful streaming paths).

Findings, each fixed in BOTH dialects:
1. NULL event-time rows: the streaming runtime silently drops them at
   window assignment while the SQL oracles grouped date_trunc(NULL) into
   a phantom NULL-hour row (hourly agg) or glued the row onto the user's
   LAST session via the lag window (session windows). Convention pinned:
   a row with no event time has no timeline position — excluded
   explicitly in windowed_counts/session_windows/batch_hourly_agg and in
   the oracle SQL.
2. NULL-user sessions: session windows for user_id IS NULL fabricated
   sessions from unrelated unattributable events (same class as the r9
   cohort and r10 top-transitions fixes). Excluded in both dialects.
3. DECIMAL(38,6) -> DOUBLE conversion divergence: DuckDB's direct cast
   goes through hugeint and is ~1 ulp off once |value| * 1e6 exceeds
   2^53 (a single 1e12 telemetry value exposed it: 1000000000003.0 vs
   1000000000003.0001), while Spark's BigDecimal conversion is correctly
   rounded. Oracle-side fix: VARCHAR round-trip
   (CAST(CAST(sum AS VARCHAR) AS DOUBLE)) — DuckDB's string parse IS
   correctly rounded, and for every value the old path converted exactly
   the round-trip is value-identical (clean-fixture results unchanged).
"""

import datetime
import math
import os

import duckdb
import pandas as pd
import pytest

from duckdb_mpp_spark.queries import REGISTRY, _ensure_loaded, run_spark_query

_ensure_loaded()

T0 = datetime.datetime(2024, 1, 1)


def _m(k):
    return T0 + datetime.timedelta(minutes=k)


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    """Tiny crafted fixture: NULL ts, NULL user, 1e12 value, plus the
    clean sf0.001 side tables the streaming gates join against."""
    import shutil

    d = tmp_path_factory.mktemp("hostile_stream")
    clean = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings", "documents"):
        shutil.copy(f"{clean}/{t}.parquet", str(d / f"{t}.parquet"))
    events = pd.DataFrame({
        "event_id": pd.array([1, 2, 3, 4, 5, 6], dtype="int64"),
        "ts": [_m(1), _m(2), None, _m(50), _m(1), None],
        "user_id": pd.array([1, 1, 1, 2, None, None], dtype="Int64"),
        "event_type": ["click", "view", "view", "view", "click", "view"],
        "value": [1.5, 3.0, 2.0, 1e12, 1.0, 2.0],
        "props": ["{}", None, "", "{}", "{}", None],
    })
    events.to_parquet(str(d / "events.parquet"))
    return str(d)


def _both(spark, hostile_dir, name):
    q = REGISTRY[name]
    sdf = run_spark_query(name, spark, hostile_dir)
    scols = sorted(sdf.columns)
    norm = lambda v: round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    s = sorted([tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=key)
    con = duckdb.connect()
    for t in ("customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{hostile_dir}/{t}.parquet')"
        )
    res = con.execute(q.oracle_sql())
    cols = [dd[0] for dd in res.description]
    idx = [cols.index(c) for c in sorted(cols)]
    dk = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=key)
    con.close()
    # the session-scoped SparkSession caches the registered sf_dir;
    # clear so later tests re-register real fixtures (conftest convention)
    try:
        sdf.sparkSession.conf.unset("duckdb_mpp_spark.registered_sf_dir")
    except Exception:
        pass
    return sorted(cols), scols, dk, s


def test_hourly_agg_null_ts_and_1e12(spark, hostile_dir):
    dcols, scols, d, s = _both(spark, hostile_dir, "streaming_hourly_agg")
    assert dcols == scols
    assert s == d
    # the NULL-ts rows are GONE (no phantom NULL-hour row in either dialect)
    hi = scols.index("hour_start")
    assert all(t[hi] is not None for t in s)
    # the 1e12 row (ts 00:50, 'view') sums with the 3.0 view into hour 00
    # EXACTLY in both dialects — the lossy-conversion regime
    vi = scols.index("total_value")
    assert any(t[vi] == 1000000000003.0 for t in s)


def test_session_windows_null_user_and_ts(spark, hostile_dir):
    dcols, scols, d, s = _both(spark, hostile_dir, "streaming_session_windows")
    assert dcols == scols
    assert s == d
    # user 1: the NULL-ts event contributes to NO session -> one session of
    # 2 events; NULL-user rows produce no session at all
    by_user = {}
    ui = scols.index("user_id")
    ni = scols.index("n_events")
    for t in s:
        by_user.setdefault(t[ui], []).append(t[ni])
    assert None not in by_user
    assert by_user[1] == [2]
    assert by_user[2] == [1]


def test_ingest_decimal_double_roundtrip(spark, hostile_dir):
    dcols, scols, d, s = _both(spark, hostile_dir, "streaming_mpp_ingest")
    assert dcols == scols
    assert s == d
    # the 'view' group sums 3.0 + 2.0 + 1e12 + 2.0 across both engines —
    # exactly, through DuckDB's lossy-hugeint regime
    vi = scols.index("total_value")
    ti = scols.index("event_type")
    view = [t for t in s if t[ti] == "view"][0]
    assert view[vi] == 1000000000007.0


def test_duckdb_varchar_roundtrip_is_value_identical_in_exact_regime():
    """The oracle rewrite must be a no-op wherever the old conversion was
    exact — i.e. clean-fixture recorded greens stay representative."""
    con = duckdb.connect()
    for v in ("0.000001", "123.456789", "9007199254.740992", "-42.5"):
        a, b = con.execute(
            f"SELECT CAST(CAST('{v}' AS DECIMAL(38,6)) AS DOUBLE),"
            f" CAST(CAST(CAST('{v}' AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)"
        ).fetchone()
        assert a == b == float(v)
    # and in the lossy regime the round-trip is the CORRECT one
    a, b = con.execute(
        "SELECT CAST(CAST('1000000000003.000000' AS DECIMAL(38,6)) AS DOUBLE),"
        " CAST(CAST(CAST('1000000000003.000000' AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()
    con.close()
    assert b == 1000000000003.0
    assert a != b  # documents WHY the round-trip exists
