"""Verify NAMED gates against their DuckDB oracles (driver_sim's compare,
restricted to a list — the per-change correctness loop of the optimization
rounds). Usage: python scripts/gate_check.py name [name ...]
Env: MPP_TEST_SF_DIR (default /root/testdata/sf0.01)."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from duckdb_mpp_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="gate-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()

    def norm(v):
        if isinstance(v, float) and not math.isnan(v):
            return round(v, 9)
        return v

    def key(t):
        return tuple((x is None, str(type(x)), str(x)) for x in t)

    bad = []
    for name in names:
        sdf = qs[name](spark, sf)
        scols = sorted(sdf.columns)
        s = sorted([tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=key)
        res = con.execute(osql[name])
        cols = [d[0] for d in res.description]
        idx = [cols.index(c) for c in sorted(cols)]
        d = sorted([tuple(norm(r[j]) for j in idx) for r in res.fetchall()], key=key)
        ok = sorted(cols) == scols and s == d
        print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(s)}/{len(d)}", flush=True)
        if not ok:
            bad.append(name)
            for i, (a, b) in enumerate(zip(s, d)):
                if a != b:
                    print("  first diff:", a, "vs", b)
                    break
    print("FAILURES:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
