"""Simulate the driver's correctness gate: run the first N priority-ordered
queries() entries against their DuckDB oracles at sf0.01 (the driver's
scale) and report mismatches. Usage: python scripts/driver_sim.py [N]."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from duckdb_mpp_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="driver-sim", shuffle_partitions=8)
    print("entry rows:", len(E.entry(spark).collect()), flush=True)
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
    for i, (name, fn) in enumerate(list(qs.items())[:n]):
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf)
            scols = sorted(sdf.columns)
            s = sorted(
                [tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=key
            )
            if name not in osql:
                print(f"[{i}] {name}: NO ORACLE rows={len(s)}", flush=True)
                continue
            res = con.execute(osql[name])
            cols = [d[0] for d in res.description]
            idx = [cols.index(c) for c in sorted(cols)]
            d = sorted(
                [tuple(norm(r[j]) for j in idx) for r in res.fetchall()], key=key
            )
            ok = sorted(cols) == scols and s == d
            dt = time.perf_counter() - t0
            print(f"[{i}] {name}: {'OK' if ok else 'MISMATCH'} "
                  f"rows={len(s)}/{len(d)} {dt:.1f}s", flush=True)
            if not ok:
                bad.append(name)
                if sorted(cols) != scols:
                    print(f"    cols {scols} vs {sorted(cols)}", flush=True)
                else:
                    diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
                    print(f"    first diffs: {diff}", flush=True)
        except Exception as e:
            bad.append(name)
            print(f"[{i}] {name}: ERROR {type(e).__name__}: {e}", flush=True)
    print("FAILURES:", bad or "none", flush=True)


if __name__ == "__main__":
    main()
