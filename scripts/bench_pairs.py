"""Reproducible Spark-vs-DuckDB comparison protocol (VERDICT r4 #1).

The box has ±25% run-to-run noise on suite totals, so ANY single pair is
an unreliable estimator — r4's matched pairs ranged 1.93×–2.40× on
identical code depending on who measured when. This script pins the
protocol so any party re-running it computes the same *kind* of number
and sees the spread instead of one sample from it:

  for i in 1..N:                      # N back-to-back matched pairs
      bench.py           (Spark; warm pass + min-of-2 per query)
      scripts/duck_bench.py (DuckDB; same methodology, same oracle SQL)

Estimators reported, most- to least-conservative:
  * ``pair_ratios`` + ``ratio_range`` — each pair's comparable-total
    ratio; the honest headline is this RANGE, not its best element.
  * ``ratio_perquery_min`` — per-query min across all runs of each
    engine; converges as N grows but flatters both engines equally.
  * ``corpus_ratio_*`` — the same two estimators over the corpus-scale
    subset (queries where DuckDB itself needs ≥ 0.3 s) — the regime
    whose ratio extrapolates to 100 TB (fixed per-job scheduling
    overhead amortizes to zero there).

Usage: python scripts/bench_pairs.py [N]   (default 3; ~4 min/pair)
Prints one JSON line; SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS respected.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CORPUS_SCALE_DUCK_SEC = 0.3


def _run_json(cmd: list[str]) -> dict:
    try:
        out = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, check=True
        ).stdout
    except subprocess.CalledProcessError as e:
        # surface the child's actual error — a bare "exit status 1" after
        # minutes of completed pairs is undiagnosable
        sys.stderr.write(e.stderr or "")
        raise
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from {cmd}")


def _sum_ratio(keys, spark_q: dict, duck_q: dict) -> float | None:
    """sum(spark)/sum(duck) over ``keys``; None when the subset is empty
    or the DuckDB side sums to zero (tiny fixtures) — never a crash after
    minutes of completed measurement."""
    if not keys:
        return None
    dt = sum(duck_q[q] for q in keys)
    if dt <= 0:
        return None
    return round(sum(spark_q[q] for q in keys) / dt, 3)


def _rng(vals):
    vals = [v for v in vals if v is not None]
    return [min(vals), max(vals)] if vals else None


def main() -> None:
    n_pairs = max(int(sys.argv[1]) if len(sys.argv) > 1 else 3, 1)
    spark_runs, duck_runs = [], []
    for i in range(n_pairs):
        spark_runs.append(_run_json([sys.executable, "bench.py"]))
        duck_runs.append(_run_json([sys.executable, "scripts/duck_bench.py"]))
        print(f"pair {i + 1}/{n_pairs} done", file=sys.stderr)

    # intersect across ALL runs, not just run 0 (ADVICE r5): a gate that
    # errored or was skipped mid-protocol must narrow the comparable set,
    # not KeyError away minutes of completed measurement
    comparable = sorted(
        set.intersection(
            *(set(r["queries"]) for r in spark_runs + duck_runs)
        )
    )
    s_min = {q: min(r["queries"][q] for r in spark_runs) for q in comparable}
    d_min = {q: min(r["queries"][q] for r in duck_runs) for q in comparable}
    corpus = [q for q in comparable if d_min[q] >= CORPUS_SCALE_DUCK_SEC]

    pair_ratios = [
        _sum_ratio(comparable, s["queries"], d["queries"])
        for s, d in zip(spark_runs, duck_runs)
    ]
    corpus_pairs = [
        _sum_ratio(corpus, s["queries"], d["queries"])
        for s, d in zip(spark_runs, duck_runs)
    ]

    # Stalled-leg guard (VERDICT r9 #3): the box's known measurement
    # pathology is a UNIFORM whole-leg slowdown (a session-wide stall
    # inflating every query of one Spark run ~15-40%, not a per-query
    # regression). Flag any Spark leg whose comparable-suite total
    # exceeds the session's best Spark leg by >25% — the number is KEPT
    # (raw_runs stays complete) but the pair is labeled, so the headline
    # range separates clean measurement from known pathology instead of
    # silently absorbing it. Symmetric check for DuckDB legs.
    def leg_totals(runs):
        return [sum(r["queries"][q] for q in comparable) for r in runs]

    s_tot, d_tot = leg_totals(spark_runs), leg_totals(duck_runs)
    stalled = [
        i
        for i in range(n_pairs)
        if s_tot[i] > 1.25 * min(s_tot) or d_tot[i] > 1.25 * min(d_tot)
    ]
    clean_ratios = [r for i, r in enumerate(pair_ratios) if i not in stalled]

    print(json.dumps({
        "protocol": f"{n_pairs} back-to-back matched pairs, warm min-of-2 both engines",
        "n_comparable": len(comparable),
        "pair_ratios": pair_ratios,
        "ratio_range": _rng(pair_ratios),
        "stalled_pairs": stalled,
        "stall_rule": "leg's comparable-suite total > 1.25x the session's best same-engine leg",
        "spark_leg_totals": [round(t, 2) for t in s_tot],
        "duck_leg_totals": [round(t, 2) for t in d_tot],
        "clean_pair_ratios": clean_ratios,
        "clean_ratio_range": _rng(clean_ratios),
        "ratio_perquery_min": _sum_ratio(comparable, s_min, d_min),
        "spark_total_perquery_min": round(sum(s_min.values()), 2),
        "duck_total_perquery_min": round(sum(d_min.values()), 2),
        "corpus_subset": corpus,
        "corpus_pair_ratios": corpus_pairs,
        "corpus_ratio_range": _rng(corpus_pairs),
        "corpus_ratio_perquery_min": _sum_ratio(corpus, s_min, d_min),
        "worst_fixed_overhead": sorted(
            ((q, round(s_min[q] / max(d_min[q], 1e-4), 1)) for q in comparable),
            key=lambda kv: -kv[1],
        )[:5],
        # raw per-run query timings — the auditable artifact (VERDICT r5
        # #1b): any party can recompute every estimator above from these
        "raw_runs": {
            "spark": [r["queries"] for r in spark_runs],
            "duck": [r["queries"] for r in duck_runs],
        },
    }))


if __name__ == "__main__":
    main()
