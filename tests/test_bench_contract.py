"""Driver bench contract (VERDICT r11 #1).

The round driver tail-captures the LAST 2,000 chars of bench.py stdout and
json-parses the final line. r11 lost its bench record because sweep_diag
was inlined into that line and pushed it past the window (`parsed: null`
in BENCH_r11.json). These tests pin the contract:

  1. the final-line dict round-trips through json.loads standalone;
  2. with 40 synthetic query timings (more than the real 42-query suite
     ever emits at realistic name lengths) the serialized line stays
     under 1,800 chars, leaving 200 chars of driver-capture slack;
  3. diag payloads never appear in the final line.
"""

import json

import bench


def _synthetic_timings(n: int = 40) -> dict[str, float]:
    # names pinned at 27 chars = the longest real key
    # ("text_contamination_overlap"); the real suite is 37 queries
    # averaging 19 chars, so 40 x 27 is strictly harsher than reality
    return {f"synthetic_query_padded_x_{i:02d}": round(0.1234 + i, 4)
            for i in range(n)}


def test_final_line_parses_and_fits_driver_tail():
    d = bench.build_final_line(
        _synthetic_timings(40), "0.1", [25.6054, 25.5501], False
    )
    # same compact separators main() prints with
    line = json.dumps(d, separators=(",", ":"))
    assert json.loads(line) == d
    assert len(line) < 1800, f"final line {len(line)} chars >= 1800"
    assert all(len(k) == 27 for k in d["queries"])


def test_real_suite_final_line_fits_driver_tail():
    # the actual emission: every HEADLINE name + the six bench_mpp_split
    # keys, worst-case 4-decimal timings
    names = bench.HEADLINE + [
        "mpp_bucketed_insert", "mpp_pruned_scan", "mpp_update",
        "mpp_upsert", "mpp_zonemap_scan", "mpp_colocated_join",
    ]
    d = bench.build_final_line(
        {n: 123.4567 for n in names}, "0.1", [125.6054, 125.5501], True
    )
    line = json.dumps(d, separators=(",", ":"))
    assert json.loads(line) == d
    assert len(line) < 1800


def test_final_line_has_headline_fields_and_no_diag():
    d = bench.build_final_line(_synthetic_timings(5), "0.01", [1.0, 1.1], True)
    assert d["metric"] == "headline_suite_wall_sec"
    assert d["unit"] == "sec"
    assert d["stall_suspected"] is True
    assert d["sf"] == 0.01
    assert abs(d["value"] - sum(_synthetic_timings(5).values())) < 1e-6
    assert "sweep_diag" not in d
    # the stall rule stays one short line, not prose
    assert len(d["stall_rule"]) < 80


def test_nonnumeric_sf_passes_through():
    d = bench.build_final_line(_synthetic_timings(1), "custom", [0.1, 0.1], False)
    assert d["sf"] == "custom"


def test_bench_pairs_merges_diag_line_back_into_run():
    # review r12: moving sweep_diag out of the final JSON line must not
    # starve bench_pairs' stall classifier — _run_json re-merges the
    # labeled BENCH_DIAG line into the parsed run dict
    import importlib.util
    import os
    import sys

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_pairs", os.path.join(repo, "scripts", "bench_pairs.py")
    )
    bp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bp)
    child = (
        "import json;"
        "print('BENCH_DIAG: ' + json.dumps({'sweep_diag': [{'wall_s': 1.5,"
        " 'steal_s': 0.2}]}));"
        "print(json.dumps({'metric': 'm', 'queries': {},"
        " 'sweep_totals': [1.0, 1.1], 'stall_suspected': False}))"
    )
    run = bp._run_json([sys.executable, "-c", child])
    assert run["metric"] == "m"
    assert run["sweep_diag"] == [{"wall_s": 1.5, "steal_s": 0.2}]
    # and _leg_diag can build evidence from the merged dict again
    diag = bp._leg_diag(run)
    assert diag["wall_s"] == 1.5 and diag["steal_s"] == 0.2


def test_bench_pairs_distinguishes_missing_diag_from_all_stalled():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_pairs2", os.path.join(repo, "scripts", "bench_pairs.py")
    )
    bp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bp)
    assert bp._classify_stalls([], [{}, {}, {}]) == {
        "note": "no diag captured in any leg"
    }
    got = bp._classify_stalls([0, 1], [{"gc_share": 1}, {"gc_share": 1}])
    assert got == {"note": "no clean leg to compare against"}
