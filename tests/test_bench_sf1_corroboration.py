"""Cross-round trajectory corroboration for bench_sf1 (VERDICT r12 #3).

The r12 lesson being codified: BENCH_SF1_r11's DuckDB 30x legs were
hypervisor-steal-inflated 3-14x and sat in the record for a round because
the only consistency check was a human comparing against r10 by hand.
bench_sf1.corroborate() now compares every timing LEG of a new result
against the cross-round median of the same leg and loudly annotates >2x
divergence; these tests pin the leg extraction, the suffix matching that
bridges the r10/r12 section-nesting difference, the divergence rule with
its sub-floor exemption, the uncorroborated-new-row path, and that the
repo's real BENCH_SF1_r*.json history parses.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench_sf1", os.path.join(REPO, "scripts", "bench_sf1.py")
)
bench_sf1 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_sf1)


# --- leg extraction -----------------------------------------------------------

def test_leg_leaves_extracts_engine_dicts_probes_and_sec_scalars():
    doc = {
        "sf0.1": {
            "spark": {"g1": 1.5, "g2": 0.4},
            "duckdb": {"g1": 0.3},
            "ratio": {"g1": 5.0},  # derived, never a leg
        },
        "x30": {
            "duckdb_index_probe_dedup_incremental": 0.675,
            "replicas": 30,  # counter, not a leg
        },
        "x100_incremental": {"spark_daily_run_sec": 3.725},  # r10 style
        "steal_share_by_section": {"docs": 0.01},  # instrumentation, not a leg
        "history_rounds": [8, 9],  # lists never walked
    }
    legs = dict(bench_sf1._leg_leaves(doc))
    keys = {bench_sf1._leg_key(p) for p in legs}
    assert keys == {
        "sf0.1/spark/g1",
        "sf0.1/spark/g2",
        "sf0.1/duckdb/g1",
        "x30/duckdb_index_probe_dedup_incremental",
        "x100_incremental/spark_daily_run_sec",
    }
    assert legs[("sf0.1", "spark", "g1")] == 1.5


def test_leg_key_suffix_bridges_r10_nesting():
    # r10 nested the docs section under 'docs_1x_10x'; r12+ puts the scale
    # labels at top level — the leg identity must match across both.
    r10_path = ("docs_1x_10x", "sf0.1", "spark", "dedup_ngram_jaccard")
    r12_path = ("sf0.1", "spark", "dedup_ngram_jaccard")
    assert bench_sf1._leg_key(r10_path) == bench_sf1._leg_key(r12_path)


def test_corroboration_report_is_not_reharvested_as_legs():
    # A prior round's embedded corroboration report (divergent rows carry
    # 'value'/'median_prior' floats) must not be mistaken for timing legs
    # when that round is loaded as history.
    doc = {
        "corroboration": {
            "checked": 40,
            "divergent": {
                "sf3_30x/duckdb/g1": {"value": 9.9, "median_prior": 1.0, "n_prior": 3}
            },
        }
    }
    assert list(bench_sf1._leg_leaves(doc)) == []


# --- divergence rule ----------------------------------------------------------

def _hist(*vals, key=("sf3_30x", "duckdb", "g1")):
    """history docs each holding one value for the same leg"""
    docs = {}
    for i, v in enumerate(vals):
        docs[8 + i] = {key[0]: {key[1]: {key[2]: v}}}
    return docs


def test_divergent_leg_flagged_against_median():
    # the r11 contamination shape: duck leg 1.897 vs 0.130/0.143 siblings
    new = {"sf3_30x": {"duckdb": {"g1": 1.897}}}
    rep = bench_sf1.corroborate(new, _hist(0.130, 0.143))
    assert not rep["ok"]
    row = rep["divergent"]["sf3_30x/duckdb/g1"]
    assert row["value"] == 1.897
    assert row["n_prior"] == 2
    assert abs(row["median_prior"] - 0.1365) < 1e-3  # report rounds to 3 dp


def test_within_factor_two_is_ok():
    new = {"sf3_30x": {"duckdb": {"g1": 0.25}}}
    rep = bench_sf1.corroborate(new, _hist(0.130, 0.143))
    assert rep["ok"] and rep["checked"] == 1


def test_subfloor_legs_exempt():
    # a 0.03 s vs 0.09 s median is >2x off but both sides are under the
    # 0.2 s floor — scheduling noise, not trajectory evidence
    new = {"sf0.1": {"duckdb": {"g1": 0.03}}}
    rep = bench_sf1.corroborate(new, _hist(0.09, 0.10, key=("sf0.1", "duckdb", "g1")))
    assert rep["ok"]
    # but a drop FROM above the floor still flags (median side clears it)
    new2 = {"sf0.1": {"duckdb": {"g1": 0.03}}}
    rep2 = bench_sf1.corroborate(new2, _hist(0.5, 0.6, key=("sf0.1", "duckdb", "g1")))
    assert not rep2["ok"]


def test_new_leg_is_uncorroborated_not_divergent():
    new = {"x100_substring_spans": {"spark": {"dedup_substring_spans": 9.0}}}
    rep = bench_sf1.corroborate(new, _hist(0.130))
    assert rep["ok"]
    assert rep["uncorroborated"] == [
        "x100_substring_spans/spark/dedup_substring_spans"
    ]


# --- real history + probes ----------------------------------------------------

def test_repo_history_loads_and_covers_known_rounds():
    hist = bench_sf1.load_history()
    assert {10, 11, 12} <= set(hist)
    # the r11 contamination must be visible to the checker: the r11 30x
    # sessionization duck leg sits >2x above the cross-round median of the
    # r10+r12 legs (the exact row the retroactive correction adjudicated)
    legs = {}
    for rnd, doc in hist.items():
        for path, v in bench_sf1._leg_leaves(doc):
            legs.setdefault(bench_sf1._leg_key(path), {})[rnd] = v
    key = "sf3_30x/duckdb/events_sessionization"
    assert key in legs and 11 in legs[key]
    others = [v for r, v in legs[key].items() if r != 11]
    assert others and legs[key][11] > 2 * sorted(others)[len(others) // 2]


def test_steal_probe_share_bounded():
    import time

    p = bench_sf1.StealProbe()
    # window must dwarf the 10 ms /proc/stat tick quantum, or a single
    # steal tick landing inside a few-ms window computes share > 1 and
    # the test flakes on exactly the steal-prone hosts it matters on
    time.sleep(0.3)
    share = p.share()
    assert share is None or 0.0 <= share <= 1.0


def test_fixture_ambiguous_history_doc_dropped_per_document():
    # review r13 (refined): a key duplicated across two sections of ONE
    # history document (the r8/r10 duplicate-section shape) cannot name a
    # fixture IN THAT DOCUMENT — its values drop from the harvest, but
    # other rounds' unambiguous values still corroborate
    hist = {
        8: {
            "sf0.1": {"duckdb": {"g1": 0.1}},
            "fixed_overhead_1x_10x_30x": {"sf0.1": {"duckdb": {"g1": 5.0}}},
        },
        11: {"sf0.1": {"duckdb": {"g1": 0.30}}},
        12: {"sf0.1": {"duckdb": {"g1": 0.32}}},
    }
    new = {"sf0.1": {"duckdb": {"g1": 0.31}}}
    rep = bench_sf1.corroborate(new, hist)
    assert rep["history_dropped"] == {"sf0.1/duckdb/g1": [8]}
    assert rep["checked"] == 1 and rep["ok"]
    # neither of r8's conflicting values polluted the median: 5.0 in the
    # pool would flag 0.31 divergent against median 0.66
    assert "sf0.1/duckdb/g1" not in rep["divergent"]


def test_duplicate_key_in_new_result_is_uncheckable():
    hist = {11: {"sf0.1": {"duckdb": {"g1": 0.30}}}}
    new = {
        "sf0.1": {"duckdb": {"g1": 0.31}},
        "other_section": {"sf0.1": {"duckdb": {"g1": 9.9}}},
    }
    rep = bench_sf1.corroborate(new, hist)
    assert rep["ambiguous"] == ["sf0.1/duckdb/g1"]
    assert rep["checked"] == 0 and rep["ok"]
