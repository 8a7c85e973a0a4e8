"""Shared harness for the hostile-fixture sweep scripts (review r12:
three sweeps carried identical ~40-line case/runner boilerplate that
would drift on the next fix).

Usage:
    from _hostile_common import Harness
    h = Harness("my sweep label")

    @h.case("case_name")
    def _(spark):
        assert ...

    if __name__ == "__main__":
        h.main()   # runs every case, prints one JSON line, exits 1 on fail

Verdicts per case: "PASS", "FAIL: <assertion>" (the case's contract was
violated), or "ERROR: <type>: <msg>" (the case itself broke — traceback
to stderr). The final stdout line is a single JSON object so a driver or
grep can consume it; progress lines go to stderr.
"""

import json
import sys
import traceback


class Harness:
    def __init__(self, sweep_label: str):
        self.sweep_label = sweep_label
        self.results: dict[str, str] = {}
        self.cases: list = []

    def case(self, name: str):
        def deco(fn):
            def run(spark):
                try:
                    fn(spark)
                    self.results[name] = "PASS"
                except AssertionError as e:
                    self.results[name] = f"FAIL: {e}"
                except Exception as e:
                    self.results[name] = f"ERROR: {type(e).__name__}: {e}"
                    traceback.print_exc(file=sys.stderr)
                print(f"{name}: {self.results[name][:120]}", file=sys.stderr)

            run.case_name = name
            self.cases.append(run)
            return run

        return deco

    def main(self, app_name: str | None = None) -> None:
        from duckdb_mpp_spark.session import get_spark

        spark = get_spark(
            app_name=app_name or self.sweep_label.replace(" ", "-")
        )
        spark.sparkContext.setLogLevel("ERROR")
        for fn in self.cases:
            fn(spark)
        n_fail = sum(1 for v in self.results.values() if v != "PASS")
        print(json.dumps({
            "sweep": self.sweep_label,
            "cases": self.results,
            "n_cases": len(self.results),
            "n_fail": n_fail,
        }))
        sys.exit(1 if n_fail else 0)
