"""Model-based test of the snapshot-commit storage layer.

A random (seeded) sequence of insert / update / delete / upsert / compact /
vacuum operations runs against a DistributedTable while a plain Python dict
{key: value} executes the same semantics. After every operation the scan
must equal the model exactly, and the history of models must stay readable
via time travel until vacuum prunes it. This guards the commit protocol's
end-to-end invariant — every committed snapshot is exactly one model state —
independently of the per-operation unit tests.
"""

import random

import pytest

from duckdb_mpp_spark import dml


def _scan_dict(tbl):
    return {r["k"]: r["v"] for r in tbl.scan().collect()}


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, k % 5, v) for k, v in rows], "k INT, grp INT, v INT"
    )


@pytest.mark.parametrize("seed", [7, 23, 91, 137, 404])
def test_random_op_sequence_matches_model(spark, mpp, seed):
    rng = random.Random(seed)
    tbl = mpp.create_distributed_table(
        f"sm_{seed}", "k INT, grp INT, v INT", "grp", 3
    )
    model: dict[int, int] = {}
    history: list[dict[int, int]] = []  # model state per committed version
    next_key = 0

    for step in range(14):
        op = rng.choice(["insert", "insert", "update", "delete", "upsert", "compact"])
        if op == "insert":
            rows = [(next_key + i, rng.randrange(100)) for i in range(rng.randint(1, 5))]
            next_key += len(rows)
            n = tbl.insert(_df(spark, rows))
            assert n == len(rows)
            model.update(rows)
            history.append(dict(model))
        elif op == "update" and model:
            cut = rng.choice(sorted(model))
            n = dml.update(tbl, {"v": "v + 1000"}, f"k >= {cut}")
            want = sum(1 for k in model if k >= cut)
            assert n == want
            for k in model:
                if k >= cut:
                    model[k] += 1000
            if n:
                history.append(dict(model))
        elif op == "delete" and model:
            cut = rng.choice(sorted(model))
            n = dml.delete(tbl, f"k = {cut}")
            assert n == 1
            del model[cut]
            history.append(dict(model))
        elif op == "upsert":
            # mix of existing keys (replace) and brand-new ones (append)
            keys = rng.sample(sorted(model), min(len(model), 2)) if model else []
            keys += [next_key]
            next_key += 1
            rows = [(k, rng.randrange(100)) for k in keys]
            n = dml.upsert(tbl, _df(spark, rows), ["grp", "k"])
            assert n == len(rows)
            model.update(rows)
            history.append(dict(model))
        elif op == "compact" and model:
            if tbl.compact() > 0:
                history.append(dict(model))
        assert _scan_dict(tbl) == model, f"seed={seed} step={step} op={op}"

    # every committed version replays to exactly one historical model state
    hist = tbl.history()
    assert len(hist) == len(history)
    for (version, _nf, nrows), want in zip(hist, history):
        got = {r["k"]: r["v"] for r in tbl.scan(version=version).collect()}
        assert got == want and nrows == len(want)

    # vacuum to the head: live content intact, old versions pruned
    tbl.vacuum()
    assert _scan_dict(tbl) == model
    assert len(tbl.history()) == 1
