"""Pin the ROLLING sf1 verification window (round-10 verdict item 2):
scripts_dev/sf1_verify.py proves a fresh ~30-query batch every round,
disjoint from everything already proven in committed
sf1_verify_r{N}.jsonl artifacts, so coverage accumulates instead of
re-proving the same tail. Coverage CLOSED in round 11: 226/227 proven
(dedup_recall excluded by design — see the exclusion note in the r11
artifact); from round 12 the window re-verifies changed-plan queries
plus a rotating re-proof slice (see sf1_verify.py's budget-math
comment)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_sf1_verify():
    spec = importlib.util.spec_from_file_location(
        "sf1_verify", os.path.join(REPO, "scripts_dev", "sf1_verify.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _proven_before(rnd: int) -> set[str]:
    names: set[str] = set()
    for n in range(1, rnd):
        path = os.path.join(REPO, "scripts_dev", f"sf1_verify_r{n}.jsonl")
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            for ln in fh:
                if ln.strip():
                    rec = json.loads(ln)
                    if rec.get("ok"):
                        names.add(rec["name"])
    return names


def test_current_round_batch_is_fresh_and_large_enough():
    sv = _load_sf1_verify()
    rnd = max(sv.ROUNDS)
    oracle, det, value = sv.ROUNDS[rnd]
    batch = set(oracle) | set(det) | set(value)
    # the rolling window moves: nothing in this round's batch may
    # already be proven by a prior committed artifact
    overlap = batch & _proven_before(rnd)
    assert not overlap, f"round {rnd} re-proves already-proven: {overlap}"
    # freshness budget: ~30 new proofs per round keeps the projected
    # full-coverage round honest
    assert len(batch) >= 30, f"round {rnd} batch too small: {len(batch)}"


def test_all_round_batches_name_real_registry_queries():
    import __spark_entry__ as e

    sv = _load_sf1_verify()
    names = set(e.queries())
    for rnd, (oracle, det, value) in sv.ROUNDS.items():
        batch = set(oracle) | set(det) | set(value)
        unknown = batch - names
        assert not unknown, f"round {rnd} names unknown queries: {unknown}"
        # oracle-mode queries need an oracle_sql entry
        missing = set(oracle) - set(e.oracle_sql())
        assert not missing, f"round {rnd} oracle-mode w/o SQL: {missing}"
