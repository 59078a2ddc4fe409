"""Full-registry physical-plan-shape regression (round-7 verdict item 2).

~75 hand-written pins in test_plan_shapes.py cover the riskiest plans;
this snapshot covers EVERYTHING: each registry query's plan is reduced
to a volatile-free fingerprint (exchange counts, join-strategy multiset,
Python-boundary count, scan pushdown flags — plans/audit.py::
plan_fingerprint) and compared against the committed snapshot. A lost
broadcast, a new shuffle, or a Python UDF creeping into a scalar path
fails HERE with a one-line refresh path:

    python scripts_dev/refresh_fingerprints.py

after which the JSON diff is the review artifact for the intentional
plan change.
"""

import json
import os


def test_registry_plan_fingerprints_match_snapshot(spark, sf_dir):
    import __spark_entry__ as e
    from pdcm_etl_spark.plans.audit import plan_fingerprint

    path = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")
    with open(path) as fh:
        snapshot = json.load(fh)

    qs = e.queries()
    missing = sorted(set(qs) - set(snapshot))
    stale = sorted(set(snapshot) - set(qs))
    assert not missing and not stale, (
        f"snapshot out of date (missing={missing}, stale={stale}); "
        "refresh: python scripts_dev/refresh_fingerprints.py"
    )

    drifted = {}
    for name, fn in qs.items():
        try:
            got = plan_fingerprint(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — surface as drift
            got = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        if got != snapshot[name]:
            drifted[name] = {"want": snapshot[name], "got": got}
    assert not drifted, (
        f"{len(drifted)} plan fingerprints drifted "
        "(refresh after an INTENTIONAL change: "
        "python scripts_dev/refresh_fingerprints.py):\n"
        + json.dumps(drifted, indent=1, sort_keys=True)
    )
