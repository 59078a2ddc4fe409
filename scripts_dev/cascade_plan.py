"""Dump the flagship's harmonised_measurements cascade subplan (the plan
that the final flagship explain truncates behind the localCheckpoint
boundary) — evidence artifact for the r12 single-pass cascade rewrite.

    python scripts_dev/cascade_plan.py [sf_dir] --tag before|after
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    tag = "after"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from pdcm_etl_spark.session import get_spark
    from pdcm_etl_spark.plans.synth import synthesize_provider_modules
    from pdcm_etl_spark.plans.dag import build_metadata_dag

    spark = get_spark("pdcm-etl-cascade-plan")
    raw = synthesize_provider_modules(spark, sf_dir)
    dag = build_metadata_dag(spark, raw)
    # resolve WITHOUT the share boundary: sequential get() of only the
    # cascade node's deps, then call the node fn directly so the returned
    # DataFrame is the raw (pre-localCheckpoint) cascade plan
    node = dag.nodes["harmonised_measurements"]
    args_dfs = [dag.get(d) for d in node.deps]
    df = node.fn(*args_dfs)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12", f"flagship_cascade_{tag}.txt",
    )
    with open(out, "w") as fh:
        fh.write(buf.getvalue())
    print(out)


if __name__ == "__main__":
    main()
