"""Capture explain("formatted") for named registry queries (no timing).

    python scripts_dev/capture_plans.py [sf_dir] --tag before q1 q2 ...

Writes plans/r12/<query>_<tag>.txt. Plan shape is load-independent, so
this can run while other work occupies the machine; timed profiling is
scripts_dev/profile_queries.py.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = args

    from pdcm_etl_spark.session import get_spark

    spark = get_spark("pdcm-etl-capture-plans")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"{name}: unknown", flush=True)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"{name}: {path}", flush=True)
        except Exception as exc:
            print(f"{name}: ERROR {exc}", flush=True)


if __name__ == "__main__":
    main()
