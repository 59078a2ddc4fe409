"""Repeated-subtree audit (guide §7.2): for every registry query, build
the plan at the given sf_dir and count per-table `Scan parquet`
occurrences plus Exchanges. A table scanned k>1 times inside one plan is
a candidate for compute-once sharing (operators/dedup.py::_shared) —
Catalyst does not CSE repeated subtrees and ReusedExchange only fires on
byte-identical exchange subplans.

    python scripts_dev/scan_count_sweep.py [sf_dir] [out_jsonl]

Build-only (explain, no execution) except for operators that execute
jobs during plan construction (iterative fixpoints) — those still
terminate; the sweep caps nothing.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scan_sweep.jsonl"

    from pdcm_etl_spark.session import get_spark

    spark = get_spark("pdcm-etl-scansweep")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    with open(out, "w") as fh:
        for name, fn in queries.items():
            row: dict = {"query": name}
            try:
                df = fn(spark, sf_dir)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain(mode="formatted")
                s = buf.getvalue()
                scans: dict[str, int] = {}
                for m in re.finditer(r"file:[^\s\]]*/(\w+)\.parquet", s):
                    t = m.group(1)
                    scans[t] = scans.get(t, 0) + 1
                row["scans"] = scans
                row["repeated"] = {t: c for t, c in scans.items() if c > 1}
                row["exchanges"] = len(re.findall(r"\(\d+\) Exchange", s))
                row["existing_rdd"] = s.count("Scan ExistingRDD")
            except Exception as exc:
                row["error"] = str(exc)[:200]
            fh.write(json.dumps(row) + "\n")
            fh.flush()
    print("wrote", out)


if __name__ == "__main__":
    main()
