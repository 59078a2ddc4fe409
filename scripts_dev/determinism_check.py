"""Spark-vs-Spark determinism screen: run every registry query TWICE
(fresh plan each time) on the same session and compare canonical value
hashes. Catches order-dependent results the oracle gate can miss — the
oracle compare is one sample per run, so a nondeterministic query can
go green by luck (that is exactly how spearman_corr's row_number()
tie-break over duplicate lineitem ids survived rounds 5-6 until a
second in-session run hashed differently).

Runs at sf0.1 by default: more rows → more ties → more exposure than
the sf0.01 gate. Usage:
    python scripts_dev/determinism_check.py [sf_dir] [only,names]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts_dev.gate_sim import canon_df  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from pdcm_etl_spark.session import get_spark

    spark = get_spark("determinism_check")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    names = [n for n in qs if only is None or n in only]
    bad, errs = [], []
    for name in names:
        t0 = time.time()
        try:
            h1, _, _ = canon_df(qs[name](spark, sf_dir).toPandas())
            h2, _, _ = canon_df(qs[name](spark, sf_dir).toPandas())
            tag = "PASS" if h1 == h2 else "NONDETERMINISTIC"
            if h1 != h2:
                bad.append(name)
        except Exception as e:  # noqa: BLE001
            tag = f"ERR {type(e).__name__}: {e}"[:120]
            errs.append(name)
        print(f"{tag:18} {name:30} {time.time() - t0:6.1f}s", flush=True)
    print(f"\n{len(names) - len(bad) - len(errs)}/{len(names)} stable;"
          f" nondeterministic: {bad}; errors: {errs}")
    spark.stop()


if __name__ == "__main__":
    main()
