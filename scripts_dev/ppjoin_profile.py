"""PPJoin candidate-accounting profile (round-9 verdict ask 2).

Runs dedup_prefix_filter's exact shape with the operator's
``Observation`` hooks attached and commits the candidate:output ratio
as a JSONL artifact instead of a docstring claim:

    python scripts_dev/ppjoin_profile.py /root/testdata/sf0.1 \
        scripts_dev/ppjoin_profile_r9.jsonl

Fields per row:
  * n_raw_pairs      — pairs out of the prefix buckets after the length
                       filter, counted once PER SHARED PREFIX TOKEN
                       (pre-dedup multiplicity — what the r8 shape sent
                       into the pair-distinct);
  * n_distinct_pairs — DISTINCT pairs after the pair groupBy, BEFORE
                       the positional filter (r10: the honest
                       denominator for the positional filter's marginal
                       cut — the old .distinct() already removed the
                       multiplicity n_raw_pairs counts);
  * n_candidates     — pairs entering verification AFTER the positional
                       filter (the r9 shape's verify-join input);
  * n_output         — verified pairs (Jaccard ≥ t ground truth);
  * bucket_pair_cut  — 1 − n_candidates / n_raw_pairs (was misnamed
                       positional_cut through r9 — it conflates the
                       dedup and the positional filter);
  * positional_cut   — 1 − n_candidates / n_distinct_pairs (the
                       filter's true marginal pruning);
  * cand_per_out     — n_candidates / n_output (1.0 = the exact-join
                       optimum: every verified pair was a true dup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else (
        "scripts_dev/ppjoin_profile_r9.jsonl"
    )
    from pyspark.sql import Observation

    from pdcm_etl_spark.operators import dedup
    from pdcm_etl_spark.session import get_spark

    spark = get_spark("ppjoin-profile")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sh = dedup.shingles(docs, n=3)
    raw_obs, cand_obs, pre_obs = Observation(), Observation(), Observation()
    t0 = time.time()
    pairs = dedup.prefix_filter_pairs(
        sh,
        min_ppm=300_000,
        candidate_observation=cand_obs,
        raw_observation=raw_obs,
        prefilter_observation=pre_obs,
    )
    n_out = pairs.count()
    wall = round(time.time() - t0, 1)
    n_raw = raw_obs.get["n_raw_pairs"]
    n_cand = cand_obs.get["n_candidates"]
    n_pre = pre_obs.get["n_distinct_pairs"]
    rec = {
        "sf_dir": sf_dir,
        "n_raw_pairs": n_raw,
        "n_distinct_pairs": n_pre,
        "n_candidates": n_cand,
        "n_output": n_out,
        "bucket_pair_cut": round(1 - n_cand / n_raw, 4) if n_raw else None,
        "positional_cut": round(1 - n_cand / n_pre, 4) if n_pre else None,
        "cand_per_out": round(n_cand / n_out, 3) if n_out else None,
        "wall_sec": wall,
    }
    print(json.dumps(rec), flush=True)
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
