"""Convert an sf1 sweep JSONL into a BENCH_FULL-shaped JSON artifact
(round-7 verdict item 6): the sweep timings become a first-class,
round-over-round-diffable file instead of raw JSONL archaeology.

    python scripts_dev/sweep_to_bench.py <sweep.jsonl> <out.json> [sf]
"""

import json
import sys


def main() -> None:
    src = sys.argv[1]
    dst = sys.argv[2]
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    queries = {}
    skipped = {}
    with open(src) as fh:
        for ln in fh:
            if not ln.strip():
                continue
            rec = json.loads(ln)
            if rec["status"] == "OK":
                queries[rec["name"]] = rec["sec"]
            else:
                skipped[rec["name"]] = rec["status"]
    out = {
        "metric": "full_registry_sf1_wall_seconds",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_ok": len(queries),
        "skipped": skipped,
    }
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(f"{dst}: {len(queries)} ok, {len(skipped)} skipped, "
          f"total {out['value']}s")


if __name__ == "__main__":
    main()
