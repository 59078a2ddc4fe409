"""Run one registry query against the noop sink and dump the SQL-tab
per-operator metrics (node name + key metrics) for every execution,
heaviest first — operator-level attribution the stage view can't give.

    python scripts_dev/sql_node_metrics.py [sf_dir] <query> [--top N]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read())


def _ms(v: str) -> float:
    """Parse a spark metric value like '1.2 s', '345 ms', '2.1 m'."""
    v = v.strip()
    try:
        if v.endswith(" ms"):
            return float(v[:-3].replace(",", ""))
        if v.endswith(" s"):
            return float(v[:-2].replace(",", "")) * 1000
        if v.endswith(" m"):
            return float(v[:-2].replace(",", "")) * 60000
    except ValueError:
        return 0.0
    return 0.0


def main() -> None:
    args = list(sys.argv[1:])
    top = 25
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    name = args[0]

    from pdcm_etl_spark.session import get_spark

    spark = get_spark(
        "pdcm-etl-sqlmetrics", extra_conf={"spark.ui.enabled": "true"}
    )
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    # warmup at sf0.001 for codegen, then one real run
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        try:
            fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.sparkContext.setJobDescription(f"sqlmetrics:{name}")
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()

    rows = []
    for q in _rest(spark, "sql?details=true&planDescription=false&length=1000"):
        for node in q.get("nodes", []):
            mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
            t = 0.0
            # generic: take max over any metric that parses as a duration
            for k, v in mets.items():
                if "total (min, med, max" in k or "time" in k:
                    # values may look like 'total (min, med, max (stageId: taskId))\n1.2 s (...)'
                    first = v.split("(")[0]
                    t = max(t, _ms(first))
            interesting = {
                k: v.split("\n")[0]
                for k, v in mets.items()
                if any(s in k for s in ("time", "rows", "spill", "data size",
                                        "shuffle bytes", "files read",
                                        "bytes read"))
            }
            rows.append(
                (t, q["id"], node["nodeId"], node["nodeName"], interesting)
            )
    rows.sort(key=lambda r: -r[0])
    for t, qid, nid, nm, mets in rows[:top]:
        print(f"[{t/1000:8.1f}s] sql={qid} node={nid} {nm}")
        for k, v in sorted(mets.items()):
            print(f"      {k}: {v}")


if __name__ == "__main__":
    main()
