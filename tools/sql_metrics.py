#!/usr/bin/env python
"""Per-operator metrics for one query execution, from the UI's SQL endpoint —
maps seconds to physical operators (the SQL-tab view, scriptable).

Usage: python tools/sql_metrics.py [--sf DIR] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("name")
    args = ap.parse_args()

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("sql_metrics")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    qs[args.name](spark, args.sf).write.format("noop").mode("overwrite").save()
    execs = rest("sql?details=true&planDescription=false&length=200")
    # take ALL executions of this run (a query with driver-side loop actions
    # has many) and aggregate operator time across them
    for e in execs:
        nodes = e.get("nodes", [])
        interesting = []
        for n in nodes:
            m = {mm["name"]: mm["value"] for mm in n.get("metrics", [])}
            t = None
            for key in ("time in aggregation build total (min, med, max (stageId: taskId))",):
                pass
            # pick any metric that looks like a time total
            times = {k: v for k, v in m.items() if "time" in k.lower()}
            rows = m.get("number of output rows")
            interesting.append((n["nodeId"], n["nodeName"], rows, times))
        dur = e.get("duration", 0)
        print(f"\n== execution {e['id']}: {e.get('status')} duration {dur} ms  "
              f"({len(nodes)} nodes) desc={e.get('description','')[:60]}")
        for nid, nname, rows, times in interesting:
            tstr = "; ".join(f"{k.split('(')[0].strip()}={v}" for k, v in times.items())
            if tstr or (rows is not None):
                print(f"  [{nid:>3}] {nname[:40]:<40} rows={rows} {tstr[:140]}")


if __name__ == "__main__":
    main()
