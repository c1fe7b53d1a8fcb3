#!/usr/bin/env python
"""Per-query runtime breakdown: build time, execution wall time, and the
job/stage decomposition from the status tracker REST API — the r10 measure
step (guide §1.1) for deciding whether a query's seconds are plan build,
stage-scheduling latency, or real executor compute.

Usage: python tools/profile_query.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    # prime the session (JIT, codegen cache, parquet footer cache)
    qs["report_group_avg"](spark, args.sf).write.format("noop").mode("overwrite").save()

    for name in args.names:
        # warm run first (uncounted), like bench.py's prime
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()

        jobs_before = {j["jobId"] for j in rest("jobs")}
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()

        jobs = [j for j in rest("jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = {s["stageId"]: s for s in rest("stages") if s["stageId"] in stage_ids}
        print(f"\n### {name}: build {t1-t0:.2f}s  exec {t2-t1:.2f}s  "
              f"({len(jobs)} jobs, {len(stage_ids)} stages)")
        for j in jobs:
            sub = j.get("submissionTime", "")
            dur = ""
            if j.get("completionTime") and j.get("submissionTime"):
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    d = (datetime.strptime(j["completionTime"], fmt)
                         - datetime.strptime(j["submissionTime"], fmt)).total_seconds()
                    dur = f"{d:.2f}s"
                except ValueError:
                    pass
            print(f"  job {j['jobId']:>4} {dur:>7}  stages={j['stageIds']}  {j.get('description','')[:80]}")
        rows = []
        for sid in stage_ids:
            s = stages.get(sid)
            if not s:
                continue
            rows.append((s.get("executorRunTime", 0), sid, s))
        rows.sort(reverse=True)
        for run_ms, sid, s in rows[:12]:
            print(f"  stage {sid:>4}: run {run_ms/1000:.2f}s cpu {s.get('executorCpuTime',0)/1e9:.2f}s "
                  f"tasks {s.get('numCompleteTasks')} in {s.get('inputBytes',0)>>10}KB "
                  f"sh_r {s.get('shuffleReadBytes',0)>>10}KB sh_w {s.get('shuffleWriteBytes',0)>>10}KB  "
                  f"{s.get('name','')[:60]}")


if __name__ == "__main__":
    main()
