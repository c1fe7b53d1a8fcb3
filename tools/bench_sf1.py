#!/usr/bin/env python
"""Scale-curvature slice: time named queries at sf0.1 vs the regenerable
/tmp/sf1.0 fixture (10 key-offset copies of sf0.1 — tools/gen_sf1.py) and
merge per-query ratios into BENCH_sf1.json under the given record key.

Usage: python tools/bench_sf1.py [--key r9_additions] [--reps 2] name...

A ratio well under 10 for 10x data means fixed overhead still dominates at
sf0.1; a ratio near/above 10 flags a super-linear plan (the r7 verdict's
curvature gate).  The dedup rows are deliberately adversarial: every doc
has 9 exact twins (duplicate-heavy crawl shape), not an iid scale-up.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1.0"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--key", default="r9_additions")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    if not os.path.isdir(SF1) or not os.path.exists(os.path.join(SF1, "documents.parquet")):
        subprocess.run([sys.executable, os.path.join(HERE, "tools", "gen_sf1.py")], check=True)

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    from tools.sentinel import prime_sentinel, run_sentinel, summarize

    spark = get_spark("bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    prime_sentinel(spark)
    sentinels = {"start": run_sentinel(spark)}

    out: dict[str, dict] = {}
    for name in args.names:
        row: dict[str, float] = {}
        for label, sf_dir in (("sf0_1", SF01), ("sf1_0", SF1)):
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # prime
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            row[label] = round(best, 3)
        row["ratio_10x_data"] = round(row["sf1_0"] / row["sf0_1"], 2) if row["sf0_1"] > 0 else None
        out[name] = row
        print(f"{name}: sf0.1={row['sf0_1']}s sf1.0={row['sf1_0']}s ratio={row['ratio_10x_data']}", flush=True)

    noise = summarize({**sentinels, "end": run_sentinel(spark)})
    print(
        f"sentinel: drift={noise['drift_ratio']} noisy={noise['noisy']} "
        f"points={[p['sec'] for p in noise['points'].values()]}",
        flush=True,
    )
    for row in out.values():
        row["noise_drift"] = noise["drift_ratio"]
        row["noisy"] = noise["noisy"]

    # existence-guarded so a fresh checkout (or a removed record) cannot
    # crash AFTER the full timing run and lose the measurements (r9 ADVICE)
    path = os.path.join(HERE, "BENCH_sf1.json")
    rec: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            rec = json.load(f)
    rec.setdefault(args.key, {}).update(out)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
