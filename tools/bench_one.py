#!/usr/bin/env python
"""Time one (or a few) named registry queries — the re-measure-before-commit
helper the r8 verdict asked for: any commit touching an operator on the bench
list re-runs that query's timing with this and updates BENCH_DETAIL.json's
line in the same commit.

Usage:  python tools/bench_one.py [--sf DIR] [--reps N] name [name ...]

Prints one line per query: min / median of N warm executions (noop sink, same
measurement shape as bench.py) after one untimed priming run.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    from tools.sentinel import prime_sentinel, run_sentinel, summarize

    spark = get_spark("bench_one")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    prime_sentinel(spark)
    sentinels = {"start": run_sentinel(spark)}
    for name in args.names:
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()  # prime
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s "
            f"reps={args.reps} sf={args.sf}",
            flush=True,
        )
    # Every number quoted from this tool must carry its noise attestation
    # (COVERAGE.md bench-discipline rule): a drifted or elevated sentinel
    # means re-measure in a quiet window before committing the claim.
    noise = summarize({**sentinels, "end": run_sentinel(spark)})
    pts = noise["points"]
    print(
        f"sentinel: start={pts['start']['sec']}s end={pts['end']['sec']}s "
        f"drift={noise['drift_ratio']} noisy={noise['noisy']} "
        f"load_1m={pts['start']['load_1m']}->{pts['end']['load_1m']}",
        flush=True,
    )


if __name__ == "__main__":
    main()
