#!/usr/bin/env python
"""Reproduce and diagnose the end-of-run slowdown: time a fixed probe set on
a FRESH session, age the session by building+running many distinct queries
(the bench list), re-time the same probe set, and capture JVM code-cache /
GC / listener diagnostics at each point.

The r9 official bench showed untouched queries reading up to 4.5x their quiet
numbers, decaying monotonically with position in the run; the r10 baseline
retime reproduces it (events_session_window 0.49 -> 3.26 s) while the
SENTINEL stays flat — i.e. repeated plans stay fast, NEW plans get slow.
That signature points at JVM-level aging (JIT code cache, metaspace, listener
backlog), not ambient load.  This script pins it down.

Usage: python tools/aging_probe.py [--age N] [--conf k=v ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "events_session_window",
    "similarity_bruteforce_topk",
    "text_quality_score",
    "events_tumbling_window",
    "q1_pricing_summary",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jvm_pid() -> int:
    out = subprocess.check_output(["pgrep", "-f", "pyspark-shell|spark-submit"], text=True)
    pids = [int(x) for x in out.split()]
    # pick the child of this process tree: newest works for this script
    return max(pids)


def code_cache(pid: int) -> str:
    try:
        out = subprocess.check_output(["jcmd", str(pid), "Compiler.codecache"], text=True)
        return out
    except Exception as e:  # pragma: no cover
        return f"jcmd failed: {e}"


def gc_meta(pid: int) -> str:
    try:
        return subprocess.check_output(["jstat", "-gcutil", str(pid)], text=True)
    except Exception as e:  # pragma: no cover
        return f"jstat failed: {e}"


def time_probe(spark, qs) -> dict[str, float]:
    res = {}
    for name in PROBE:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()  # prime
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        res[name] = round(time.time() - t0, 3)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--age", type=int, default=100, help="how many distinct queries to run as aging load")
    ap.add_argument("--conf", action="append", default=[], help="extra static conf k=v for the session")
    args = ap.parse_args()

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark, ENGINE_RUNTIME_CONF
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName("aging_probe").master(f"local[{cpus}]")
    for k, v in ENGINE_RUNTIME_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.driver.memory", "24g")
    builder = builder.config("spark.sql.files.maxPartitionBytes", "128MB")
    for kv in args.conf:
        k, v = kv.split("=", 1)
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    pid = jvm_pid()
    print(f"jvm pid={pid}", flush=True)

    print("== fresh probe ==", flush=True)
    fresh = time_probe(spark, qs)
    print(fresh, flush=True)
    print(code_cache(pid).splitlines()[1] if "\n" in code_cache(pid) else code_cache(pid), flush=True)
    print(gc_meta(pid), flush=True)

    # age: run N distinct queries once each (plan build + execute), like the bench
    names = [n for n in qs if n not in PROBE][: args.age]
    t0 = time.time()
    for i, n in enumerate(names):
        try:
            spark.sparkContext.setJobDescription(f"age:{n}")
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"age {n} failed: {type(e).__name__}", flush=True)
        if (i + 1) % 25 == 0:
            print(f"aged {i+1}/{len(names)} ({time.time()-t0:.0f}s)", flush=True)
    print(f"== aged with {len(names)} queries in {time.time()-t0:.0f}s ==", flush=True)

    cc = code_cache(pid)
    print("\n".join(cc.splitlines()[:8]), flush=True)
    print(gc_meta(pid), flush=True)

    print("== aged probe ==", flush=True)
    aged = time_probe(spark, qs)
    print(aged, flush=True)
    for n in PROBE:
        print(f"{n}: fresh={fresh[n]} aged={aged[n]} ratio={aged[n]/max(fresh[n],1e-9):.2f}", flush=True)

    # load average for the record
    print(f"loadavg={os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
