#!/usr/bin/env python
"""Driver-side plan-BUILD-time audit: time the Python construction of every
declared query's DataFrame (no execution) and print the slowest.

The r9 finding: expression construction is a fixed driver tax paid on every
run regardless of data size — pq_encode spent 10.4 s building vs 0.8 s
executing before the fastlit/indexed-transform fixes.  This audit keeps the
class from regrowing: anything over ~1 s of pure build time deserves a
fastlit/stage_barrier look.

Usage: python tools/build_time_audit.py [sf_dir] [threshold_s]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("build-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    times: list[tuple[float, str]] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir)
        except Exception as e:
            print(f"ERR   {name}: {str(e).splitlines()[0][:80]}")
            continue
        times.append((time.time() - t0, name))
    times.sort(reverse=True)
    slow = [(t, n) for t, n in times if t >= threshold]
    for t, n in times[:15]:
        flag = "SLOW " if t >= threshold else "ok   "
        print(f"{flag}{n:40s} build={t:6.2f}s")
    print(
        f"{len(slow)} queries over {threshold:.1f}s build time — ADVISORY: "
        "first-call numbers include intended bounded driver jobs (codebook/"
        "BPE/IVF training draws, bloom builds, session-cached thereafter); "
        "investigate entries whose WARM rebuild stays over the threshold "
        "(r9 session: all warm rebuilds under ~1.3s after fastlit + indexed-"
        "transform argmins; pq_encode was 10.4s before)."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
