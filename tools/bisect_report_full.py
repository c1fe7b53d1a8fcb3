#!/usr/bin/env python
"""One-off r7 measurement: is the r6 try_cast sweep (b983543) the cause of
the report_full 0.378 -> 0.518 s driver-bench move?

Times report_full and report_multi_group at sf0.1 with the CURRENT dsum/davg
(try_cast) and with a monkeypatched plain-cast variant, interleaved A/B/A/B
min-of-N so ambient host noise (COVERAGE.md documents +/-20%) hits both arms
equally.  Also times a no-aggregate control query to normalize.

Usage: python tools/bisect_report_full.py [sf_dir] [n_rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    from pyspark.sql import Column
    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("bisect-report-full")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    names = ["report_full", "report_multi_group", "pipeline_cumulative"]

    orig_try_cast = Column.try_cast
    use_plain = {"on": False}

    def patched(self: Column, t):  # plain cast arm: ANSI cast, no try wrapper
        if use_plain["on"]:
            return orig_try_cast(self, t) if t != "decimal(28,4)" else self.cast(t)
        return orig_try_cast(self, t)

    Column.try_cast = patched

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, SF).collect()
        return time.perf_counter() - t0

    # warm
    for nm in names:
        run(nm)
    results: dict[tuple[str, str], list[float]] = {}
    for _ in range(N):
        for arm in ("try", "plain"):
            use_plain["on"] = arm == "plain"
            for nm in names:
                results.setdefault((nm, arm), []).append(run(nm))
    use_plain["on"] = False
    Column.try_cast = orig_try_cast
    for nm in names:
        a = min(results[(nm, "try")])
        b = min(results[(nm, "plain")])
        print(
            f"{nm:24s} try_cast={a:.3f}s plain_cast={b:.3f}s "
            f"ratio={a / b:.3f} (min of {N}, interleaved)"
        )


if __name__ == "__main__":
    main()
