#!/usr/bin/env python
"""Capture ``explain("formatted")`` for named registry queries into
``plans/r10/<query>_<tag>.txt`` — the before/after plan evidence the
optimization round commits alongside each change.

Usage:  python tools/plan_capture.py --tag after [--sf DIR] name [name ...]

Also prints a one-line shape summary per query (Exchange count, join
strategies, Python-eval nodes) so a plan-diff claim can be stated from the
same run that produced the artifact.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="after")
    ap.add_argument("--outdir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names:
        if name not in qs:
            print(f"?? unknown query {name}")
            continue
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        joins = sorted(set(re.findall(r"\b(\w*Join\w*)\b", text)))
        py = sorted(set(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b", text)))
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}")


if __name__ == "__main__":
    main()
