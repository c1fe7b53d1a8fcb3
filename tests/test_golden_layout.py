"""Golden LAYOUT parity (r7 verdict item 8): feed the reference's own raw
runs through OUR report engine, render with the layout-compat writer, and
diff byte-for-byte against ``test/history/exampleOutput.csv`` — section
ordering, scalar lines (``Successful Runs:``, ``Total number of unique
Xs:``), the ``--- Runs of Group ---`` sub-blocks, header interleaving, cell
formatting, everything except the run timestamp (taken from the golden
file itself so the diff is exact)."""

from __future__ import annotations

import io

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import ReportConfig, report
from cloudcomputing_servicecompositiontest_datapipeline_spark.sources.io import render_report_compat

GOLDEN = "/root/reference/test/history/exampleOutput.csv"

#: exampleExperiment ignore semantics (same set the value-parity test uses).
IGNORES = [
    "1_run_id", "2_thread_id", "cpuModel", "cpuIdle", "cpuIowait",
    "cpuIrq", "cpuKrn", "cpuNice", "cpuSoftIrq", "cpuUsr",
]


@pytest.fixture(scope="module")
def golden_text() -> str:
    try:
        with open(GOLDEN) as f:
            return f.read()
    except FileNotFoundError:
        pytest.skip("reference golden artifact not present")


def test_compat_renderer_reproduces_reference_layout(spark, golden_text):
    lines = golden_text.splitlines()
    i = next(n for n, l in enumerate(lines) if l.startswith("1_run_id,"))
    j = next(n for n, l in enumerate(lines) if l.startswith("Successful Runs:"))
    raw_pd = pd.read_csv(io.StringIO("\n".join(lines[i:j])))
    # the reference's run dicts hold vmuptime as a string (JSON), which is
    # why the golden list cells are quoted: ['1572408278']
    raw_pd["vmuptime"] = raw_pd["vmuptime"].astype(str)
    runs = spark.createDataFrame(raw_pd).withColumn("zAll", F.lit("Final Results:"))

    cfg = ReportConfig(
        output_groups=["cpuType", "newcontainer", "uuid", "vmuptime", "zAll"],
        show_as_sum=["newcontainer"],
        show_as_list=["vmuptime", "cpuType"],
        ignore_from_groups=IGNORES,
        ignore_by_group={"cpuType": ["cpuType"]},
    )
    sections = report(runs, cfg)
    # the golden artifact's raw block predates the derived zAll column
    raw_out = sections["raw"].drop("zAll")

    timestamp = lines[0].split(" - ")[0]
    rendered = render_report_compat(
        raw_out,
        {k: v for k, v in sections.items() if k != "raw"},
        timestamp=timestamp,
        setup_line=lines[1],
        list_runs_of_category=("cpuType",),
        ignore_from_groups=tuple(IGNORES),
        ignore_by_group={"cpuType": ["cpuType"]},
    )
    want = golden_text if golden_text.endswith("\n") else golden_text + "\n"
    if rendered != want:
        # pinpoint the first divergent line for a readable failure
        got_lines, want_lines = rendered.splitlines(), want.splitlines()
        for n, (g, w) in enumerate(zip(got_lines, want_lines)):
            assert g == w, f"line {n + 1}:\n  got:  {g!r}\n  want: {w!r}"
        assert len(got_lines) == len(want_lines), (
            f"line count {len(got_lines)} != {len(want_lines)}; "
            f"first extra: {(got_lines + want_lines)[min(len(got_lines), len(want_lines))]!r}"
        )
        raise AssertionError("texts differ")  # pragma: no cover
