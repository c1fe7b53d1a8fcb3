"""Engine facade + IO layer tests (reference flow: read runs → report →
multi-section CSV, SURVEY.md §3.3)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.api import Engine
from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import ReportConfig


def _write_runs(tmp_path, n=8):
    d = tmp_path / "runs"
    d.mkdir()
    for i in range(n):
        rec = {
            "uuid": f"container{i % 3}",
            "cpuType": "Intel" if i % 2 == 0 else "AMD",
            "runtime": 100.0 + i,
            "newcontainer": 1 if i < 3 else 0,
        }
        if i == 5:
            del rec["cpuType"]  # schema-union path: missing attribute
        (d / f"run{i}.json").write_text(json.dumps(rec))
    return str(d)


def test_engine_end_to_end_report(spark, tmp_path):
    eng = Engine(spark)
    runs = eng.read_runs(_write_runs(tmp_path))
    assert runs.count() == 8
    cfg = ReportConfig(
        output_groups=["cpuType", "uuid"],
        show_as_sum=["newcontainer"],
        show_as_list=["uuid"],
    )
    sections = eng.report(runs, cfg)
    assert set(sections) == {"raw", "cpuType", "uuid"}
    cpu = {r.cpuType: r for r in sections["cpuType"].collect()}
    assert cpu["Intel"].uses == 4 and cpu["AMD"].uses == 3
    assert cpu["Intel"].sum_newcontainer == 2.0  # runs 0,2 are cold starts
    assert "avg_runtime" in sections["cpuType"].columns
    # missing-attribute record lands in the null group, not dropped
    assert sections["raw"].filter(F.col("cpuType").isNull()).count() == 1


def test_write_report_csv_sections(spark, tmp_path):
    eng = Engine(spark)
    runs = eng.read_runs(_write_runs(tmp_path))
    cfg = ReportConfig(output_groups=["cpuType"])
    paths = eng.write_report(eng.report(runs, cfg), str(tmp_path / "report"))
    assert set(paths) == {"raw", "cpuType"}
    back = eng.read_csv(paths["cpuType"])
    assert back.count() == 3  # Intel, AMD, null group
    assert back.columns == sorted(back.columns)  # O2 stable layout


def test_write_report_csv_compat_single_file(spark, tmp_path):
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import io as sio

    eng = Engine(spark)
    runs = eng.read_runs(_write_runs(tmp_path))
    cfg = ReportConfig(output_groups=["cpuType"])
    path = sio.write_report_csv_compat(
        eng.report(runs, cfg), str(tmp_path / "report.csv")
    )
    text = open(path).read()
    assert text.startswith("[raw]")  # raw section first, like exampleOutput.csv
    assert "\n\n[cpuType]\n" in text  # blank-line-separated group section
    header = text.split("[cpuType]\n", 1)[1].splitlines()[0].split(",")
    assert header == sorted(header)  # O2 sorted columns
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_rows"):
        sio.write_report_csv_compat(eng.report(runs, cfg), str(tmp_path / "r2.csv"), max_rows=2)


def test_engine_sql_over_star(spark):
    eng = Engine(spark)
    eng.register_star_views("/root/testdata/sf0.001")
    out = eng.sql("SELECT count(*) AS n FROM orders").collect()
    assert out[0].n == 1500


def test_split_by_group_partitions(spark, tmp_path):
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import io as sio

    eng = Engine(spark)
    runs = eng.read_runs(_write_runs(tmp_path))
    out = str(tmp_path / "split")
    sio.write_split_by_group(runs.fillna({"cpuType": "NA"}), "cpuType", out)
    import os

    parts = {p for p in os.listdir(out) if p.startswith("cpuType=")}
    assert parts == {"cpuType=Intel", "cpuType=AMD", "cpuType=NA"}
