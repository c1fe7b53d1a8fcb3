"""Report-engine operator tests: pipeline state machine, combineSheets,
group-conflict resolution, validity gate, approx-sketch accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.pipeline import (
    Stage,
    run_pipeline,
)
from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
    combine_sheets,
    resolve_group_conflicts,
    validity_gate,
)


def test_pipeline_stage_machine_with_transitions(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "message"])
    stages = [
        # stage 1 consumes "message" renamed to "payload" (transitions P15)
        Stage("derive", lambda d: d.withColumn("derived", F.col("payload") * 2),
              transitions={"message": "payload"}),
        Stage("filter", lambda d: d.filter(F.col("derived") > 25)),
    ]
    out = run_pipeline(df, stages)
    rows = out.collect()
    assert [r.id for r in rows] == [2] and rows[0].derived == 40.0


def test_pipeline_custom_transition_loops_and_stops(spark):
    df = spark.createDataFrame([(0,)], ["n"])
    stages = [Stage("inc", lambda d: d.withColumn("n", F.col("n") + 1))]

    def run_three_times(i, stage, d):  # F2 user transition function
        return 0 if d.first().n < 3 else 1

    out = run_pipeline(df, stages, transition=run_three_times)
    assert out.first().n == 3


def test_pipeline_max_steps_guard(spark):
    df = spark.createDataFrame([(0,)], ["n"])
    stages = [Stage("noop", lambda d: d)]
    with pytest.raises(RuntimeError, match="max_steps"):
        run_pipeline(df, stages, transition=lambda i, s, d: 0, max_steps=5)


def test_combine_sheets_tags_iteration_scoped_keys(spark):
    a = spark.createDataFrame([("vm1", 1.0)], ["vmID", "x"])
    b = spark.createDataFrame([("vm1", 2.0)], ["vmID", "x"])
    out = combine_sheets([a, b]).collect()
    keys = sorted((r.iteration, r.vmID_iter) for r in out)
    assert keys == [(0, "vm1[0]"), (1, "vm1[1]")]  # same vm never merges across iters


def test_resolve_group_conflicts(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], ["vmID", "vmuptime", "containerID", "uuid"])
    out = resolve_group_conflicts(df, ["vmuptime", "uuid", "cpuType"])
    assert out == ["cpuType"]  # finer keys supersede both proxies
    df2 = spark.createDataFrame([(1,)], ["vmuptime"])
    assert resolve_group_conflicts(df2, ["vmuptime"]) == ["vmuptime"]


def test_validity_gate_drops_versionless_runs(spark):
    df = spark.createDataFrame([(0.5, "a"), (None, "b")], ["version", "x"])
    assert [r.x for r in validity_gate(df).collect()] == ["a"]


def test_approx_sketches_close_to_exact(spark, sf_dir):
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    ev = star.table(spark, sf_dir, "events")
    row = (
        ev.agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
            F.expr("percentile(value, 0.5)").alias("exact_med"),
            F.percentile_approx("value", 0.5).alias("approx_med"),
        ).first()
    )
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.approx_med - row.exact_med) <= 1.0
