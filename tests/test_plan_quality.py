"""Scale-posture regression tests: assert the PLANS stay right, not just the
results — pushdown reaches the scan, dims broadcast, quadratic operators keep
their blocking keys.  These are the properties that survive a 100× scale-up."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return em.queries()[name](spark, SF)._jdf.queryExecution().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][-1]
    assert "l_orderkey" not in rs and "l_partkey" not in rs


def test_dim_joins_broadcast(spark):
    for name in ["q3_shipping_priority", "q5_local_supplier", "join_config_stamp"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_overlap_keyed_join_not_cartesian(spark):
    """The overlapFilter key must keep J1 an equi+range join (per-key
    quadratic); a cartesian/BNLJ here would explode at scale."""
    plan = _plan(spark, "overlap_selfjoin")
    assert "CartesianProduct" not in plan
    assert "user_id" in plan.split("== Physical Plan ==")[-1]


def test_single_shuffle_for_dedup_then_join(spark):
    """tlq_transform: the dedup window and the orders join reuse one
    lineitem shuffle + a broadcast — no second fact shuffle."""
    plan = _plan(spark, "tlq_transform").split("== Physical Plan ==")[-1]
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BroadcastHashJoin" in plan


def test_no_python_udfs_in_core_plans(spark):
    """Core reference operators stay JVM-side (no BatchEvalPython /
    ArrowEvalPython in the hot path)."""
    for name in [
        "tlq_transform",
        "report_full",
        "overlap_selfjoin",
        "q1_pricing_summary",
        "dedup_exact_text",
        "text_quality_score",
    ]:
        plan = _plan(spark, name).split("== Physical Plan ==")[-1]
        assert "EvalPython" not in plan, name
