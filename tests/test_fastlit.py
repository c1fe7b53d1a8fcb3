"""functions/fastlit: json-shipped literals must constant-fold to plain
Literals with values bit-identical to per-element F.lit construction —
the driver-side plan-build tax fix (r9: pq_encode 10.4 s build -> sub-s)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession, functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.fastlit import (
    fast_lit,
    lit_double_matrix,
    lit_doubles,
    lit_longs,
    lit_strings,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .appName("fastlit-test")
        .getOrCreate()
    )
    yield s


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).collect()[0].x


def test_values_bit_identical_to_lit(spark):
    import random

    rng = random.Random(3)
    mat = [[rng.uniform(-1e6, 1e6) for _ in range(7)] for _ in range(5)]
    assert _one(spark, lit_double_matrix(mat)) == _one(spark, F.lit(mat))
    vals = [rng.uniform(-1, 1) for _ in range(9)] + [0.0, -0.5, 1e-300, 1e300]
    assert _one(spark, lit_doubles(vals)) == _one(spark, F.lit(vals))
    longs = [0, 1, -1, 2**62, -(2**62)]
    assert _one(spark, lit_longs(longs)) == _one(spark, F.lit(longs))


def test_string_escaping_exact(spark):
    hostile = ["a'b", 'c"d', "e\\f", "g\th", "i\nj", "kl", "émoji🙂", ""]
    assert _one(spark, lit_strings(hostile)) == hostile


def test_folds_to_plain_literal(spark):
    """The from_json wrapper must disappear at optimization time — zero
    runtime parse cost, so fast_lit is safe in per-row hot paths."""
    df = spark.range(3).select(lit_doubles([1.0, 2.0]).alias("x"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "from_json" not in plan


def test_nan_inf_rejected(spark):
    """NaN/Inf must fail loudly at build time — their acceptance would rest
    on a non-contractual from_json parser default, and a NaN centroid
    leaking in from training is a bug to surface, not encode."""
    with pytest.raises(ValueError):
        lit_doubles([1.0, float("nan")])
    with pytest.raises(ValueError):
        lit_doubles([float("inf")])


def test_nested_schema_roundtrip(spark):
    v = [[1, 2], [], [3]]
    assert _one(spark, fast_lit(v, "array<array<bigint>>")) == v


def test_unparseable_constant_fails_loudly_not_null(spark):
    """FAILFAST, not the PERMISSIVE default (r9 ADVICE): a constant the
    schema can't hold — a long outside bigint range here — must raise like
    the per-element F.lit path did, never silently bake a NULL literal."""
    with pytest.raises(Exception) as ei:
        spark.range(1).select(fast_lit([2**70], "array<bigint>").alias("x")).collect()
    assert "NullPointerException" not in str(ei.value)
    # and the same constant in-range is fine
    assert _one(spark, fast_lit([2**62], "array<bigint>")) == [2**62]
