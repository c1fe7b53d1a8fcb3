"""Skew-utility tests: salted rewrites must be result-identical to plain ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.skew import (
    salted_count_sum,
    salted_join,
)


def _skewed_df(spark):
    # 90% of rows share one hot key
    rows = [("hot" if i % 10 else f"cold{i}", float(i % 7)) for i in range(1000)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: (r.uses, r.sum_v)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("uses"),
            F.round(F.sum(F.col("v").cast("decimal(28,4)")), 2).cast("double").alias("sum_v"),
        )
        .collect()
    }
    salted = {r.k: (r.uses, r.sum_v) for r in salted_count_sum(df, "k", "v").collect()}
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(1, 1000, 10)], ["k", "label"]
    )
    plain = sorted((r.k, r.v, r.label) for r in fact.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.label) for r in salted_join(fact, dim, "k").collect())
    assert salted == plain
