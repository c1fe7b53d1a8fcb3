"""r11 optimization-round equivalence pins.

The r10 norm-product join guard (similarity.py) claimed
``cosine IS NOT NULL ⇔ norm_a * norm_b > 0`` — true for fixed-width
vectors, but MISMATCHED-length vectors NULL the dot (zip_with pads the
shorter side with NULLs) while both norms stay positive, so the guard
alone would keep a NULL-cosine row the old ``cosine.isNotNull()`` form
dropped (r10 verdict finding #3).  r11 adds a size-equality term to the
guard; this test pins the full equivalence on a deliberately hostile
fixture: ragged lengths, a zero vector, a NULL element, a NULL vector.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.similarity import (
    _cosine_rounded,
    _dot_dec,
    _with_norm,
    brute_force_topk,
)


def _ragged_df(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.5, 0.5, 0.0, 0.0]),
        (3, [0.0, 1.0, 1.0, 0.0]),
        (4, [1.0, 1.0, 1.0]),          # ragged: 3-wide in a 4-wide corpus
        (5, [0.0, 0.0, 0.0, 0.0]),     # zero vector: no direction
        (6, [1.0, None, 0.0, 0.0]),    # NULL element poisons norm AND dot
        (7, None),                     # NULL vector
        (8, [2.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def _old_cosine_isnotnull_topk(corpus, queries, k=3):
    """The pre-r10 formulation: score every pair, then filter on the cosine
    alias itself (the form whose pushdown duplicated the decimal fold into
    the join condition — slow, but the semantic ground truth)."""
    mult = 1000000.0
    q = _with_norm(queries, "query_id", "query_vec", "vec_id", "embedding")
    c = _with_norm(corpus, "cand_id", "cand_vec", "vec_id", "embedding")
    dot = _dot_dec(F.col("query_vec"), F.col("cand_vec")).cast("double")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            _cosine_rounded(
                dot, F.col("query_vec_norm"), F.col("cand_vec_norm"), mult
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


def test_norm_guard_matches_cosine_isnotnull_on_ragged_vectors(spark):
    df = _ragged_df(spark)
    got = {
        (r.query_id, r.cand_id, r.cosine, r.rnk)
        for r in brute_force_topk(df, df, k=3).collect()
    }
    want = {
        (r.query_id, r.cand_id, r.cosine, r.rnk)
        for r in _old_cosine_isnotnull_topk(df, df, k=3).collect()
    }
    assert got == want
    # the hostile rows must actually exercise the guard: the ragged vector
    # (4) pairs with nobody 4-wide, and no surviving row carries NULL cosine
    assert all(c is not None for (_, _, c, _) in got)
    assert not any(q == 4 or c == 4 for (q, c, _, _) in got)
