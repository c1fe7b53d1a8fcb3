"""Cross-engine fold-portability pins.

The r8 portable modes rest on two arithmetic claims; these tests check them
DIRECTLY against DuckDB (the oracle engine) instead of indirectly through
query hashes, so a regression points at the broken claim:

1. SEQUENTIAL FLOAT folds are engine-identical: Spark's row-local
   ``F.aggregate(zip_with(...), 0.0, +)`` folds left-to-right, and DuckDB's
   ``list_reduce`` folds left-to-right with the first element as seed —
   IEEE ``0.0 + x == x``, so the resulting doubles are bit-identical
   (``_dot_seq`` / ``_argmin_centroids_seq``, dedup_semantic_centroids'
   declared mode).

2. decimal(18,12) folds equal the old decimal(28,12) values whenever
   per-term products stay under 10^6 — precision only widens headroom,
   scale 12 fixes the rounding — so dropping ``_ACC_DEC`` to the
   compact-long fast path changed no oracle-checked value.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators import similarity as sim


def _tricky_vectors(n: int, dim: int, seed: int) -> list[list[float]]:
    """Seeded vectors engineered to stress summation: mixed magnitudes
    (cancellation), exact ties, zeros, and negative zeros."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        v = [rng.uniform(-1, 1) * (10 ** rng.randint(-6, 2)) for _ in range(dim)]
        if i % 3 == 0:
            v[0], v[1] = 0.25, -0.25  # exact cancellation pair
        if i % 4 == 0:
            v[2] = 0.0
        if i % 5 == 0:
            v[3] = -0.0
        out.append(v)
    return out


def test_dot_seq_bitwise_matches_duckdb_list_reduce(spark):
    vecs = _tricky_vectors(60, 16, seed=11)
    other = _tricky_vectors(60, 16, seed=23)
    df = spark.createDataFrame(
        [(i, vecs[i], other[i]) for i in range(60)],
        "id LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    got = {
        r.id: r.d
        for r in df.select("id", sim._dot_seq(F.col("a"), F.col("b")).alias("d")).collect()
    }
    pdf = pd.DataFrame({"id": range(60), "a": vecs, "b": other})
    con = duckdb.connect()
    con.register("t", pdf)
    want = dict(
        con.sql(
            "SELECT id, list_reduce(list_transform(a, (x, i) -> x * b[i]),"
            " (p, q) -> p + q) FROM t"
        ).fetchall()
    )
    for i in range(60):
        # exact equality — portability means IDENTICAL doubles, not close
        # ones (±0.0 compare equal, the one acceptable representation gap
        # between the 0.0-seeded and first-element-seeded folds)
        assert got[i] == want[i], f"id {i}: spark {got[i]!r} != duckdb {want[i]!r}"


def test_argmin_seq_matches_duckdb_sequential_sqdist(spark):
    vecs = _tricky_vectors(40, 8, seed=7)
    centers = _tricky_vectors(5, 8, seed=99)
    df = spark.createDataFrame(
        [(i, vecs[i]) for i in range(40)], "id LONG, v ARRAY<DOUBLE>"
    )
    got = {
        r.id: r.c
        for r in df.select(
            "id", sim._argmin_centroids_seq(F.col("v"), centers, 1)[0].alias("c")
        ).collect()
    }
    pdf = pd.DataFrame({"id": range(40), "v": vecs})
    cdf = pd.DataFrame({"cid": range(5), "cv": centers})
    con = duckdb.connect()
    con.register("t", pdf)
    con.register("c", cdf)
    want = dict(
        con.sql(
            """
            SELECT id, cid FROM (
              SELECT t.id, c.cid, row_number() OVER (
                PARTITION BY t.id
                ORDER BY list_reduce(list_transform(t.v, (x, i) ->
                  (x - c.cv[i]) * (x - c.cv[i])), (a, b) -> a + b), c.cid) AS rr
              FROM t CROSS JOIN c) WHERE rr = 1
            """
        ).fetchall()
    )
    assert got == want


def test_acc_dec18_values_match_dec28_reference(spark):
    """The compact-decimal fold must reproduce the (28,12) values exactly on
    the bounded domain the docstring claims (per-term products < 10^6)."""
    vecs = _tricky_vectors(50, 16, seed=31)
    other = _tricky_vectors(50, 16, seed=41)
    df = spark.createDataFrame(
        [(i, vecs[i], other[i]) for i in range(50)],
        "id LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )

    def fold(dec: str) -> F.Column:
        prods = F.zip_with(
            F.col("a"), F.col("b"), lambda x, y: (x * y).cast(dec)
        )
        return F.aggregate(
            prods, F.lit(0).cast(dec), lambda acc, x: (acc + x).cast(dec)
        ).cast("double")

    rows = df.select(
        "id", fold("decimal(18,12)").alias("d18"), fold("decimal(28,12)").alias("d28")
    ).collect()
    assert len(rows) == 50
    for r in rows:
        assert r.d18 == r.d28, f"id {r.id}: {r.d18!r} != {r.d28!r}"


def test_seq_assignment_agrees_with_exact_on_fixture(spark, sf_dir):
    """On the real fixture (no engineered ties) the float-sequential argmin
    and the decimal-exact argmin choose the same blocks — the mode switch
    changed dedup_semantic_centroids' SPEED, not its clustering."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    emb = star.table(spark, sf_dir, "embeddings")
    centers = sim.ivf_seed_centers(emb, n_centroids=9, seed=42)
    a = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id", sim._argmin_centroids_seq(F.col("embedding"), centers, 1)[0].alias("b")
        ).collect()
    }
    b = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id", sim._argmin_centroids_exact(F.col("embedding"), centers, 1)[0].alias("b")
        ).collect()
    }
    assert a == b


def test_dot_seq_null_and_empty_semantics(spark):
    """NULL vector → NULL dot (poisoned fold), empty vector → 0.0 seed
    survives: the degenerate contract the oracles' len-guards rely on."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [3.0, 4.0]), (2, None, [1.0]), (3, [], [])],
        "id LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    rows = {r.id: r.d for r in df.select("id", sim._dot_seq(F.col("a"), F.col("b")).alias("d")).collect()}
    assert rows[1] == 11.0
    assert rows[2] is None
    assert rows[3] == 0.0
