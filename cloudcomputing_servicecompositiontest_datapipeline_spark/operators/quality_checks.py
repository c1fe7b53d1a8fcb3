"""Declarative data-quality constraint checking (Deequ-style, single pass).

A training-data pipeline gates every ingest batch on constraints — key
uniqueness, completeness, value domains, length floors — before the batch
may join the corpus.  The reference validates records one rule at a time
inside the transform loop (``Transform.java:229-260`` null/format guards);
this operator lifts validation to a declarative table-level report.

Scale design: ALL checks compile into ONE aggregate pass over the table
(map-side partial + final), so a 100 TB batch is scanned once regardless of
how many constraints are declared.  The per-check rows come from exploding
the single aggregate row — driver never touches data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    *,
    unique: str | None = None,
    not_null: list[str] | None = None,
    row_checks: dict[str, Column] | None = None,
) -> DataFrame:
    """One row per declared check: ``(check_name, violations, passed)``.

    ``unique``: column whose values must be distinct (violations = extra
    copies).  ``not_null``: completeness per column.  ``row_checks``: named
    boolean columns where TRUE marks a VIOLATING row.
    """
    aggs: list[Column] = []
    names: list[str] = []

    if unique is not None:
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(unique)).cast("long").alias(f"unique_{unique}")
        )
        names.append(f"unique_{unique}")
    # sum() over an empty table is NULL — coalesce so an empty batch reads
    # as zero violations (all checks pass), not as unknown
    for c in not_null or []:
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
            .cast("long")
            .alias(f"not_null_{c}")
        )
        names.append(f"not_null_{c}")
    for nm, cond in (row_checks or {}).items():
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast("long").alias(nm)
        )
        names.append(nm)
    if not aggs:
        raise ValueError("no checks declared")

    one = df.agg(*aggs)
    packed = F.array(
        *[
            F.struct(
                F.lit(nm).alias("check_name"),
                F.col(nm).cast("long").alias("violations"),
            )
            for nm in names
        ]
    )
    return (
        one.select(F.explode(packed).alias("c"))
        .select(
            "c.check_name",
            "c.violations",
            (F.col("c.violations") == 0).alias("passed"),
        )
    )


def profile_columns(df: DataFrame, cols: list[str], *, exact_distinct: bool = True) -> DataFrame:
    """Column-profile report (the ANALYZE TABLE / Deequ-profile analogue a
    curation pipeline runs before declaring constraints): one output row per
    profiled column — ``(col_name, n_rows, n_null, n_distinct, min_value,
    max_value)``, min/max rendered as strings so heterogeneous column types
    share one report schema.

    Scale design: every statistic for every column folds into ONE aggregate
    over ONE scan.  ``exact_distinct=True`` uses ``count(distinct c)`` —
    Spark plans the multi-distinct via a single Expand (still one scan, but
    the expand multiplies rows by the column count); at 100 TB pass
    ``exact_distinct=False`` to swap in ``approx_count_distinct`` (HLL,
    no Expand) — the profile is advisory, ±2% is fine there.
    """
    if not cols:
        raise ValueError("no columns to profile")
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        distinct = (
            F.countDistinct(c) if exact_distinct else F.approx_count_distinct(c)
        )
        aggs += [
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
            .cast("long")
            .alias(f"__null_{c}"),
            distinct.cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    packed = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(packed).alias("p")).select("p.*")
