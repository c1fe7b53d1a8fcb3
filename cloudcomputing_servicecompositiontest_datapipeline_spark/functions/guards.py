"""Non-finite guards for numeric monitoring operators.

At 100 TB every degenerate value exists somewhere in the corpus — and a
single NaN or ±Inf measurement is WORSE than a crash for a statistics
operator: Spark orders NaN above every double, so an unguarded
``min/max``/``percentile`` axis pass silently absorbs it (a NaN max makes
every equi-width bin NaN/degenerate on BOTH snapshots, so a drift monitor
reads 0.0 and goes blind; a NaN in a reference distribution poisons the
quantile curve's tail).  The convention, shared with the embedding QC gate
(operators/similarity.py): a value participates in axis statistics only if
it is FINITE — non-NULL, not NaN, |v| <= 1e308 — and non-finite rows are
surfaced in the operator's "no axis position" counts instead of vanishing.

The DuckDB oracle mirror is ``NOT (v IS NULL OR isnan(v) OR abs(v) > 1e308)``.

``isnan(NULL)`` is NULL, not False — every predicate here is built so the
NULL case is decided by an explicit ``isNull`` term, never by a NULL
slipping through a boolean (the embedding_qc r5 lesson).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: |v| beyond this is treated as infinite (catches ±Inf without an
#: equality on the IEEE infinity literal; matches embedding_qc)
_FINITE_ABS_MAX = 1e308


def nonfinite_d(c: Column) -> Column:
    """True for NULL / NaN / ±Inf-magnitude doubles (never NULL itself)."""
    d = c.cast("double")
    return d.isNull() | F.isnan(d) | (F.abs(d) > F.lit(_FINITE_ABS_MAX))


def finite_d(c: Column) -> Column:
    """True only for a real, usable measurement (never NULL itself)."""
    return ~nonfinite_d(c)


def bad_measurement_d(c: Column) -> Column:
    """NaN / ±Inf but NOT NULL: a value that CLAIMS to exist and is garbage
    (a NULL is legitimate missing data; this is a broken sensor)."""
    d = c.cast("double")
    return d.isNotNull() & (F.isnan(d) | (F.abs(d) > F.lit(_FINITE_ABS_MAX)))


#: DuckDB spellings of the same predicates, for oracle mirrors
SQL_NONFINITE = "({v} IS NULL OR isnan({v}) OR abs({v}) > 1e308)"
SQL_FINITE = "NOT ({v} IS NULL OR isnan({v}) OR abs({v}) > 1e308)"
