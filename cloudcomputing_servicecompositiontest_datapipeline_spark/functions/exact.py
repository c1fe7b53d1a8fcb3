"""Exact (order-insensitive) aggregate helpers.

The reference computes report aggregates with Python ``Decimal`` so sums/averages
are exact (``report_generator.py:314,368,377``); we need the same property for a
different reason: double-precision ``sum()`` is *order dependent* across Spark's
shuffle, so a hash-matched oracle comparison against DuckDB would flake.  Pattern:

    sum:  cast to DECIMAL → exact associative sum → round(2) → cast double
    avg:  exact decimal sum → cast double → divide by count → round(2)

Both sides (Spark and DuckDB SQL) perform bit-identical arithmetic, so value
hashes match regardless of partitioning/row order.  At scale this also keeps the
aggregation in JVM whole-stage codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for sf0.1 fixture sums; 4 frac digits covers inputs.
DEC = "decimal(28,4)"


def dsum(col: str | Column, alias: str | None = None, scale: int = 2) -> Column:
    """Order-insensitive sum: decimal-exact then rounded double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast(DEC)).cast("double"), scale)
    return out.alias(alias) if alias else out


def davg(col: str | Column, alias: str | None = None, scale: int = 2) -> Column:
    """Order-insensitive mean: exact decimal sum / count, rounded double.

    Mirrors the reference's Decimal mean (`report_generator.py:372-381`, which
    rounds to 2 decimals).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)
    return out.alias(alias) if alias else out


def dround(col: Column, scale: int = 2) -> Column:
    """Round a computed double column (mirrors `report_generator.py:112,153`)."""
    return F.round(col, scale)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle strings."""
    return f"round(cast(sum(cast(({expr}) as {DEC})) as double), {scale}) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"round(cast(sum(cast(({expr}) as {DEC})) as double)"
        f" / count(({expr})), {scale}) AS {alias}"
    )
