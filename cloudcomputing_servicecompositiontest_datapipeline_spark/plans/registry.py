"""Declared-query registry: the driver contract's backing store.

Every operator from SURVEY.md §2 ships as a named query ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) a DuckDB oracle string.  Modules under
``plans/`` register with the :func:`query` decorator; ``__spark_entry__``
re-exports ``QUERIES`` / ``ORACLES``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle`` is the DuckDB-equivalent ANSI SQL
    (omit for non-SQL-expressible ops → driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every plan module (side effect: registration)."""
    from . import tlq, report, joins, windows, native, tpch_more, extensions, streaming_batch, io_udf  # noqa: F401
