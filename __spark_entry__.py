"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TLQ transform query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the declared-query registry
(one entry per implemented operator from SURVEY.md §2, built in
``cloudcomputing_servicecompositiontest_datapipeline_spark/plans/``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloudcomputing_servicecompositiontest_datapipeline_spark.plans import registry as _registry

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TLQ Transform: dedup+decode+derive) on sf0.001."""
    return _registry.QUERIES["tlq_transform"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in driver-priority
    order (the driver records the first 50; the window rotates per round —
    see ``plans/registry.py:DRIVER_WINDOW``)."""
    return _registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-expressible query."""
    return dict(_registry.ORACLES)
