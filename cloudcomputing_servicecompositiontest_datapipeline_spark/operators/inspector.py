"""Nested Inspector-record ingestion (SAAF run records).

The reference's run records carry two nested collections
(jupyter_workspace/src/Inspector.py):

- ``cpuPolls`` — a list of timestamped poll structs appended by
  ``pollCPUStats`` (Inspector.py:144-174): ``{time: epoch-ms,
  cpuTotal: {cpuUser, cpuNice, ...}}``; ``inspectCPUDelta``
  (Inspector.py:213-229) derives ``<metric>Delta`` = last poll − first poll.
- ``cpuInfo`` — a list of per-core attribute structs from /proc/cpuinfo
  (Inspector.py:100-139); ``cpuType``/``cpuModel`` come from core 0 and
  ``cpuCores`` is the list length.

Spark-first design: the nesting maps to ``ArrayType(StructType)`` columns,
and the flatten is pure built-in expressions (``array_sort`` +
``element_at`` ±1, ``size``) — row-local, shuffle-free, whole-stage
codegen'd; no UDFs, so at 100 TB the flatten costs one projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Poll metrics inside ``cpuTotal`` (Inspector.py:149 ``cpuValues``).
CPU_POLL_METRICS = [
    "cpuUser",
    "cpuNice",
    "cpuKernel",
    "cpuIdle",
    "cpuIOWait",
    "cpuIrq",
    "cpuSoftIrq",
    "cpuSteal",
    "cpuGuest",
    "cpuGuestNice",
]

#: Explicit nested schema for Inspector-shaped run JSON.  ``time`` is the
#: FIRST struct field on purpose: Spark sorts structs lexicographically by
#: field position, so ``array_sort(cpuPolls)`` orders polls by timestamp.
#: Extra per-core keys (cpu0, cpu1, …, ctxt, btime) in the raw record are
#: dropped by schema projection — the reference's "exclude" behavior.
RUN_SCHEMA = (
    "uuid STRING, cpuType STRING, cpuModel STRING, runtime DOUBLE, "
    "cpuInfo ARRAY<STRUCT<model_name: STRING, model: STRING, cpu_MHz: STRING>>, "
    "cpuPolls ARRAY<STRUCT<time: BIGINT, cpuTotal: STRUCT<"
    + ", ".join(f"{m}: DOUBLE" for m in CPU_POLL_METRICS)
    + ">>>"
)


def read_nested_runs(spark: SparkSession, path: str) -> DataFrame:
    """S-ingest for Inspector-shaped JSON run records (one object per file or
    per line), with the nested collections typed, not stringified."""
    return spark.read.schema(RUN_SCHEMA).option("multiLine", "true").json(path)


def flatten_cpu_polls(
    df: DataFrame, polls_col: str = "cpuPolls", metrics: list[str] | None = None
) -> DataFrame:
    """``inspectCPU`` + ``inspectCPUDelta`` (Inspector.py:190-229): stamp each
    run with the first poll's absolute metrics and the last−first deltas,
    plus ``totalPolls``; drop the nested column afterwards (the reference
    keeps flat attributes only unless ``processCPUPolls`` opts in)."""
    metrics = CPU_POLL_METRICS if metrics is None else metrics
    polls = F.array_sort(F.col(polls_col))  # time is field 0 → time order
    # empty-poll guard: element_at on an empty array is a runtime error
    # under ANSI mode (the Spark 4 default), not NULL — a run record with
    # zero polls must flatten to NULL metrics, not kill the job
    has = F.size(F.col(polls_col)) > 0
    first = F.when(has, F.element_at(polls, 1))
    last = F.when(has, F.element_at(polls, -1))
    cols = [F.col(c) for c in df.columns if c != polls_col]
    for m in metrics:
        f = first.getField("cpuTotal").getField(m)
        l = last.getField("cpuTotal").getField(m)
        cols.append(f.alias(m))
        cols.append((l - f).alias(f"{m}Delta"))
    cols.append(F.size(F.col(polls_col)).alias("totalPolls"))
    cols.append(
        (last.getField("time") - first.getField("time")).alias(
            "pollSpanMs"
        )
    )
    return df.select(*cols)


def flatten_cpu_info(df: DataFrame, info_col: str = "cpuInfo") -> DataFrame:
    """``inspectCPUInfo`` tail (Inspector.py:129-139): cpuType/cpuModel from
    core 0, cpuCores = core count; the nested list is then dropped."""
    core0 = F.when(F.size(F.col(info_col)) > 0, F.element_at(F.col(info_col), 1))
    out = (
        df.withColumn("cpuType", F.coalesce(F.col("cpuType"), core0.getField("model_name")))
        .withColumn("cpuModel", F.coalesce(F.col("cpuModel"), core0.getField("model")))
        .withColumn("cpuCores", F.size(F.col(info_col)))
    )
    return out.drop(info_col)
