"""Corpus curation controls (SURVEY.md §2.12 X27): per-source caps and
source blocklists — the "don't let one domain dominate the corpus" family
every large-scale training pipeline runs between dedup and sampling
(C4 / Gopher / FineWeb all cap or down-weight dominant hosts).

Reference analogue: the reference gates rows per group in its report
invalidator (Report.java drop-lists); here the same keep/drop shape is
applied to corpus sources at document granularity.

100 TB design: the cap is a rank-within-source filter.  On Spark 3.5+/4
a ``rank()/row_number() <= k`` filter over a window is rewritten to a
``WindowGroupLimit`` physical node — each map task pre-prunes to its local
top-k per key BEFORE the shuffle, so a source with 10^9 docs ships at most
``cap`` rows per input partition instead of 10^9 rows to one reducer.  The
blocklist is a broadcast anti-join (blocklists are human-curated, i.e.
kilobytes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def per_source_cap(
    df: DataFrame,
    source_col: str,
    id_col: str,
    *,
    cap: int,
    quality_col: str | None = None,
) -> DataFrame:
    """Keep at most ``cap`` documents per source, best-first: order by
    ``quality_col`` DESC (when given) with ``id_col`` ASC as the
    deterministic tie-break.  Adds ``source_rank`` (1-based) to the kept
    rows so downstream mixture shaping can weight by within-source rank.

    The ``row_number() <= cap`` shape is chosen deliberately over
    ``groupBy().agg(slice(sort_array(collect_list(...))))``: collect_list
    materializes an entire hot source in one reducer (OOM at 100 TB), while
    the window filter gets the WindowGroupLimit partial-limit rewrite —
    map-side pruning to ``cap`` rows per task per key (plan-asserted in
    tests/test_curation.py).
    """
    order = [F.col(id_col).asc()]
    if quality_col is not None:
        order.insert(0, F.col(quality_col).desc())
    w = Window.partitionBy(source_col).orderBy(*order)
    return (
        df.withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= cap)
    )


def blocklist_filter(
    df: DataFrame,
    source_col: str,
    blocked: DataFrame | Sequence[str],
) -> DataFrame:
    """Drop documents whose source appears in ``blocked`` (a one-column
    DataFrame or an in-memory list).  Broadcast LEFT ANTI join — the
    blocklist side is small by construction, so no shuffle of the corpus;
    NULL sources are never dropped (anti-join semantics: NULL matches
    nothing), matching "unknown host passes to the next gate" curation
    convention."""
    if not isinstance(blocked, DataFrame):
        blocked = df.sparkSession.createDataFrame(
            [(s,) for s in blocked], f"{source_col} STRING"
        )
    bl = blocked.select(F.col(blocked.columns[0]).alias(source_col)).distinct()
    return df.join(F.broadcast(bl), on=source_col, how="left_anti")


def source_mix_report(
    df: DataFrame, source_col: str, *, weight_col: str | None = None
) -> DataFrame:
    """Corpus-composition report: per-source document count, weight sum
    (rows when ``weight_col`` is None) and corpus share — the before/after
    evidence for any cap/blocklist decision.  One partial-agg shuffle on
    the source key; the total is a broadcast one-row aggregate (same
    single-task-window avoidance as operators/skew.py:skew_key_report)."""
    wexpr = (
        F.count(F.lit(1)).cast("double")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("double"))
    )
    per = df.groupBy(F.col(source_col).alias("source_value")).agg(
        F.count(F.lit(1)).alias("n_docs"), wexpr.alias("weight")
    )
    total = per.agg(F.sum("weight").alias("_total"))
    return per.crossJoin(F.broadcast(total)).select(
        "source_value",
        "n_docs",
        "weight",
        (F.col("weight") / F.col("_total")).alias("share"),
    )
