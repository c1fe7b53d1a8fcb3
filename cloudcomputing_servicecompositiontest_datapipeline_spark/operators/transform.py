"""TLQ Transform stage as one declarative DataFrame chain.

Reference: ``java_template/src/main/java/lambda/Transform.java`` — a single
streaming pass that (1) dedups rows by Order ID keeping the *first occurrence in
file order* (Transform.java:49,58-59,292-294), (2) decodes Order Priority
``L/M/H/C -> Low/Medium/High/Critical`` (Transform.java:65-79,272-287),
(3) derives ``GrossMargin = TotalProfit/TotalRevenue`` (Transform.java:88-91) and
``OrderProcessingTime = days(ShipDate-OrderDate)`` (Transform.java:97-108), with
``"INVALID DATE"`` substitution on parse failure (Transform.java:106-108).

Spark-first re-expression: the fused single pass is exactly what whole-stage
codegen produces from a declarative ``select``/``withColumn`` chain, so no
hand-fusion is needed.  First-wins dedup needs an explicit deterministic order
(Spark's ``dropDuplicates`` keeps an arbitrary row — SURVEY.md §7.3): we use a
``row_number`` window over an ordinal column.  At 100 TB the window shuffles once
on the dedup key — same cost as any groupBy on that key; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Order-priority decode table (Transform.java:65-79).
PRIORITY_DECODE = {"L": "Low", "M": "Medium", "H": "High", "C": "Critical"}


def decode_priority(col: Column) -> Column:
    """P3 categorical decode: chained CASE/WHEN, unknown codes pass through
    (Transform.java:284-287 default branch)."""
    out = None
    for code, label in PRIORITY_DECODE.items():
        out = F.when(col == code, label) if out is None else out.when(col == code, label)
    return out.otherwise(col)


def first_wins_dedup(
    df: DataFrame, key: str | list[str], order: str | Column | list[Column]
) -> DataFrame:
    """D1/D2 first-occurrence dedup: keep the first row per key in ``order``
    (Transform.java:292-294 via HashSet; report_generator.py:209-213 for uuid).

    ``order`` must be a deterministic total order within each key (an ingest
    ordinal, a monotonically_increasing_id taken on a single ordered read, or any
    unique column).  One shuffle on the key; survives scale-out because the
    window is per-key, not global.
    """
    keys = [key] if isinstance(key, str) else list(key)
    orders = order if isinstance(order, list) else [order]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*orders)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def gross_margin(profit: Column, revenue: Column) -> Column:
    """P1 ratio derive with safe divide (Transform.java:88-91; division by zero
    in the reference raises and voids the row — we map to null via try_divide)."""
    return F.try_divide(profit, revenue)


def order_processing_days(ship: Column, order: Column, fmt: str | None = None) -> Column:
    """P2 date-diff derive in whole days (Transform.java:97-108).

    If ``fmt`` is given the inputs are strings parsed with ``to_date`` and a
    parse failure yields null (the reference substitutes "INVALID DATE" —
    Transform.java:106-108; P4 handled by caller via coalesce on a string col).
    """
    if fmt is not None:
        ship, order = F.try_to_date(ship, fmt), F.try_to_date(order, fmt)
    return F.datediff(ship, order)


def tlq_transform(
    df: DataFrame,
    *,
    key: str,
    order: str,
    priority_col: str,
    profit_col: str,
    revenue_col: str,
    ship_col: str,
    order_date_col: str,
) -> DataFrame:
    """The full Transform stage (D1 + P1 + P2 + P3) as one fused chain."""
    return (
        first_wins_dedup(df, key, order)
        .withColumn("order_priority_decoded", decode_priority(F.col(priority_col)))
        .withColumn("gross_margin", gross_margin(F.col(profit_col), F.col(revenue_col)))
        .withColumn(
            "order_processing_time",
            order_processing_days(F.col(ship_col), F.col(order_date_col)),
        )
    )


def global_ordinal(
    df: DataFrame, order_cols: list[Column | str], *, out_col: str = "pos", partitions: int | None = None
) -> DataFrame:
    """Global 1-based rank over ``order_cols`` WITHOUT the single-partition
    window (`Window.orderBy` with no partition moves every row to one task —
    the classic global-sort anti-pattern).

    The distributed shape: range-partition on the sort key so partition
    *i*'s keys all precede partition *i+1*'s, rank within each partition,
    then add per-partition offsets (a tiny count-per-partition aggregate,
    broadcast back).  Two narrow passes over one shuffle — the same plan
    ``zipWithIndex`` uses, expressed in the DataFrame API.  ``order_cols``
    must be a total order for the result to be deterministic.
    """
    n = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(int(n), *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_cnt")
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_rn") + F.col("_offset")).cast("int"))
        .drop("_pid", "_rn", "_offset")
    )
