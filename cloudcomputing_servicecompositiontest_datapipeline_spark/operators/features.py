"""Feature-engineering aggregations over event streams (SURVEY.md §2.12):
the per-entity rollup features a training pipeline derives from behavioral
logs — time-decayed activity, recency, intensity.

Scale posture: every feature here reduces to ONE partial-agg shuffle keyed
by the entity id; global anchors (e.g. the corpus max timestamp) are
single-row broadcasts, never windows; per-row terms are quantized onto an
exact integer grid BEFORE summation so the aggregate is fold-order- and
libm-independent (Java Math.exp and glibc exp genuinely differ at ulp level
— measured 867/10000 rows bitwise-different on the sf0.01 events — so
hash-stable decay math must not sum raw doubles).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decayed_activity(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_hours: float = 24.0,
    round_scale: int = 6,
) -> DataFrame:
    """X46 exponentially time-decayed activity score per entity:
    ``score = Σ value·2^(-Δt/half_life)`` with Δt measured to the corpus max
    timestamp — the classic recency-weighted engagement/quality feature
    (standard in feature stores; exponential decay keeps the feature
    incrementally maintainable: old_score · decay + new_batch).

    One single-row max-timestamp broadcast + one groupBy(user) partial-agg
    shuffle.  Per-row terms round to a 1e-``round_scale`` integer grid and
    sum EXACTLY in decimal(38,0) — a 1-ulp libm divergence in exp() can
    only flip a term at a grid boundary (P ≈ 7e-9/row), so the result is
    reproducible across engines and partitionings.

    Rows with a NULL timestamp or value are EXCLUDED up front (documented:
    they cannot be decay-weighted, and counting them in n_events while the
    score skipped them would make the two columns disagree)."""
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    lam = math.log(2.0) / half_life_hours
    mult = float(10**round_scale)
    mx = events.agg(F.max(ts_col).alias("_mx"))
    dmic = F.timestamp_diff("MICROSECOND", F.col(ts_col), F.col("_mx"))
    term = F.col(value_col) * F.exp(F.lit(-lam) * (dmic / F.lit(3.6e9)))
    grid = F.floor(term * mult + 0.5).cast("decimal(38,0)")
    return (
        events.crossJoin(F.broadcast(mx))
        .groupBy(F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(grid).cast("double") / mult).alias("decayed_score"),
            (F.floor(F.min(dmic) / F.lit(3.6e9) * mult + 0.5) / mult).alias(
                "hours_since_last"
            ),
        )
    )


def robust_stats_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    round_scale: int = 6,
) -> DataFrame:
    """X48 robust per-group statistics: exact median and MAD (median
    absolute deviation) of ``value_col`` per group — the outlier-resistant
    monitoring pair (mean/stddev are blown up by exactly the anomalies one
    monitors for).

    Two passes, both reducing to |groups| rows: exact percentile per group
    (Spark's ``percentile`` aggregate), then the deviation pass re-joins
    the per-group median (broadcast — |groups| is bounded for a monitoring
    dimension) and takes the median of |x − med|.  Rounded 1e-6 for
    engine-stable hashing."""
    mult = float(10**round_scale)

    def r6(c):
        return F.floor(c * mult + 0.5) / mult

    med = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = (
        df.join(F.broadcast(med), df[group_col].eqNullSafe(F.col("_g")))
        .select("_g", "n", "_med", F.abs(F.col(value_col) - F.col("_med")).alias("_ad"))
        .groupBy("_g", "n", "_med")
        .agg(F.percentile(F.col("_ad"), F.lit(0.5)).alias("_mad"))
    )
    return dev.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        r6(F.col("_med")).alias("median"),
        r6(F.col("_mad")).alias("mad"),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """X49 cohort-retention matrix: users bucketed by first-seen day, then
    distinct active users per (cohort_day, day_offset) — the standard
    product-analytics rollup, and a representative two-level aggregation
    (per-entity min, re-join, distinct count).

    One groupBy(user) shuffle for first-seen, one shuffle back on the user
    key to tag events (at 100 TB both shuffles hash-partition on the same
    key, so AQE coalesces them into co-partitioned exchanges), then a
    partial-agg distinct count keyed by the (cohort, offset) pair — whose
    cardinality is days², not events.

    Events with a NULL user or timestamp are EXCLUDED up front (documented:
    an anonymous or unstamped event belongs to no cohort; silently letting
    the join/count drop them would hide the data-quality issue — surface it
    with profile/constraint checks upstream)."""
    events = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    day = F.to_date(F.col(ts_col))
    first_seen = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(day).alias("cohort_day")
    )
    tagged = events.join(
        first_seen, events[user_col] == F.col("_u")
    ).select(
        "cohort_day",
        F.datediff(day, F.col("cohort_day")).alias("day_offset"),
        F.col(user_col).alias("_uid"),
    )
    return (
        tagged.groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("_uid").alias("n_active_users"))
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            F.col("n_active_users").cast("long").alias("n_active_users"),
        )
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    k: float = 3.0,
    round_scale: int = 6,
) -> DataFrame:
    """X48b robust outlier flagging: |x − median| > k·MAD per group (the
    modified z-score rule, resistant to the outliers it hunts — a stddev
    threshold would be inflated by them).  Reuses
    :func:`robust_stats_by_group`'s |groups|-row table as a broadcast; the
    flagging pass is row-local.  Groups with MAD = 0 flag any deviation
    (a constant stream moving at all is anomalous).  Returns only the
    flagged rows with their robust z-score."""
    mult = float(10**round_scale)
    stats = robust_stats_by_group(df, group_col, value_col, round_scale=round_scale)
    dev = F.abs(F.col(value_col) - F.col("median"))
    flagged = F.when(F.col("mad") > 0, dev > F.lit(k) * F.col("mad")).otherwise(
        dev > 0
    )
    score = F.when(
        F.col("mad") > 0, F.floor(dev / F.col("mad") * mult + 0.5) / mult
    )
    return (
        df.join(
            F.broadcast(stats.select(F.col(group_col).alias("_g"), "median", "mad")),
            df[group_col].eqNullSafe(F.col("_g")),
        )
        .filter(flagged)
        .select(
            F.col(id_col),
            df[group_col],
            F.col(value_col),
            "median",
            "mad",
            score.alias("robust_z"),
        )
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """X53 ordered-funnel conversion: how many users performed the ``steps``
    event types IN ORDER (first occurrence of each step strictly after the
    previous step's first occurrence) — the standard product funnel, and a
    representative conditional-aggregation shape.

    ONE groupBy(user) pass computes every step's first-occurrence timestamp
    as a conditional ``min``; the order predicate is row-local on that
    |users|-row frame; the final rollup is a single tiny aggregate per
    step.  No self-joins, no windows — cost is one user-keyed shuffle at
    any scale.  Output: (step_index, step, n_users, conversion_rate vs
    step 1, rounded 1e-6).  ``steps`` must be DISTINCT event types — a
    repeated step would compare a first-occurrence timestamp to itself and
    report zero conversions, which is a spec error, not a funnel."""
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be a non-empty list of distinct event types")
    firsts = events.groupBy(F.col(user_col).alias("_u")).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
            for i, s in enumerate(steps)
        ]
    )
    reached = [F.col("_t0").isNotNull()]
    for i in range(1, len(steps)):
        reached.append(reached[i - 1] & (F.col(f"_t{i}") > F.col(f"_t{i-1}")))
    counts = firsts.agg(
        *[F.sum(r.cast("long")).alias(f"_n{i}") for i, r in enumerate(reached)]
    )
    mult = 1000000.0
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(s).alias("step"),
                F.col(f"_n{i}").alias("n_users"),
                (
                    F.floor(
                        F.col(f"_n{i}").cast("double") / F.col("_n0") * mult + 0.5
                    )
                    / mult
                ).alias("conversion_rate"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")
