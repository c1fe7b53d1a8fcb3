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
    reproducible across engines and partitionings."""
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
