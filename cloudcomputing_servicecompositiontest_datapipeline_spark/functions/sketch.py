"""Mergeable sketches (Apache DataSketches via Spark's ``hll_*`` functions).

The 100 TB cardinality pattern: compute one small HLL sketch per partition /
group / day, STORE the sketches (kilobytes), and merge them later for any
rollup — distinct counts across arbitrary group combinations without
re-touching raw data.  This is the mergeable-summary architecture the
reference's report engine lacks (it recounts from raw on every compile,
``report_generator.py:384``); at scale the sketch column is the only thing
that moves.

``approx_count_distinct`` (HLL++) covers the one-shot case; these helpers
cover the store-and-merge case.  Estimates are implementation-defined, so
sketch outputs are pytest-verified against exact counts (no DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_sketches(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """One HLL sketch per group over ``key_col`` — the storable artifact.
    Output: group columns + ``sketch`` (binary) + ``exact_n`` is NOT
    included (that's the point)."""
    return df.groupBy(*group_cols).agg(F.hll_sketch_agg(key_col).alias("sketch"))


def estimate(df: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Per-row estimate from a sketch column."""
    return df.withColumn("estimate", F.hll_sketch_estimate(sketch_col).cast("long"))


def merged_estimate(df: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union-merge every sketch and estimate the combined cardinality —
    rollup without raw data."""
    return df.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).cast("long").alias("estimate")
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch — the FREQUENCY counterpart of the HLL distinct
# sketch, hand-rolled on built-in expressions (Spark ships no CM function).
# Same store-and-merge architecture: one (depth × width) counter array per
# group/shard/day (kilobytes), merged by element-wise sum, point-queried
# for heavy-hitter estimates.  Guarantees: estimate >= true count always
# (counters only over-count on hash collisions); width w bounds the
# overestimate by ~2N/w per row, and taking the min over depth independent
# rows drives the failure probability down exponentially.
# ---------------------------------------------------------------------------


def _cm_bucket(item: F.Column, r: int, width: int, bucket_hash: str) -> F.Column:
    """Row-``r`` bucket of ``item``: ``xxhash64`` (production, 64-bit avalanche)
    or ``md5_32`` (first 8 hex chars of ``md5("r:item")`` as a 32-bit int —
    engine-portable, so the whole sketch→merge→point-query pipeline can be
    recomputed bit for bit by a SQL oracle; the dedup_simhash precedent)."""
    if bucket_hash == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(r), item), F.lit(width))
    if bucket_hash == "md5_32":
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), item.cast("string"))), 1, 8), 16, 10
        ).cast("long")
        return F.pmod(h, F.lit(width))
    raise ValueError(f"unknown bucket_hash {bucket_hash!r}")


def cm_sketch(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    *,
    depth: int = 4,
    width: int = 256,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """One Count-Min sketch per group: a flat ``depth*width`` LONG array
    in column ``cm``.

    Build shape: explode each item into its ``depth`` (row, bucket) cells,
    ONE groupBy counts cell hits (partial agg compresses the explode
    map-side), then cells collapse to the flat array via an O(size) map
    lookup — the shuffles move (group, cell, count) triples, never items."""
    cells = df.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    (F.lit(r * width) + _cm_bucket(F.col(item_col), r, width, bucket_hash))
                    .cast("int")
                    .alias("c")
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    )
    counts = cells.groupBy(*group_cols, "cell").agg(F.count(F.lit(1)).alias("n"))
    size = depth * width
    cell_map = F.map_from_entries(F.collect_list(F.struct("cell", "n")))
    return counts.groupBy(*group_cols).agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(size - 1)),
            lambda i: F.coalesce(
                F.element_at(cell_map, i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("cm")
    )


def cm_merge(df: DataFrame, group_cols: list[str] | None = None, sketch_col: str = "cm") -> DataFrame:
    """Element-wise-sum sketches (optionally per coarser group) — the rollup
    step.  Only kilobyte arrays move; raw data is never re-touched.

    Merge state is bounded by the SKETCH WIDTH, not the partial count:
    ``posexplode`` each stored sketch to (group, position, value), sum per
    (group, position) — map-side partial aggregation collapses each task's
    partials before the shuffle, reduce state is one long per position —
    then reassemble the array from the width-bounded per-position rows.
    The previous ``collect_list(sketch)``-then-fold form buffered EVERY
    stored partial in one aggregation buffer (a year of per-day partials:
    fine; millions of per-file partials at 100 TB: the
    buffer-∝-input-rows class this repo eliminates everywhere else)."""
    gcols = list(group_cols) if group_cols else []
    ex = df.select(*gcols, F.posexplode(sketch_col).alias("_pos", "_v"))
    sums = ex.groupBy(*gcols, "_pos").agg(F.sum("_v").alias("_s"))
    merged = F.transform(
        F.array_sort(F.collect_list(F.struct("_pos", "_s"))), lambda s: s["_s"]
    )
    gb = sums.groupBy(*gcols) if gcols else sums.groupBy()
    return gb.agg(merged.alias(sketch_col))


def cm_query(
    df: DataFrame,
    item_col,
    *,
    depth: int = 4,
    width: int = 256,
    sketch_col: str = "cm",
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """Point-query: estimated frequency of ``item_col``'s value in each
    row's sketch = min over the depth rows of that item's counter.
    ``bucket_hash`` must match the one the sketch was built with."""
    est = F.least(
        *[
            F.element_at(
                F.col(sketch_col),
                (F.lit(r * width) + _cm_bucket(item_col, r, width, bucket_hash)).cast("int")
                + 1,
            )
            for r in range(depth)
        ]
    )
    return df.withColumn("cm_estimate", est)


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram — the QUANTILE member of the sketch trio
# (HLL = distinct, CM = frequency, histogram = distribution).  Fixed bin
# edges make the merge exact (element-wise sum), unlike sampled summaries;
# quantile error is bounded by one bin width.  approx_percentile covers the
# one-shot case; this covers store-and-merge.
# ---------------------------------------------------------------------------


def hist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """One histogram per group over ``[lo, hi)``: a flat ``n_bins`` LONG
    array in column ``hist`` (values outside the range clamp into the edge
    bins, so totals are preserved).  Same two-shuffle build as cm_sketch:
    (group, bin) counts, then an O(n_bins) collapse — rows never move.

    Non-finite values (NaN/±Inf) are excluded like NULLs BEFORE the bin
    arithmetic: ``floor((inf - lo)/w)`` is a bigint-max under ANSI whose
    int cast RAISES (CAST_OVERFLOW) — one broken reading would kill the
    whole sketch job."""
    from .guards import finite_d

    # divide by the bin width directly (not (v/span)*n_bins, whose two
    # roundings can land edge values one bin low); clamp ON THE DOUBLE,
    # before the int cast — a large-but-finite reading (e.g. 5e12 over a
    # [0,1000) range) floors to a bigint far past int range, and under
    # ANSI the cast itself raises CAST_OVERFLOW before a post-cast clamp
    # could ever run
    bin_width = (hi - lo) / n_bins
    bin_idx = F.floor(
        F.least(
            F.lit(float(n_bins - 1)),
            F.greatest(
                F.lit(0.0), (F.col(value_col).cast("double") - lo) / bin_width
            ),
        )
    ).cast("int")
    counts = (
        df.where(finite_d(F.col(value_col)))
        .select(*group_cols, bin_idx.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bin_map = F.map_from_entries(F.collect_list(F.struct("bin", "n")))
    return counts.groupBy(*group_cols).agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bins - 1)),
            lambda i: F.coalesce(
                F.element_at(bin_map, i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("hist")
    )


def hist_merge(df: DataFrame, group_cols: list[str] | None = None, sketch_col: str = "hist") -> DataFrame:
    """Element-wise-sum histograms — identical law to cm_merge (fixed bin
    edges make merged == whole-data histogram, exactly)."""
    return cm_merge(df, group_cols, sketch_col)


def hist_quantile(
    df: DataFrame, p: float, *, lo: float, hi: float, sketch_col: str = "hist"
) -> DataFrame:
    """Estimate the p-quantile from each row's histogram: first bin where
    the cumulative count reaches p·total, reported as that bin's upper
    edge — error bounded by one bin width.  Pure array expressions."""
    h = F.col(sketch_col)
    total = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)
    cum = F.transform(
        F.sequence(F.lit(1), F.size(h)),
        lambda i: F.aggregate(F.slice(h, 1, i.cast("int")), F.lit(0).cast("long"), lambda a, x: a + x),
    )
    target = (total.cast("double") * p).cast("double")
    # position of the first cumulative >= target (1-based); filter+size is
    # the rank of bins strictly below the target
    below = F.size(F.filter(cum, lambda c: c.cast("double") < target))
    n_bins = F.size(h)
    width = (hi - lo) / 1.0
    edge = F.lit(lo) + (below + 1).cast("double") * (F.lit(width) / n_bins.cast("double"))
    return df.withColumn("quantile_est", F.least(F.lit(float(hi)), edge))
