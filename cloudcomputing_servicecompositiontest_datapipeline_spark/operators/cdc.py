"""Snapshot-diff change-data-capture for incremental corpus ingestion.

A 100 TB corpus is not rebuilt; it is re-crawled.  Each ingest delivers a new
snapshot and the pipeline must process only what changed — the reference's
ingestion re-pulls full objects every run (``s3pull.py:46-94``) and has no
incremental path.  The CDC shape here: compare snapshots by (id, content
hash) with a full outer join, emit only ``added`` / ``removed`` / ``changed``
rows (the unchanged bulk — at 100 TB, almost everything — never leaves the
join).

Scale design: one shuffle on the id for each side; with both snapshots
written bucketed by id (``sources/io.py`` bucketing), the join is
shuffle-free sort-merge.  The content hash is computed pre-join so the join
compares two fixed-width columns, never full documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Hash-compare CDC between two snapshots of the same table.

    Returns ``(id_col, change_type)`` with ``change_type`` in ``added``
    (id only in ``new``), ``removed`` (id only in ``old``), ``changed``
    (both, differing content hash).  Unchanged rows are filtered inside the
    joined projection, so only the delta survives the plan.
    """

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
        return df.select(F.col(id_col), h.alias(f"{alias}_hash"))

    o = hashed(old, "old")
    n = hashed(new, "new")
    joined = o.join(n, on=id_col, how="full_outer")
    return (
        joined.select(
            F.col(id_col),
            F.when(F.col("old_hash").isNull(), F.lit("added"))
            .when(F.col("new_hash").isNull(), F.lit("removed"))
            .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
            .alias("change_type"),
        )
        .where(F.col("change_type").isNotNull())
    )
