"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 T5/T6 custom-state form).

Operator: per-container lifetime tracker — the streaming form of the
reference's container bookkeeping (``partestcpu.sh:174-196`` counts runs,
cold starts and recycled containers per uuid; ``report_generator.py:209-213``
dedups by container).  State per key: run count, cold-start count, first/last
event time.  Emits one updated summary row per key per batch; state (not the
stream) is what lives across batches — bounded by key cardinality + timeout,
not stream length.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (runs, cold_starts, first_ts_us, last_ts_us)
STATE_SCHEMA = "runs LONG, cold_starts LONG, first_us LONG, last_us LONG"
OUTPUT_SCHEMA = (
    "uuid STRING, runs LONG, cold_starts LONG, first_us LONG, last_us LONG, recycled BOOLEAN"
)


def _track(
    key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    runs, cold, first_us, last_us = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        runs += len(pdf)
        if "newcontainer" in pdf:
            cold += int(pdf["newcontainer"].fillna(0).sum())
        ts_us = (pdf["ts"].astype("int64") // 1000) if "ts" in pdf else None
        if ts_us is not None and len(ts_us):
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
    state.update((runs, cold, first_us, last_us))
    yield pd.DataFrame(
        {
            "uuid": [key[0]],
            "runs": [runs],
            "cold_starts": [cold],
            "first_us": [first_us],
            "last_us": [last_us],
            # container reuse happened iff more runs than cold starts
            "recycled": [runs > max(cold, 1)],
        }
    )


def container_lifetimes(events: DataFrame, key: str = "uuid") -> DataFrame:
    """Apply the stateful tracker per container key.  Works on a streaming
    input (state persists across micro-batches via the state store)."""
    return events.groupBy(key).applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
