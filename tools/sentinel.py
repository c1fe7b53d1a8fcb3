"""Ambient-load sentinel shared by bench.py / bench_one.py / bench_sf1.py.

This host is a single machine: another Spark session (or any CPU-heavy
process) running alongside a bench inflates timings 20–30% and the record
cannot prove that about itself afterwards (the r9 official headline read
14.96 s vs a quiet 9.96 s with no way to tell noise from regression — the
r9 verdict's #1 finding).  The fix is a fixed, data-independent probe job
timed at known points of every bench run, emitted IN the record: the probe
is serial with the measured queries, so any inflation of the probe's own
wall time is external contention by construction, not our workload.

The probe exercises what co-load steals — all cores plus one shuffle —
and touches no tables, so its quiet-time cost is a stable constant of the
host (~0.3 s on 32 cpus), comparable across rounds.
"""

from __future__ import annotations

import os
import time

#: A start/mid/end sentinel spread wider than this flags the record as
#: measured under varying external load (r9 verdict threshold).
DRIFT_NOISY = 1.3


def prime_sentinel(spark) -> None:
    """Untimed probe executions so the first timed one measures
    steady-state execution.  Four, not one: C2 keeps re-compiling the probe
    for its first ~5 runs (measured idle trajectory 1.19 → 0.63 s), and a
    start-point read taken on that slope fakes a downward "drift" on a
    perfectly quiet host."""
    for _ in range(4):
        _probe(spark)


def run_sentinel(spark) -> dict:
    """Time the fixed probe job (min of 2 back-to-back executions — a
    one-off GC pause only lands in one; the sustained co-load this exists
    to catch inflates both) and snapshot the 1m/5m load averages.

    Returns ``{"sec": min, "secs": [both], "load_1m": .., "load_5m": ..}``.
    The load averages include the bench's own JVM (they climb during any
    run); the probe time is the primary signal — the load numbers let a
    reader corroborate a drifted probe against system-wide pressure.
    """
    settle(spark)
    secs = []
    for _ in range(2):
        t0 = time.time()
        _probe(spark)
        secs.append(round(time.time() - t0, 3))
    try:
        la1, la5, _ = os.getloadavg()
        la1, la5 = round(la1, 2), round(la5, 2)
    except OSError:
        la1 = la5 = None
    return {
        "sec": min(secs),
        "secs": secs,
        "load_1m": la1,
        "load_5m": la5,
        "cpu": _cpu_ticks(),
    }


#: Hypervisor steal above this share of a measurement phase materially
#: moves shuffle-heavy query timings (measured r10: 3–14% steal bursts
#: produced the same inflation pattern as the r9 official-record anomaly).
STEAL_NOISY_PCT = 3.0


def summarize(points: dict[str, dict]) -> dict:
    """Fold named sentinel readings into the record's noise block:
    probe-time spread (``drift_ratio`` = max/min), per-phase hypervisor
    steal%% between consecutive points, and the in-band ``noisy`` verdict
    (drift > 1.3 or steal > 3%% in any phase).  Steal is the authoritative
    signal on this host — it names the neighbor directly, where loadavg
    mostly reflects the bench's own JVM."""
    secs = [p["sec"] for p in points.values() if p.get("sec")]
    drift = round(max(secs) / min(secs), 2) if secs and min(secs) > 0 else None
    names = list(points)
    steal: dict[str, float] = {}
    for a, b in zip(names, names[1:]):
        ca, cb = points[a].get("cpu"), points[b].get("cpu")
        if ca and cb and cb["total"] > ca["total"]:
            steal[f"{a}_to_{b}"] = round(
                100.0 * (cb["steal"] - ca["steal"]) / (cb["total"] - ca["total"]), 2
            )
    max_steal = max(steal.values(), default=None)
    return {
        "points": points,
        "drift_ratio": drift,
        "steal_pct": steal,
        "noisy": bool(drift and drift > DRIFT_NOISY)
        or bool(max_steal is not None and max_steal > STEAL_NOISY_PCT),
    }


def settle(spark) -> None:
    """Remove the run's own JVM confound before a diagnostic measurement:
    one explicit full GC (which also enqueues the ContextCleaner's weak
    refs) plus a short drain, so a drifted probe can only mean the HOST —
    measured r10, the actual late-run inflation source on this box is
    hypervisor steal bursts (3–14%%), which the steal_pct field now names
    directly."""
    try:
        spark._jvm.System.gc()
    except Exception:
        pass
    time.sleep(2.0)


def _cpu_ticks() -> dict | None:
    """Snapshot of /proc/stat's aggregate cpu line — total and steal
    ticks — so consecutive sentinel points yield per-phase steal%%."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:9]]  # user..steal
        return {"total": sum(vals), "steal": vals[7]}
    except (OSError, ValueError, IndexError):
        return None


def _probe(spark) -> None:
    from pyspark.sql import functions as F

    (
        spark.range(0, 16_000_000, 1, 32)
        .select((F.col("id") % 9973).alias("k"), F.col("id"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
