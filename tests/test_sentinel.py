"""tools/sentinel: the ambient-load attestation every committed bench
number must carry (r9 verdict #1 — the official 14.96 s vs quiet 9.96 s
headline gap was unprovable-as-noise because the record had no in-band
load signal)."""

from __future__ import annotations

from tools.sentinel import DRIFT_NOISY, run_sentinel, summarize


def test_summarize_flags_drift_above_threshold():
    pts = {
        "start": {"sec": 0.6, "load_1m": 1.0, "load_5m": 1.0},
        "mid": {"sec": 0.9, "load_1m": 9.0, "load_5m": 4.0},
        "end": {"sec": 0.62, "load_1m": 2.0, "load_5m": 2.0},
    }
    s = summarize(pts)
    assert s["drift_ratio"] == 1.5 and s["noisy"] is True
    assert s["points"] is pts


def test_summarize_flags_hypervisor_steal():
    """Flat probe times but >3% steal in a phase must still flag the run —
    steal directly names the co-tenant (the r10 measured cause of the r9
    official-record anomaly: 3-14% bursts)."""
    pts = {
        "start": {"sec": 0.6, "cpu": {"total": 1000, "steal": 0}},
        "mid": {"sec": 0.62, "cpu": {"total": 2000, "steal": 80}},  # 8%
        "end": {"sec": 0.61, "cpu": {"total": 3000, "steal": 90}},  # 1%
    }
    s = summarize(pts)
    assert s["steal_pct"] == {"start_to_mid": 8.0, "mid_to_end": 1.0}
    assert s["noisy"] is True and s["drift_ratio"] < 1.3
    # quiet host: same shape, negligible steal
    for p in pts.values():
        p["cpu"] = dict(p["cpu"], steal=0)
    q = summarize(pts)
    assert q["noisy"] is False and q["steal_pct"]["start_to_mid"] == 0.0


def test_summarize_quiet_run_not_noisy():
    pts = {"start": {"sec": 0.70}, "end": {"sec": 0.70 * DRIFT_NOISY * 0.99}}
    s = summarize(pts)
    assert s["noisy"] is False and s["drift_ratio"] <= DRIFT_NOISY


def test_summarize_degenerate_points():
    assert summarize({})["drift_ratio"] is None
    assert summarize({})["noisy"] is False
    # a zero/missing sec point can't divide-by-zero the ratio
    assert summarize({"a": {"sec": 0.0}, "b": {"sec": 0.5}})["drift_ratio"] == 1.0


def test_run_sentinel_shape(spark):
    r = run_sentinel(spark)
    assert r["sec"] == min(r["secs"]) and len(r["secs"]) == 2
    assert r["sec"] > 0
    assert "load_1m" in r and "load_5m" in r
