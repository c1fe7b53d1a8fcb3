"""Report-engine operator tests: pipeline state machine, combineSheets,
group-conflict resolution, validity gate, approx-sketch accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.pipeline import (
    Stage,
    run_pipeline,
)
from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
    combine_sheets,
    resolve_group_conflicts,
    validity_gate,
)


def test_pipeline_stage_machine_with_transitions(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "message"])
    stages = [
        # stage 1 consumes "message" renamed to "payload" (transitions P15)
        Stage("derive", lambda d: d.withColumn("derived", F.col("payload") * 2),
              transitions={"message": "payload"}),
        Stage("filter", lambda d: d.filter(F.col("derived") > 25)),
    ]
    out = run_pipeline(df, stages)
    rows = out.collect()
    assert [r.id for r in rows] == [2] and rows[0].derived == 40.0


def test_pipeline_custom_transition_loops_and_stops(spark):
    df = spark.createDataFrame([(0,)], ["n"])
    stages = [Stage("inc", lambda d: d.withColumn("n", F.col("n") + 1))]

    def run_three_times(i, stage, d):  # F2 user transition function
        return 0 if d.first().n < 3 else 1

    out = run_pipeline(df, stages, transition=run_three_times)
    assert out.first().n == 3


def test_pipeline_max_steps_guard(spark):
    df = spark.createDataFrame([(0,)], ["n"])
    stages = [Stage("noop", lambda d: d)]
    with pytest.raises(RuntimeError, match="max_steps"):
        run_pipeline(df, stages, transition=lambda i, s, d: 0, max_steps=5)


def test_combine_sheets_tags_iteration_scoped_keys(spark):
    a = spark.createDataFrame([("vm1", 1.0)], ["vmID", "x"])
    b = spark.createDataFrame([("vm1", 2.0)], ["vmID", "x"])
    out = combine_sheets([a, b]).collect()
    keys = sorted((r.iteration, r.vmID_iter) for r in out)
    assert keys == [(0, "vm1[0]"), (1, "vm1[1]")]  # same vm never merges across iters


def test_resolve_group_conflicts(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], ["vmID", "vmuptime", "containerID", "uuid"])
    out = resolve_group_conflicts(df, ["vmuptime", "uuid", "cpuType"])
    assert out == ["cpuType"]  # finer keys supersede both proxies
    df2 = spark.createDataFrame([(1,)], ["vmuptime"])
    assert resolve_group_conflicts(df2, ["vmuptime"]) == ["vmuptime"]


def test_validity_gate_drops_versionless_runs(spark):
    df = spark.createDataFrame([(0.5, "a"), (None, "b")], ["version", "x"])
    assert [r.x for r in validity_gate(df).collect()] == ["a"]


def test_ztenancy_group_section(spark):
    """zTenancy[vmID] as an outputGroups key (report_generator.py:230-255):
    label is '<vm cpuType> - <uses>'; section groups on the derived label."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
        ReportConfig,
        report,
    )

    rows = [
        ("vm1", "Intel", 10.0), ("vm1", "Intel", 20.0), ("vm1", "Intel", 30.0),
        ("vm2", "AMD", 5.0),
    ]
    df = spark.createDataFrame(rows, ["vmID", "cpuType", "runtime"])
    sections = report(df, ReportConfig(output_groups=["zTenancy[vmID]"]))
    got = {r["zTenancy[vmID]"]: r for r in sections["zTenancy[vmID]"].collect()}
    assert set(got) == {"Intel - 3", "AMD - 1"}
    assert got["Intel - 3"].uses == 3 and got["Intel - 3"].avg_runtime == 20.0
    # tenants[vmID] is a derived numeric column and gets averaged like the ref
    assert got["Intel - 3"]["avg_tenants[vmID]"] == 3.0


def test_ztenancy_iteration_scoped_key_supersedes(spark):
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
        ReportConfig,
        combine_sheets,
        report,
    )

    a = spark.createDataFrame([("vm1", "Intel", 1.0)], ["vmID", "cpuType", "runtime"])
    b = spark.createDataFrame([("vm1", "Intel", 2.0)], ["vmID", "cpuType", "runtime"])
    combined = combine_sheets([a, b])
    sections = report(
        combined,
        ReportConfig(output_groups=["zTenancy[vmID]", "zTenancy[vmID[iteration]]"]),
    )
    # plain vmID tenancy dropped (would merge runs across iterations — §7.3)
    assert "zTenancy[vmID]" not in sections
    got = {r["zTenancy[vmID[iteration]]"] for r in sections["zTenancy[vmID[iteration]]"].collect()}
    assert got == {"Intel - 1"}  # each iteration's vm counted separately


def test_output_raw_of_group_sections(spark):
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
        ReportConfig,
        report,
    )

    df = spark.createDataFrame(
        [("Intel", 1, 1.0), ("AMD", 2, 2.0)], ["cpuType", "run_id", "runtime"]
    )
    sections = report(
        df,
        ReportConfig(
            output_groups=["cpuType"],
            output_raw_of_group=["cpuType"],
            ignore_from_groups=["run_id"],
        ),
    )
    assert "raw:cpuType" in sections
    assert "run_id" not in sections["raw:cpuType"].columns  # group ignores applied
    assert sections["raw:cpuType"].count() == 2


def test_add_pipeline_metrics_naming(spark):
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
        add_pipeline_metrics,
    )

    rows = [(0, 0, 1, 10.0), (0, 0, 2, 5.0), (0, 1, 1, 7.0)]
    df = spark.createDataFrame(rows, ["1_run_id", "2_thread_id", "3_pipeline_stage", "runtime"])
    out = add_pipeline_metrics(df, ["runtime"])
    got = {
        (r["1_run_id"], r["2_thread_id"], r["3_pipeline_stage"]): r["runtimePipeline"]
        for r in out.collect()
    }
    assert got == {(0, 0, 1): 10.0, (0, 0, 2): 15.0, (0, 1, 1): 7.0}


def test_golden_ztenancy_label_matches_reference_artifact(spark):
    """The reference's exampleReport.json publishes zTenancy[vmID] labels;
    reproduce the '<cpuType> - <uses>' stamp from its raw runs."""
    import io

    import pandas as pd

    try:
        text = open("/root/reference/test/history/exampleOutput.csv").read()
    except FileNotFoundError:
        import pytest

        pytest.skip("reference artifact not present")
    from tests.test_golden_parity import _extract_section

    raw = _extract_section(text, "1_run_id,")
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
        add_tenancy_columns,
    )

    df = add_tenancy_columns(spark.createDataFrame(raw), "uuid", "cpuType")
    labels = {r["zTenancy[uuid]"] for r in df.collect()}
    # all 7 runs share one container -> single '<cpuType> - 7' label
    assert labels == {raw["cpuType"].iloc[0] + " - 7"}


def test_report_stamps_runtime_overlap_and_pipeline_metrics(spark):
    """report() auto-derives runtimeOverlap (report_generator.py:91-111) and
    cumulative pipeline columns (:113-164) when the record shape has them."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import (
        ReportConfig,
        report,
    )

    rows = [
        # (rid, run, thread, stage, start, end, runtime)
        (0, 0, 0, 1, 0, 10, 5.0),
        (1, 0, 0, 2, 5, 15, 7.0),   # overlaps rid 0 by 5/10
        (2, 1, 0, 1, 100, 110, 3.0),  # no overlap
    ]
    df = spark.createDataFrame(
        rows,
        ["rid", "1_run_id", "2_thread_id", "3_pipeline_stage", "startTime", "endTime", "runtime"],
    )
    sections = report(df, ReportConfig(run_id_col="rid"))
    raw = {r.rid: r for r in sections["raw"].collect()}
    assert raw[0]["runtimeOverlap"] == 0.5
    assert raw[1]["runtimeOverlap"] == 0.5
    assert raw[2]["runtimeOverlap"] == 0.0
    assert raw[1]["runtimePipeline"] == 12.0  # 5 + 7 within (run 0, thread 0)
    assert raw[2]["runtimePipeline"] == 3.0


def test_approx_sketches_close_to_exact(spark, sf_dir):
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    ev = star.table(spark, sf_dir, "events")
    row = (
        ev.agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
            F.expr("percentile(value, 0.5)").alias("exact_med"),
            F.percentile_approx("value", 0.5).alias("approx_med"),
        ).first()
    )
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.approx_med - row.exact_med) <= 1.0


def test_hll_sketch_store_and_merge(spark, sf_dir):
    """Stored per-group sketches merge to the same answer as counting raw:
    per-group estimates and the union-merged global estimate both land
    within HLL tolerance of exact distinct counts."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions import sketch
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    ev = star.table(spark, sf_dir, "events")
    stored = sketch.group_sketches(ev, "user_id", ["event_type"])

    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for r in sketch.estimate(stored).collect():
        assert abs(r.estimate - exact[r.event_type]) / exact[r.event_type] < 0.05

    global_exact = ev.agg(F.countDistinct("user_id")).first()[0]
    merged = sketch.merged_estimate(stored).first().estimate
    assert abs(merged - global_exact) / global_exact < 0.05


def test_hll_portable_merge_law_and_accuracy(spark, sf_dir):
    """The md5_32 portable-HLL twin (the oracle-checked declared mode of
    sketch_distinct_rollup): (a) element-wise-max merge of per-day shards
    equals the direct whole-data register array — the law that makes the
    artifact storable; (b) the linear-counting-corrected estimate (the
    production small-range branch, applied here on the exported
    zero_registers diagnostic) lands within HLL tolerance of the exact
    distinct count, keeping it honest vs the DataSketches path."""
    import math

    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions import sketch
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    ev = star.table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    ev = ev.withColumn("day", F.to_date("ts"))

    daily = sketch.hll_portable_registers(ev, "user_id", ["event_type", "day"])
    merged = sketch.hll_portable_merge(daily, ["event_type"])
    direct = sketch.hll_portable_registers(ev, "user_id", ["event_type"])
    m_rows = {r.event_type: r.hll for r in merged.collect()}
    d_rows = {r.event_type: r.hll for r in direct.collect()}
    assert m_rows == d_rows  # max-merge ≡ sketch of the union, exactly

    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for r in sketch.hll_portable_estimate(merged, ["event_type"]).collect():
        est = r.estimate
        # linear counting in the small range (raw <= 2.5m, zeros present) —
        # the correction the declared query leaves to callers
        if est <= 2.5 * sketch.HLL_M and r.zero_registers > 0:
            est = sketch.HLL_M * math.log(sketch.HLL_M / r.zero_registers)
        n = exact[r.event_type]
        assert abs(est - n) / n < 0.15, (r.event_type, est, n)


def test_hll_bitlen_ladder_matches_python(spark):
    """The integer CASE ladder (Spark) and its generated DuckDB twin both
    equal int.bit_length on boundary and random window values — the
    arithmetic replacement for the engine-version-sensitive
    length(bin(x))/conv(x,10,2) string bit-length (the r8 driver red)."""
    import random

    import duckdb

    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions import sketch

    rng = random.Random(9)
    win = 1 << sketch._HLL_W
    vals = sorted(
        {0, 1, 2, 3, win - 1, win // 2, win // 2 - 1}
        | {(1 << b) - 1 for b in range(1, sketch._HLL_W + 1)}
        | {1 << b for b in range(sketch._HLL_W)}
        | {rng.randrange(win) for _ in range(200)}
    )
    df = spark.createDataFrame([(v,) for v in vals], ["w"])
    got = [
        r[0]
        for r in df.select(sketch._hll_bitlen(F.col("w")).alias("b"))
        .orderBy("w")
        .collect()
    ]
    assert got == [v.bit_length() for v in vals]
    sql = f"SELECT {sketch.hll_bitlen_sql('w')} FROM (SELECT unnest(?) AS w)"
    duck = [r[0] for r in duckdb.sql(sql, params=[vals]).fetchall()]
    assert duck == [v.bit_length() for v in vals]


def test_asof_backward_join_semantics(spark):
    """<= tie inclusion, strictly-later exclusion, and null when no match."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.joins import asof_backward_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 70), (3, "v", 10), (4, "w", 99)],
        ["id", "key", "t"],
    )
    right = spark.createDataFrame(
        [("u", 100), ("u", 60), ("u", 200), ("v", 11)], ["key", "rt"]
    )
    out = {
        r.id: r.asof_ts
        for r in asof_backward_join(
            left, right, key="key", left_ts="t", right_ts="rt"
        ).collect()
    }
    assert out[1] == 100  # tie at equal ts is included (<=)
    assert out[2] == 60   # later right rows (100, 200) excluded
    assert out[3] is None  # v's only click is strictly later
    assert out[4] is None  # key with no right rows at all


def test_binned_overlap_matches_allpairs(spark):
    """Binned self-join must reproduce the all-pairs scores exactly,
    including pairs spanning many bins (counted once) and partner-less rows
    (score 0)."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.joins import (
        binned_runtime_overlap,
        runtime_overlap,
    )

    rows = [
        (1, 0, 100),      # overlaps 2, 3
        (2, 50, 250),     # long: spans many bins at W=40
        (3, 90, 100),     # touches 1 and 2
        (4, 1000, 1100),  # isolated → 0
        (5, 240, 260),    # overlaps 2 across a bin boundary
        (6, 300, 300),    # zero-length inside nothing → 0
    ]
    df = spark.createDataFrame(rows, ["id", "s", "e"])
    exact = {
        r.id: r.overlap_score
        for r in runtime_overlap(
            df, id_col="id", start_col="s", end_col="e", demo_max_rows=100
        ).collect()
    }
    for w in (40, 64, 1000):  # bin width smaller, comparable, larger than spans
        binned = {
            r.id: r.overlap_score
            for r in binned_runtime_overlap(
                df, id_col="id", start_col="s", end_col="e", bin_width=w
            ).collect()
        }
        assert binned == exact, f"bin_width={w}"


def test_cm_sketch_frequency_bounds_and_merge_law(spark):
    """Count-Min sketch: estimates never undercount, hit exactly at
    low collision rates, and merging per-shard sketches is element-wise
    IDENTICAL to sketching the union (the law that makes them storable)."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.sketch import (
        cm_merge,
        cm_query,
        cm_sketch,
    )

    # 3 items with known counts, dealt across 2 shards
    rows = [("a",)] * 100 + [("b",)] * 30 + [("c",)] * 7
    df = spark.createDataFrame(rows, "item STRING").withColumn(
        "shard", (F.monotonically_increasing_id() % 2).cast("int")
    )
    exact = {"a": 100, "b": 30, "c": 7}

    whole = cm_sketch(df, "item", [])
    per_shard = cm_sketch(df, "item", ["shard"])
    merged = cm_merge(per_shard)
    w = whole.collect()[0].cm
    m = merged.collect()[0].cm
    assert w == m  # merge law: sum of shard sketches == sketch of union
    assert sum(w) == 4 * 137  # every occurrence lands in each of 4 rows

    items = spark.createDataFrame([(k,) for k in exact], "item STRING")
    est = {
        r.item: r.cm_estimate
        for r in cm_query(items.crossJoin(whole), F.col("item")).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n  # CM never undercounts
        assert est[k] == n  # 3 items in 4x256 cells: collision-free


def test_cm_sketch_md5_mode_matches_xxhash_bounds(spark):
    """The engine-portable md5_32 bucket mode (the
    sketch_frequency_heavy_hitters oracle path) must satisfy the SAME CM
    guarantees as the production xxhash64 mode: never undercounts, exact at
    low collision rates, merge law holds, and a Python md5 model reproduces
    the bucket placement bit for bit."""
    import hashlib

    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.sketch import (
        cm_merge,
        cm_query,
        cm_sketch,
    )

    rows = [("a",)] * 100 + [("b",)] * 30 + [("c",)] * 7
    df = spark.createDataFrame(rows, "item STRING").withColumn(
        "shard", (F.monotonically_increasing_id() % 2).cast("int")
    )
    exact = {"a": 100, "b": 30, "c": 7}
    whole = cm_sketch(df, "item", [], bucket_hash="md5_32")
    merged = cm_merge(cm_sketch(df, "item", ["shard"], bucket_hash="md5_32"))
    w = whole.collect()[0].cm
    assert w == merged.collect()[0].cm  # merge law is hash-independent
    assert sum(w) == 4 * 137
    # bucket placement agrees with the portable md5 definition exactly
    for item, n in exact.items():
        for r in range(4):
            b = int(hashlib.md5(f"{r}:{item}".encode()).hexdigest()[:8], 16) % 256
            assert w[r * 256 + b] >= n
    items = spark.createDataFrame([(k,) for k in exact], "item STRING")
    est = {
        r.item: r.cm_estimate
        for r in cm_query(
            items.crossJoin(whole), F.col("item"), bucket_hash="md5_32"
        ).collect()
    }
    for k, n in exact.items():
        assert est[k] == n  # 3 items in 4x256 cells: collision-free
    with pytest.raises(ValueError, match="unknown bucket_hash"):
        cm_sketch(df, "item", [], bucket_hash="crc32")


def test_cm_sketch_null_items_excluded_in_both_modes(spark):
    """NULL items must not be counted in EITHER hash mode (r8 ADVICE: the
    post-explode cell filter only caught md5 mode — xxhash64 hashes NULL to
    a real bucket, so the two modes diverged on null-bearing corpora).
    Both modes' sketches of a null-bearing corpus must equal the sketches
    of the same corpus with nulls pre-dropped."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.sketch import cm_sketch

    rows = [("a",)] * 5 + [(None,)] * 3 + [("b",)] * 2
    df = spark.createDataFrame(rows, "item STRING")
    clean = df.where(F.col("item").isNotNull())
    for mode in ("xxhash64", "md5_32"):
        w_null = cm_sketch(df, "item", [], bucket_hash=mode).collect()[0].cm
        w_clean = cm_sketch(clean, "item", [], bucket_hash=mode).collect()[0].cm
        assert w_null == w_clean, mode
        assert sum(w_null) == 4 * 7  # depth * non-null rows


def test_hist_sketch_merge_law_and_quantile_bound(spark):
    """Histogram sketch: shard-merge equals whole-data histogram exactly;
    quantile estimates land within one bin width of the true quantile."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.sketch import (
        hist_merge,
        hist_quantile,
        hist_sketch,
    )

    vals = [float(v) for v in range(1000)]  # uniform 0..999
    df = spark.createDataFrame(
        [(v, int(v) % 3) for v in vals], "v DOUBLE, shard INT"
    )
    lo, hi, n_bins = 0.0, 1000.0, 50  # bin width 20
    whole = hist_sketch(df, "v", [], lo=lo, hi=hi, n_bins=n_bins)
    merged = hist_merge(hist_sketch(df, "v", ["shard"], lo=lo, hi=hi, n_bins=n_bins))
    w = whole.collect()[0].hist
    assert w == merged.collect()[0].hist  # exact merge law
    assert sum(w) == 1000 and all(c == 20 for c in w)  # uniform fill

    for p, true_q in ((0.5, 499.5), (0.9, 899.1), (0.99, 989.01)):
        est = hist_quantile(whole, p, lo=lo, hi=hi).collect()[0].quantile_est
        assert abs(est - true_q) <= (hi - lo) / n_bins + 1e-9  # one bin width


def test_exact_aggregates_exclude_nonfinite_consistently(spark):
    """dsum/davg defined semantics for dirty doubles: NaN/±Inf have no
    decimal representation (Spark's decimal cast NULLs them even under
    ANSI), so they drop out of the sum AND the mean's denominator together
    — a denominator that still counted them would silently bias every mean
    (the pre-r6 davg bug).  sql_dsum/sql_davg mirror with try_cast, where
    a plain DuckDB cast would RAISE on the first non-finite row."""
    import duckdb
    from pyspark.sql import functions as F

    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.exact import (
        davg,
        dsum,
        sql_davg,
        sql_dsum,
    )

    nan, inf = float("nan"), float("inf")
    rows = [
        ("a", 1.0), ("a", 3.0), ("a", nan),
        ("b", 2.0), ("b", inf),
        ("c", nan),
        # a huge FINITE double has no decimal(28,4) representation either:
        # ANSI's plain cast RAISES NUMERIC_VALUE_OUT_OF_RANGE on it (where
        # it silently NULLs NaN/Inf) — try_cast is what keeps one garbage
        # reading from killing the aggregate
        ("b", 1e30),
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    got = {
        r.g: (r.s, r.m)
        for r in df.groupBy("g")
        .agg(dsum(F.col("v"), "s"), davg(F.col("v"), "m"))
        .collect()
    }
    assert got["a"] == (4.0, 2.0)  # NaN out of numerator AND denominator
    assert got["b"] == (2.0, 2.0)
    assert got["c"] == (None, None)  # all-dirty group: NULL, not a /0 crash

    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = {
        g: (s, m)
        for g, s, m in con.execute(
            f"SELECT g, {sql_dsum('v', 's')}, {sql_davg('v', 'm')} FROM t GROUP BY g"
        ).fetchall()
    }
    assert oracle == got  # engine parity holds on dirty data too


def test_hist_sketch_survives_nonfinite_values(spark):
    """floor((inf - lo)/width) is a bigint-max whose ANSI int cast raises
    CAST_OVERFLOW — one broken reading must not kill the sketch job.
    Non-finite values are excluded like NULLs; finite counts unchanged."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.sketch import hist_sketch

    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 9.0), ("g", nan), ("g", inf), ("g", -inf), ("g", None)],
        "g STRING, v DOUBLE",
    )
    [row] = hist_sketch(df, "v", ["g"], lo=0.0, hi=10.0, n_bins=4).collect()
    assert sum(row.hist) == 3 and row.hist == [2, 0, 0, 1]


def test_capped_distinct_list_matches_collect_set_form_with_bounded_state(spark):
    """capped_distinct_list must return exactly slice(sort_array(
    collect_set(c)), 1, cap) per group — while its plan shows the
    WindowGroupLimit map-side prune that bounds aggregation state by the
    cap instead of the group's distinct count (the buffer-∝-distinct
    hazard class, per-group edition)."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.report import capped_distinct_list

    rows = [(i % 7, f"v{(i * 13) % 29:02d}") for i in range(300)] + [(3, None)]
    df = spark.createDataFrame(rows, "k INT, c STRING")
    cap = 4
    out = capped_distinct_list(df, "k", "c", cap=cap)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # map-side prune to cap per key
    got = {r.k: (r.c_list, r.n_listed) for r in out.collect()}
    ref = {
        r.k: r.lst
        for r in df.groupBy("k")
        .agg(F.slice(F.sort_array(F.collect_set("c")), 1, cap).alias("lst"))
        .collect()
    }
    assert set(got) == set(ref)
    for k, (lst, n) in got.items():
        assert lst == ",".join(ref[k])
        assert n == len(ref[k])


def test_hist_sketch_clamps_large_finite_values_into_edge_bins(spark):
    """A large-but-FINITE reading (e.g. 5e12 over a [0,1000) range) floors
    to a bigint far past int range — the clamp must happen ON THE DOUBLE,
    before the int cast, or ANSI raises CAST_OVERFLOW and one such reading
    kills the whole sketch job (r6 advice).  Out-of-range values clamp
    into the edge bins so totals are preserved."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.sketch import hist_sketch

    df = spark.createDataFrame(
        [("g", 5e12), ("g", -5e12), ("g", 500.0), ("g", 999.999)],
        "g STRING, v DOUBLE",
    )
    [row] = hist_sketch(df, "v", ["g"], lo=0.0, hi=1000.0, n_bins=4).collect()
    assert sum(row.hist) == 4
    assert row.hist == [1, 0, 1, 2]  # -5e12 -> bin 0; 5e12 -> top bin
