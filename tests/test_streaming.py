"""Streaming-layer tests: real file streams with Trigger.AvailableNow,
event-time windows with watermark + late-data drop."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming import (
    available_now_compile,
    session_windowed_counts,
    tumbling_windowed_agg,
)

SCHEMA = "run_id BIGINT, uuid STRING, value DOUBLE, ts STRING"


@pytest.fixture()
def run_dir(tmp_path):
    d = tmp_path / "runs"
    d.mkdir()
    for i in range(6):
        rec = {"run_id": i, "uuid": f"c{i % 2}", "value": float(i), "ts": f"2024-01-01 00:0{i}:00"}
        (d / f"run{i}.json").write_text(json.dumps(rec))
    return str(d)


def test_available_now_drains_all_then_incrementally(spark, run_dir, tmp_path):
    ckpt, outdir = str(tmp_path / "ckpt"), str(tmp_path / "out")
    out = available_now_compile(
        spark, run_dir, _parse_datatype_string(SCHEMA), checkpoint=ckpt, output_dir=outdir
    )
    assert out.count() == 6
    # a new record lands in the "bucket"; the re-drain is incremental (only
    # the new file is read, cumulative table now holds all 7)
    with open(os.path.join(run_dir, "run7.json"), "w") as f:
        json.dump({"run_id": 7, "uuid": "c1", "value": 7.0, "ts": "2024-01-01 00:07:00"}, f)
    out2 = available_now_compile(
        spark, run_dir, _parse_datatype_string(SCHEMA), checkpoint=ckpt, output_dir=outdir
    )
    assert {r.run_id for r in out2.collect()} == set(range(6)) | {7}


def test_streaming_tumbling_window_counts_match_batch(spark, run_dir, tmp_path):
    stream = (
        spark.readStream.schema(_parse_datatype_string(SCHEMA))
        .json(run_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = tumbling_windowed_agg(stream, window="2 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["win"].start.strftime("%H:%M"): r.n_events
        for r in spark.table("t_win").collect()
    }
    assert got == {"00:00": 2, "00:02": 2, "00:04": 2}


def test_watermark_drops_late_data(spark, tmp_path):
    d = tmp_path / "late"
    d.mkdir()
    # batch 1: on-time records advance the watermark far ahead
    with open(d / "a.json", "w") as f:
        for i in range(3):
            f.write(json.dumps({"run_id": i, "uuid": "c0", "value": 1.0, "ts": f"2024-01-01 02:0{i}:00"}) + "\n")
    stream = (
        spark.readStream.schema(_parse_datatype_string(SCHEMA))
        .json(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    ckpt, outdir = str(tmp_path / "ckpt_late"), str(tmp_path / "out_late")

    def drain():
        stream = (
            spark.readStream.schema(_parse_datatype_string(SCHEMA))
            .json(str(d))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        agg = tumbling_windowed_agg(stream, window="1 minute", watermark="5 minutes")
        out = agg.select(F.col("win.start").alias("ws"), "n_events")
        q = (
            out.writeStream.format("parquet").option("path", outdir)
            .option("checkpointLocation", ckpt).outputMode("append")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    # batch 2: a record an hour older than the watermark horizon → dropped
    with open(d / "b.json", "w") as f:
        f.write(json.dumps({"run_id": 9, "uuid": "c0", "value": 1.0, "ts": "2024-01-01 01:00:00"}) + "\n")
    drain()
    # a third drain gives finalized on-time windows a chance to flush
    with open(d / "c.json", "w") as f:
        f.write(json.dumps({"run_id": 10, "uuid": "c0", "value": 1.0, "ts": "2024-01-01 03:00:00"}) + "\n")
    drain()
    emitted = spark.read.parquet(outdir).collect()
    assert all(r.ws.hour != 1 for r in emitted)  # late 01:00 window never emitted
    assert any(r.ws.hour == 2 for r in emitted)  # on-time windows were emitted


def test_stream_stream_overlap_join(spark, tmp_path):
    """T4: concurrent runs on the same container are paired by the
    stream-stream range join; distant-in-time runs are not."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming import (
        stream_stream_overlap_join,
    )

    d = tmp_path / "ss"
    d.mkdir()
    recs = [
        {"run_id": 0, "uuid": "c0", "value": 1.0, "ts": "2024-01-01 00:00:00"},
        {"run_id": 1, "uuid": "c0", "value": 1.0, "ts": "2024-01-01 00:05:00"},  # within 10m of 0
        {"run_id": 2, "uuid": "c0", "value": 1.0, "ts": "2024-01-01 06:00:00"},  # far away
        {"run_id": 3, "uuid": "c1", "value": 1.0, "ts": "2024-01-01 00:05:00"},  # other container
    ]
    with open(d / "a.json", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    def stream():
        return (
            spark.readStream.schema(_parse_datatype_string(SCHEMA))
            .json(str(d))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    joined = stream_stream_overlap_join(stream(), stream(), key="uuid")
    q = (
        joined.writeStream.format("memory").queryName("t_ss")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    pairs = {(r.run_a, r.run_b) for r in spark.table("t_ss").collect()}
    assert pairs == {(0, 1), (1, 0)}  # only the concurrent same-container pair


def test_observe_progress_metrics(spark, run_dir, tmp_path):
    """T2: progress tracking (experiment_caller.py:103-111 .progress.txt) →
    the library's attach_progress/progress_records pair, also exposed as
    Engine.observe_stream / Engine.stream_progress."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.api import Engine
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.core import (
        attach_progress,
        progress_records,
    )

    stream = spark.readStream.schema(_parse_datatype_string(SCHEMA)).json(run_dir)
    observed = attach_progress(
        stream,
        metrics=[
            F.count(F.lit(1)).alias("n_records"),
            F.sum("value").alias("sum_value"),
        ],
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt_obs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    recs = progress_records(q)
    with_data = [r for r in recs if r.get("n_records")]
    assert with_data and with_data[0]["n_records"] == 6
    assert with_data[0]["num_input_rows"] == 6
    assert "batch_id" in with_data[0]

    # the same pair through the Engine facade, default metric (count)
    eng = Engine(spark)
    q2 = (
        eng.observe_stream(
            spark.readStream.schema(_parse_datatype_string(SCHEMA)).json(run_dir)
        )
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt_obs2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    recs2 = [r for r in eng.stream_progress(q2) if r.get("n_records")]
    assert recs2 and recs2[0]["n_records"] == 6


def test_stateful_container_lifetimes_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-container state persists across
    micro-batches (runs accumulate, cold starts counted once)."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.stateful import (
        container_lifetimes,
    )

    d = tmp_path / "stateful"
    d.mkdir()
    schema = "run_id BIGINT, uuid STRING, newcontainer INT, ts TIMESTAMP"
    with open(d / "a.json", "w") as f:
        f.write(json.dumps({"run_id": 0, "uuid": "c0", "newcontainer": 1, "ts": "2024-01-01 00:00:00"}) + "\n")
        f.write(json.dumps({"run_id": 1, "uuid": "c0", "newcontainer": 0, "ts": "2024-01-01 00:01:00"}) + "\n")
    ckpt = str(tmp_path / "ckpt_state")

    def drain(qname):
        stream = spark.readStream.schema(_parse_datatype_string(schema)).json(str(d))
        out = container_lifetimes(stream)
        rows = {}

        def sink(batch_df, _epoch):
            for r in batch_df.collect():
                rows[r.uuid] = r

        q = (
            out.writeStream.foreachBatch(sink).outputMode("update")
            .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return rows

    got = drain("t_state1")
    assert got["c0"].runs == 2 and got["c0"].cold_starts == 1 and got["c0"].recycled
    # batch 2: one more run on c0 and a fresh container c1
    with open(d / "b.json", "w") as f:
        f.write(json.dumps({"run_id": 2, "uuid": "c0", "newcontainer": 0, "ts": "2024-01-01 00:05:00"}) + "\n")
        f.write(json.dumps({"run_id": 3, "uuid": "c1", "newcontainer": 1, "ts": "2024-01-01 00:05:00"}) + "\n")
    got2 = drain("t_state2")
    assert got2["c0"].runs == 3  # state carried across drains
    assert got2["c1"].runs == 1 and not got2["c1"].recycled


def test_session_window_batch(spark):
    rows = [
        (0, "u1", 1.0, "2024-01-01 00:00:00"),
        (1, "u1", 1.0, "2024-01-01 00:03:00"),   # same session (< 5 min gap)
        (2, "u1", 1.0, "2024-01-01 01:00:00"),   # new session
        (3, "u2", 1.0, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, ["run_id", "user_id", "value", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = session_windowed_counts(df, gap="5 minutes")
    got = sorted((r.user_id, r.n_events) for r in out.collect())
    assert got == [("u1", 1), ("u1", 2), ("u2", 1)]


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """Duplicate content arriving across micro-batches within the watermark
    horizon is dropped; distinct content passes through."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.core import stream_exact_dedup

    src = tmp_path / "docs"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "the quick brown fox", "ts": "2024-01-01 00:00:00"},
        {"doc_id": 2, "text": "The  quick brown fox ", "ts": "2024-01-01 00:01:00"},  # dup after normalize
        {"doc_id": 3, "text": "something else entirely", "ts": "2024-01-01 00:02:00"},
    ]
    for r in rows:
        with open(src / f"doc{r['doc_id']}.json", "w") as f:
            json.dump(r, f)
    stream = (
        spark.readStream.schema("doc_id INT, text STRING, ts STRING")
        .option("maxFilesPerTrigger", 1)  # one doc per micro-batch
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream_exact_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.table("dedup_stream").collect()}
    assert 3 in kept and len(kept) == 2  # one of {1,2} survives, never both
    assert kept - {1, 2, 3} == set()


def test_foreach_batch_idempotent_append(spark, tmp_path):
    """A replayed batch id must not double-write; a fresh batch id must."""
    import pandas as pd

    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.core import (
        foreach_batch_idempotent_append,
    )

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"x": [1, 2, 3]}).to_json(src / "a.json", orient="records", lines=True)
    out = str(tmp_path / "out")
    q = foreach_batch_idempotent_append(
        spark.readStream.schema("x LONG").json(str(src)),
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert spark.read.parquet(out + "/data").count() == 3

    # simulate a failure replay: re-run the committed batch function directly
    import os

    markers = [m for m in os.listdir(out) if m.startswith("_committed_")]
    assert markers, "marker missing"
    # second drain over the same source with the same checkpoint: no new data,
    # no duplicate writes
    q2 = foreach_batch_idempotent_append(
        spark.readStream.schema("x LONG").json(str(src)),
        out,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    assert spark.read.parquet(out + "/data").count() == 3


def test_stream_static_enrich_broadcasts_dim(spark, run_dir, tmp_path):
    """J4 streaming form: every stream record is stamped with its static
    config row via a per-batch broadcast join; keys missing from the dim
    stay (left join, annotate-don't-drop)."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming import (
        stream_static_enrich,
    )

    dim = spark.createDataFrame(
        [("c0", "endpoint-a", 512)], ["uuid", "endpoint", "mem_mb"]
    )
    stream = spark.readStream.schema(_parse_datatype_string(SCHEMA)).json(run_dir)
    enriched = stream_static_enrich(stream, dim, "uuid")
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_enrich")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_enrich").collect()
    assert len(rows) == 6
    by_uuid = {}
    for r in rows:
        by_uuid.setdefault(r.uuid, set()).add((r.endpoint, r.mem_mb))
    assert by_uuid["c0"] == {("endpoint-a", 512)}
    assert by_uuid["c1"] == {(None, None)}  # unmatched keys annotated with nulls


def test_foreach_batch_keyed_upsert(spark, tmp_path):
    """Latest record per key wins across drains; tombstones delete; replay
    with the same checkpoint is a no-op."""
    import pandas as pd

    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.core import (
        foreach_batch_keyed_upsert,
    )

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "k LONG, val STRING, deleted BOOLEAN"

    def drain():
        q = foreach_batch_keyed_upsert(
            spark.readStream.schema(schema).json(str(src)),
            "k",
            state,
            ckpt,
            delete_col="deleted",
        )
        q.awaitTermination()
        with open(state + "/_current") as f:
            return {r.k: r.val for r in spark.read.parquet(f.read().strip()).collect()}

    pd.DataFrame(
        [{"k": 1, "val": "a", "deleted": False}, {"k": 2, "val": "b", "deleted": False}]
    ).to_json(src / "b0.json", orient="records", lines=True)
    assert drain() == {1: "a", 2: "b"}

    # batch 2: update k=1, delete k=2, insert k=3
    pd.DataFrame(
        [
            {"k": 1, "val": "a2", "deleted": False},
            {"k": 2, "val": "b", "deleted": True},
            {"k": 3, "val": "c", "deleted": False},
        ]
    ).to_json(src / "b1.json", orient="records", lines=True)
    assert drain() == {1: "a2", 3: "c"}

    # re-drain with nothing new: state unchanged
    assert drain() == {1: "a2", 3: "c"}


def test_foreach_batch_sketch_merge_and_vacuum(spark, tmp_path):
    """Per-group HLL state folds each drained batch in (estimates track the
    union of everything seen); vacuum retains the newest versions only."""
    import os

    import pandas as pd

    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.core import (
        foreach_batch_sketch_merge,
        vacuum_versions,
    )

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = foreach_batch_sketch_merge(
            spark.readStream.schema("g STRING, uid LONG").json(str(src)),
            "uid",
            ["g"],
            state,
            ckpt,
        )
        q.awaitTermination()
        with open(state + "/_current") as f:
            cur = f.read().strip()
        return {
            r.g: r.est
            for r in spark.read.parquet(cur)
            .select("g", F.expr("cast(hll_sketch_estimate(sketch) as long)").alias("est"))
            .collect()
        }

    pd.DataFrame([{"g": "a", "uid": u} for u in range(50)]).to_json(
        src / "b0.json", orient="records", lines=True
    )
    assert drain() == {"a": 50}

    # second batch: 25 repeat uids (no-op for distinct) + 50 new + new group
    recs = [{"g": "a", "uid": u} for u in range(25, 125)]
    recs += [{"g": "b", "uid": u} for u in range(10)]
    pd.DataFrame(recs).to_json(src / "b1.json", orient="records", lines=True)
    est = drain()
    assert est["b"] == 10
    assert abs(est["a"] - 125) <= 3  # union of 0..124, HLL tolerance

    removed = vacuum_versions(state, keep=1)
    assert removed == ["v0"]
    assert not os.path.exists(os.path.join(state, "v0"))
    assert drain() == est  # state intact after vacuum


def test_stateful_container_lifetimes_tws_across_batches(spark, tmp_path):
    """transformWithStateInPandas twin: same semantics as the
    applyInPandasWithState form, state persists across drains (RocksDB
    state store, as the API requires).

    Either-way contract (r8, replacing the perpetual env skip): with a
    protobuf runtime the twin runs end-to-end; without one (this container
    — no pip, no wheel on disk, and the runner's generated ``_pb2`` modules
    need the real descriptor-pool runtime, so vendoring is not a
    stdlib-only copy) the operator must REFUSE with a clear
    NotImplementedError pointing at the applyInPandasWithState primary,
    which test_stateful_container_lifetimes_across_batches exercises
    fully.  Both branches are real assertions; the suite reports 0 skips."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        container_lifetimes_tws,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        events = spark.createDataFrame(
            [(0, "c0")], "run_id LONG, uuid STRING"
        )
        with pytest.raises(NotImplementedError, match="protobuf runtime"):
            container_lifetimes_tws(events)
        return
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = tmp_path / "tws"
        d.mkdir()
        schema = "run_id BIGINT, uuid STRING, newcontainer INT, ts TIMESTAMP"
        with open(d / "a.json", "w") as f:
            f.write(json.dumps({"run_id": 0, "uuid": "c0", "newcontainer": 1, "ts": "2024-01-01 00:00:00"}) + "\n")
            f.write(json.dumps({"run_id": 1, "uuid": "c0", "newcontainer": 0, "ts": "2024-01-01 00:01:00"}) + "\n")
        ckpt = str(tmp_path / "ckpt_tws")

        def drain():
            stream = spark.readStream.schema(_parse_datatype_string(schema)).json(str(d))
            out = container_lifetimes_tws(stream)
            rows = {}

            def sink(batch_df, _epoch):
                for r in batch_df.collect():
                    rows[r.uuid] = r

            q = (
                out.writeStream.foreachBatch(sink).outputMode("update")
                .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
            )
            q.awaitTermination()
            return rows

        got = drain()
        assert got["c0"].runs == 2 and got["c0"].cold_starts == 1 and got["c0"].recycled
        with open(d / "b.json", "w") as f:
            f.write(json.dumps({"run_id": 2, "uuid": "c0", "newcontainer": 0, "ts": "2024-01-01 00:05:00"}) + "\n")
            f.write(json.dumps({"run_id": 3, "uuid": "c1", "newcontainer": 1, "ts": "2024-01-01 00:05:00"}) + "\n")
        got2 = drain()
        assert got2["c0"].runs == 3  # state carried across drains
        assert got2["c1"].runs == 1 and not got2["c1"].recycled
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_foreach_batch_cm_merge_tracks_frequencies(spark, tmp_path):
    """Streaming CM state: batch partials element-wise-sum into the stored
    sketch, so after two drains the point estimates equal the EXACT totals
    across both batches (merge law — no batch-boundary drift)."""
    import pandas as pd

    from cloudcomputing_servicecompositiontest_datapipeline_spark.functions.sketch import cm_query
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.core import (
        foreach_batch_cm_merge,
    )

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = foreach_batch_cm_merge(
            spark.readStream.schema("g STRING, item STRING").json(str(src)),
            "item",
            ["g"],
            state,
            ckpt,
        )
        q.awaitTermination()
        with open(state + "/_current") as f:
            cur = f.read().strip()
        sk = spark.read.parquet(cur)
        probe = spark.createDataFrame([("x",), ("y",)], "item STRING")
        return {
            (r.g, r.item): r.cm_estimate
            for r in cm_query(sk.crossJoin(probe), F.col("item")).collect()
        }

    pd.DataFrame([{"g": "a", "item": "x"}] * 30 + [{"g": "a", "item": "y"}] * 5).to_json(
        src / "b0.json", orient="records", lines=True
    )
    est = drain()
    assert est[("a", "x")] == 30 and est[("a", "y")] == 5

    # second drain adds 20 more x to group a and a new group b
    pd.DataFrame([{"g": "a", "item": "x"}] * 20 + [{"g": "b", "item": "y"}] * 7).to_json(
        src / "b1.json", orient="records", lines=True
    )
    est = drain()
    assert est[("a", "x")] == 50  # 30 + 20 across batch boundary
    assert est[("b", "y")] == 7


def test_streaming_source_quota_admits_across_batches(spark, tmp_path):
    """X34 per-source admission quota: state (kept counter) persists across
    micro-batches — batch 2's rows only fill the REMAINING room, and ranks
    continue where batch 1 stopped."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.stateful import (
        source_quota_admit,
    )

    d = tmp_path / "quota"
    d.mkdir()
    schema = "doc_id BIGINT, source STRING"
    with open(d / "a.json", "w") as f:
        for i in range(2):
            f.write(json.dumps({"doc_id": i, "source": "s0"}) + "\n")
        f.write(json.dumps({"doc_id": 100, "source": "s1"}) + "\n")
    ckpt = str(tmp_path / "ckpt_quota")

    def drain():
        stream = spark.readStream.schema(_parse_datatype_string(schema)).json(str(d))
        out = source_quota_admit(stream, cap=3)
        rows = []

        def sink(batch_df, _epoch):
            rows.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(sink).outputMode("append")
            .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return rows

    first = drain()
    assert sorted((r.source, r.doc_id, r.kept_rank) for r in first) == [
        ("s0", 0, 1), ("s0", 1, 2), ("s1", 100, 1)
    ]
    # batch 2: three more s0 docs (only ONE seat left) + one more s1
    with open(d / "b.json", "w") as f:
        for i in range(2, 5):
            f.write(json.dumps({"doc_id": i, "source": "s0"}) + "\n")
        f.write(json.dumps({"doc_id": 101, "source": "s1"}) + "\n")
    second = drain()
    assert sorted((r.source, r.doc_id, r.kept_rank) for r in second) == [
        ("s0", 2, 3),            # fills the last seat; docs 3,4 dropped
        ("s1", 101, 2),
    ]


def test_streaming_burst_monitor_welford_across_batches(spark, tmp_path):
    """X69 online burst monitor: each window scores against only its PAST
    (first two windows never flag — no variance yet), a spike after a
    steady run flags, and the Welford state carries across drains so the
    second drain's z uses the first drain's history."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.stateful import (
        burst_monitor,
    )

    d = tmp_path / "burst"
    d.mkdir()
    schema = "event_type STRING, bucket_ts TIMESTAMP, n_events BIGINT"

    def write(fn, rows):
        with open(d / fn, "w") as f:
            for h, n in rows:
                f.write(
                    json.dumps(
                        {
                            "event_type": "t",
                            "bucket_ts": f"2024-01-01T{h:02d}:00:00",
                            "n_events": n,
                        }
                    )
                    + "\n"
                )

    ckpt = str(tmp_path / "ckpt_burst")

    def drain():
        stream = spark.readStream.schema(_parse_datatype_string(schema)).json(str(d))
        out = burst_monitor(stream, z_threshold=2.0)
        rows = []

        def sink(batch_df, _epoch):
            rows.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(sink).outputMode("append")
            .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return rows

    # steady run: 10,11,10,11 — slight jitter so std > 0
    write("a.json", [(0, 10), (1, 11), (2, 10), (3, 11)])
    first = {r.bucket_ts.hour: r for r in drain()}
    assert not first[0].is_burst and first[0].z_score is None  # no history
    assert not first[1].is_burst and first[1].z_score is None  # n<2 still
    assert first[2].z_score is not None and not first[2].is_burst
    assert [first[h].n_windows_seen for h in range(4)] == [1, 2, 3, 4]
    # drain 2: a spike — judged against the carried-over steady history
    write("b.json", [(4, 60)])
    second = {r.bucket_ts.hour: r for r in drain()}
    assert second[4].is_burst and second[4].z_score > 2.0
    assert second[4].n_windows_seen == 5  # state carried across drains


def test_stateful_lifetimes_survive_null_timestamps(spark, tmp_path):
    """A timestampless record arrives in the kernel as NaT, and
    astype('int64') on NaT raises — one bad record must not kill the
    lifetime tracker's task.  NULL event times are excluded from the
    first/last window but still count as runs."""
    import json as _json

    from pyspark.sql.types import _parse_datatype_string

    from cloudcomputing_servicecompositiontest_datapipeline_spark.streaming.stateful import (
        container_lifetimes,
    )

    d = tmp_path / "stateful_nullts"
    d.mkdir()
    schema = "run_id BIGINT, uuid STRING, newcontainer INT, ts TIMESTAMP"
    with open(d / "a.json", "w") as f:
        f.write(_json.dumps({"run_id": 0, "uuid": "c0", "newcontainer": 1, "ts": "2024-01-01 00:00:00"}) + "\n")
        f.write(_json.dumps({"run_id": 1, "uuid": "c0", "newcontainer": 0, "ts": None}) + "\n")
        f.write(_json.dumps({"run_id": 2, "uuid": "c1", "newcontainer": 1, "ts": None}) + "\n")
    stream = spark.readStream.schema(_parse_datatype_string(schema)).json(str(d))
    rows = {}

    def sink(batch_df, _epoch):
        for r in batch_df.collect():
            rows[r.uuid] = r

    q = (
        container_lifetimes(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_nullts"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert rows["c0"].runs == 2 and rows["c0"].first_us is not None
    assert rows["c1"].runs == 1 and rows["c1"].first_us is None  # all-NaT group
