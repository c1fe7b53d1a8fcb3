"""Scale-posture regression tests: assert the PLANS stay right, not just the
results — pushdown reaches the scan, dims broadcast, quadratic operators keep
their blocking keys.  These are the properties that survive a 100× scale-up."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return em.queries()[name](spark, SF)._jdf.queryExecution().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][-1]
    assert "l_orderkey" not in rs and "l_partkey" not in rs


def test_dim_joins_broadcast(spark):
    for name in ["q3_shipping_priority", "q5_local_supplier", "join_config_stamp"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_overlap_keyed_join_not_cartesian(spark):
    """The overlapFilter key must keep J1 an equi+range join (per-key
    quadratic); a cartesian/BNLJ here would explode at scale."""
    plan = _plan(spark, "overlap_selfjoin")
    assert "CartesianProduct" not in plan
    assert "user_id" in plan.split("== Physical Plan ==")[-1]


def test_single_shuffle_for_dedup_then_join(spark):
    """tlq_transform: the dedup window and the orders join reuse one
    lineitem shuffle + a broadcast — no second fact shuffle."""
    plan = _plan(spark, "tlq_transform").split("== Physical Plan ==")[-1]
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BroadcastHashJoin" in plan


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """The 100 TB landing layout: a filter on the partition column must show
    up as a PartitionFilter (pruned at planning), not a data filter."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import io as sio
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    ev = star.table(spark, SF, "events")
    out = str(tmp_path / "events_part")
    sio.write_parquet_partitioned(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out).filter("event_type = 'click'")
    plan = back._jdf.queryExecution().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == ev.filter("event_type = 'click'").count()


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketed tables on the join key ⇒ no Exchange on either side."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = star.table(spark, SF, "orders")
        li = star.table(spark, SF, "lineitem")
        for name, df, key in [("b_orders", orders, "o_orderkey"), ("b_lineitem", li, "l_orderkey")]:
            (
                df.write.mode("overwrite").bucketBy(4, key).sortBy(key)
                .option("path", str(tmp_path / name)).saveAsTable(name)
            )
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders").o_orderkey == spark.table("b_lineitem").l_orderkey,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located join
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_q6_full_predicate_pushdown(spark):
    """Q6 is the pure scan-dominated query: every conjunct must reach the
    parquet scan and only the 4 referenced columns may be read."""
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in plan
    for field in ["l_shipdate", "l_discount", "l_quantity"]:
        assert f"IsNotNull({field})" in plan or f"({field}" in plan, field
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][-1]
    assert "l_orderkey" not in rs and "l_extendedprice" in rs


def test_tpch_more_dims_broadcast_no_cartesian(spark):
    """The new multi-join shapes must broadcast every dimension side and
    never degrade to a cartesian product."""
    for name in [
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_items",
        "q20_excess_shippers",
    ]:
        plan = _plan(spark, name).split("== Physical Plan ==")[-1]
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_q21_sole_blame_semi_anti_joins(spark):
    """Q21's EXISTS/NOT-EXISTS pair must plan as semi + anti joins on the
    orderkey (per-key containment), never a cartesian blow-up."""
    plan = _plan(spark, "q21_waiting_suppliers").split("== Physical Plan ==")[-1]
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_no_python_udfs_in_core_plans(spark):
    """Core reference operators stay JVM-side (no BatchEvalPython /
    ArrowEvalPython in the hot path)."""
    for name in [
        "tlq_transform",
        "report_full",
        "overlap_selfjoin",
        "q1_pricing_summary",
        "dedup_exact_text",
        "text_quality_score",
    ]:
        plan = _plan(spark, name).split("== Physical Plan ==")[-1]
        assert "EvalPython" not in plan, name


def test_asof_join_single_shuffle(spark):
    """The as-of join must cost one hash exchange per side (union aligns
    them) and zero joins — the union+window form, not an inequality join."""
    plan = _plan(spark, "join_asof_last_click").split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # one shuffle on the key
    assert "Window" in plan


def test_chunking_is_shuffle_free(spark):
    """Chunking is row-local: posexplode, no Exchange beyond the
    small-input fan-out repartition (round-robin, not a hash shuffle)."""
    plan = _plan(spark, "text_chunk_documents").split("== Physical Plan ==")[-1]
    assert "Exchange hashpartitioning" not in plan
    assert "Generate posexplode" in plan or "posexplode" in plan


def test_funnel_two_stage_aggregate(spark):
    """Funnel: per-user partial+final agg then a 1-row global agg — no joins,
    no windows over the raw event stream."""
    plan = _plan(spark, "funnel_click_to_purchase").split("== Physical Plan ==")[-1]
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_inspector_nest_flatten_single_shuffle(spark):
    """The nest→flatten roundtrip costs exactly the one groupBy shuffle that
    builds the poll arrays; the flatten itself (array_sort + element_at) is
    row-local projection."""
    plan = _plan(spark, "inspector_nested_poll_agg").split("== Physical Plan ==")[-1]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan


def test_pii_and_repetition_are_shuffle_free_row_local(spark):
    """PII redaction and repetition scoring are per-row expression chains —
    any Exchange or Python eval here would be a scale bug."""
    for name in ["text_redact_pii", "text_repetition_score"]:
        plan = _plan(spark, name).split("== Physical Plan ==")[-1]
        # ensure_parallelism adds a roundrobin fan-out on the 1-file fixture
        # (a no-op at scale); what must never appear is a keyed shuffle.
        assert "Exchange hashpartitioning" not in plan, name
        assert "EvalPython" not in plan, name


def test_domain_mix_is_shuffle_free_scan_side_filter(spark):
    """Hash-rate mixing is a row-local predicate: no Exchange, no join —
    membership is a pure function of (salt, doc_id)."""
    plan = _plan(spark, "sample_domain_mix").split("== Physical Plan ==")[-1]
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_packing_single_stratum_shuffle(spark):
    """Sequence packing costs one hash shuffle (the per-language window);
    the chunk join must broadcast, not add a second fact shuffle."""
    plan = _plan(spark, "pack_chunks_token_budget").split("== Physical Plan ==")[-1]
    assert plan.count("Exchange hashpartitioning") <= 2  # window + (doc_id join at fixture size)
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval-gram set must broadcast so the corpus never shuffles on the
    gram key — the whole point of the decontamination shape."""
    plan = _plan(spark, "text_decontaminate").split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_no_cartesian_and_broadcast_corpus_count(spark):
    """TF-IDF: the 1-row corpus count joins as a broadcast nested loop over
    1 row (fine); the term-DF join must stay a hash join, never cartesian."""
    plan = _plan(spark, "text_tfidf_top_terms").split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in plan


def test_centroids_single_reduce_no_python(spark):
    """Centroid aggregation: posexplode is row-local; the only keyed
    exchange is the (label, dim) reduce, and nothing drops to Python."""
    plan = _plan(spark, "embedding_centroid_by_label").split("== Physical Plan ==")[-1]
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "EvalPython" not in plan


def test_global_ordinal_range_partitions_not_single_task(spark):
    """The global-shuffle ordinal must range-partition; a no-partition
    window (single task for the whole corpus) is the anti-pattern."""
    plan = _plan(spark, "sample_global_shuffle").split("== Physical Plan ==")[-1]
    assert "rangepartitioning" in plan
    # the corpus-side window must partition by _pid; the only SinglePartition
    # exchange allowed is the tiny (n_partitions-row) offset table's window
    assert plan.count("Exchange SinglePartition") <= 1


def test_passage_dedup_two_narrow_shuffles_no_python(spark):
    """Passage dedup: the split is row-local (posexplode), then exactly two
    keyed exchanges — passage-hash dedup window and doc_id reassembly —
    and nothing drops to Python."""
    plan = _plan(spark, "dedup_passages").split("== Physical Plan ==")[-1]
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_dedup_against_corpus_hash_joins_only(spark):
    """Cross-corpus dedup: exact stage is an anti hash join; the containment
    stage is a keyed join on the shingle hash — never cartesian, never a
    single-partition collapse."""
    plan = _plan(spark, "dedup_against_corpus").split("== Physical Plan ==")[-1]
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_linear_regression_single_aggregation_no_python(spark):
    """OLS via exact moments must stay ONE partial-agg shuffle (closed-form,
    no iterative fitting) with nothing dropping to Python."""
    plan = _plan(spark, "report_linear_regression").split("== Physical Plan ==")[-1]
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "EvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_cdc_diff_joins_hashes_not_documents(spark):
    """cdc_snapshot_diff: the full-outer join must be a keyed join (sort-merge
    or shuffled-hash, never BNLJ/cartesian) comparing pre-computed md5 columns
    — the text column itself must not survive past the hash projection."""
    plan = _plan(spark, "cdc_snapshot_diff")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in phys and "BroadcastNestedLoopJoin" not in phys
    assert "FullOuter" in phys
    # join output carries only (doc_id, hashes, change_type) — no raw text
    import re
    m = re.search(r"(SortMergeJoin|ShuffledHashJoin)[^\n]*", phys)
    assert m is not None


def test_incremental_merge_two_stage_aggregate(spark):
    """incremental_agg_merge: partials then merge = exactly two aggregation
    exchanges (day-grain, then category-grain) — never a raw re-scan per
    rollup grain."""
    phys = _plan(spark, "incremental_agg_merge").split("== Physical Plan ==")[-1]
    assert phys.count("Exchange hashpartitioning") == 2
    assert "HashAggregate" in phys


def test_sketch_rollup_moves_sketches_not_rows(spark):
    """sketch_distinct_rollup (portable md5_32 mode since r8): raw rows are
    scanned ONCE — the fused rollup (hll_portable_rollup) derives shard
    count, merge, and estimate from a single stored-register lineage, so
    the plan has exactly one parquet scan of events — and user_id is
    pruned after the register build (only register triples and kilobyte
    arrays move through the rollup shuffles)."""
    phys = _plan(spark, "sketch_distinct_rollup").split("== Physical Plan ==")[-1]
    assert phys.count("Scan parquet") == 1  # no re-scan for the shard count
    # 4 grain changes: (type,day,idx) build, (type,day) array assembly,
    # (type,pos) max-merge, (type) estimate — each a hash exchange
    assert phys.count("Exchange hashpartitioning") == 4
    # column pruning: the scan reads only the three columns the sketch
    # build needs — user_id never survives past the register build because
    # the first aggregate's grouping keys are (event_type, day, idx)
    read = phys.split("ReadSchema: ")[-1].split("\n")[0]
    assert set(read.split("<")[1].split(">")[0].split(",")) <= {
        "event_type:string",
        "ts:bigint",  # driver fixture stores TIMESTAMP(NANOS) read as long
        "ts:timestamp_ntz",
        "user_id:bigint",
    }, read
    assert "hashpartitioning(event_type" in phys  # rollup keyed on the group


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime semi-join reduction: a selective dim filter on a shuffle join
    must inject a bloom filter (`might_contain`) on the fact's join key, so
    non-matching fact rows are dropped at the scan, before the shuffle.  At
    100 TB this is the difference between shuffling the whole fact table and
    shuffling the ~matching slice.  (Thresholds are lowered to make the
    injection observable at test SF; the rule itself is size-driven and
    fires unaided at scale.)"""
    saved = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        od = spark.read.parquet(f"{SF}/orders.parquet").where(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "l_orderkey" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_binned_overlap_is_keyed_join_not_bnlj(spark):
    """overlap_global_binned: the whole point — no-key interval overlap must
    plan as a bucket equi-join (sort-merge/shuffled-hash), never the
    broadcast-nested-loop that makes overlap_global bounded-input-only."""
    phys = _plan(spark, "overlap_global_binned").split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" not in phys and "CartesianProduct" not in phys
    # equi-join keyed on the time bucket (broadcast-hash at test SF; the same
    # keyed plan becomes sort-merge when both sides are large)
    import re
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[bin#", phys)


def test_hof_explodes_do_not_regrow_inferred_filters(spark):
    """Regression pin for the InferFiltersFromGenerate trap: exploding a
    higher-order-function array lets the optimizer infer a size()>0 filter
    that pushes below the projections with the WHOLE array expression
    substituted in — its per-element lambdas then re-evaluate the token
    split per element, turning row-local passes quadratic (measured 25 s
    for 500 docs on the winnowing pipeline).  The fix is explode_outer +
    isNotNull, which the rule does not fire on: the optimized plans must
    carry no Filter whose condition embeds a transform() lambda."""
    import re

    from cloudcomputing_servicecompositiontest_datapipeline_spark.plans import registry

    registry.load_all()
    for name in ("dedup_winnow_candidates", "text_perplexity_scores", "dedup_passages"):
        df = registry.QUERIES[name](spark, "/root/testdata/sf0.001")
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        bad = [
            ln
            for ln in opt.splitlines()
            if ln.strip().startswith(("Filter", "+- Filter"))
            and "transform(" in ln
        ]
        assert not bad, f"{name}: inferred filter re-embeds the HOF array:\n" + "\n".join(bad[:2])


def test_importance_weights_broadcasts_distributions(spark):
    """X58: the 1024-bucket distribution table must come back as a
    BroadcastHashJoin onto the exploded features (a shuffle join there
    would re-shuffle the corpus-sized feature stream), with no
    BroadcastNestedLoopJoin anywhere."""
    plan = _plan(spark, "curation_importance_weights")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in phys
    assert "BroadcastNestedLoopJoin" not in phys and "CartesianProduct" not in phys


def test_burst_zscore_generates_axis_no_bnlj(spark):
    """X63: densification must be a generated per-type sequence, never a
    BroadcastNestedLoopJoin of an axis table (the r5 plan-audit flag that
    prompted the rewrite)."""
    plan = _plan(spark, "events_burst_zscore")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" not in phys and "CartesianProduct" not in phys
    assert "Generate explode" in phys or "Generate" in phys


def test_bootstrap_ci_explodes_mapside_no_join_for_replicates(spark):
    """X66: replicate membership is generated map-side (explode), and the
    only joins are the tiny band/point merges — no replicate join, no
    BNLJ."""
    plan = _plan(spark, "events_bootstrap_ci")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Generate" in phys
    assert "BroadcastNestedLoopJoin" not in phys and "CartesianProduct" not in phys


def test_strip_html_is_single_codegen_scan(spark):
    """X67: the whole strip chain is one row-local projection — no joins,
    no aggregate, the only Exchange is ensure_parallelism's repartition."""
    plan = _plan(spark, "text_strip_html")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in phys and "Aggregate" not in phys
    assert phys.count("Exchange") <= 2  # repartition (+AQE shuffle read)


def test_stratified_split_single_stratum_shuffle(spark):
    """X59: exactness costs ONE shuffle on the stratum + in-partition sort;
    a second data shuffle would mean the window was re-partitioned."""
    plan = _plan(spark, "split_stratified")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Window" in phys
    # one Exchange for the stratum hashpartitioning (+ ensure_parallelism)
    assert phys.count("Exchange hashpartitioning") == 1


def test_dup_rate_join_not_broadcast(spark):
    """X64: the cluster table is corpus-sized — the annotate-back join must
    NOT be planned as a broadcast of the aggregate side at scale (here the
    tiny fixture may still broadcast under AQE, so assert the shape rule on
    the pre-AQE plan: no BNLJ/cartesian, join keyed on content_hash)."""
    plan = _plan(spark, "dedup_dup_rate_by_source")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" not in phys and "CartesianProduct" not in phys
    assert "content_hash" in phys


def test_collect_site_audit_is_clean_and_detects_unallowlisted(tmp_path):
    """Static driver-materialization audit (tools/plan_audit.py): every
    collect/toPandas/toLocalIterator/DataFrame-first in the package carries
    an allowlist reason proving a parameter-bounded result (the 'is every
    collect bounded by construction?' review, institutionalized) — and the
    detector itself must (a) flag an unallowlisted site, (b) NOT flag a
    column-aggregate F.first or a pandas-kernel call."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import _collect_site_audit

    pkg = os.path.join(os.path.dirname(__file__), "..", "cloudcomputing_servicecompositiontest_datapipeline_spark")
    n_flagged, lines = _collect_site_audit(pkg)
    assert n_flagged == 0, "\n".join(l for l in lines if l.startswith("FLAG"))

    probe = tmp_path / "probe.py"
    probe.write_text(
        "from pyspark.sql import functions as F\n"
        "def bad(df):\n"
        "    return df.collect()\n"
        "def fine(df, pdf):\n"
        "    return df.select(F.first('x')), pdf.head(3)\n"
    )
    n_flagged, lines = _collect_site_audit(tmp_path)
    assert n_flagged == 1 and any("bad() .collect()" in l for l in lines)
