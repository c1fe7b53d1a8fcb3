"""Driver-contract invariants: the registry shape the round driver consumes.

The driver records correctness rows for only the FIRST 50 queries it
receives (observed r1), so the window ordering IS part of the product —
these tests keep it from silently rotting as queries are added.
"""

from __future__ import annotations

from cloudcomputing_servicecompositiontest_datapipeline_spark.plans import registry

registry.load_all()

#: rows-only queries allowed inside the driver window: non-SQL-expressible
#: ops (xxhash64 banding/bucketing, implementation-defined estimates, binary
#: multimodal) whose correctness is pinned by pytest instead.
ROWS_ONLY_ALLOWED = {
    # dedup_simhash, dedup_minhash_lsh and dedup_cluster_canonical_lsh left
    # this set in r7; similarity_lsh_topk, similarity_jl_projection and
    # sketch_frequency_heavy_hitters left it in r8, then sketch_distinct_
    # rollup (portable-HLL registers→max-merge→decimal-exact estimate) and
    # similarity_ivf_topk (seed-vector quantizer by md5 rank + decimal-exact
    # assignment): those declared queries now run engine-portable modes and
    # are fully oracle-checked (production xxhash64/DataSketches/Lloyd's
    # modes stay pytest/eval-pinned).
    "multimodal_decode",
    # r3 window additions: binary features are implementation-defined.
    # (dedup_lsh_eval left this set in r8: its declared mode now runs the
    # shared md5-LSH CTEs end to end, truth + P/R oracle-checked;
    # sketch_quantile_rollup left in r7 with its KLL→exact-quantile twin.)
    "multimodal_features",
    # similarity_ann_eval and similarity_ann_sweep left this set in r8's
    # second pass: their declared forms now run the portable md5_32-LSH +
    # seed-vector-IVF modes, so truth, candidates, and every recall point
    # are oracle-checked (production xxhash64/Lloyd's floors stay in
    # tests/test_extensions.py).
    # r4 window: finishing the never-checked sweep pulls in the remaining
    # rows-only-by-design queries — streaming batch-twins (incremental
    # micro-batch semantics aren't one SQL statement), the xxhash64-seeded /
    # learned-codebook compression ops (PQ/int8/JL outputs are
    # implementation-defined but pinned by recall/distortion pytest floors),
    # k-means semantic-dedup centroids, and the learned-merge BPE outputs
    # (training argmax sequence pinned against a pure-Python reference).
    "streaming_available_now",
    "streaming_dedup_on_arrival",
    "streaming_stateful_lifetimes",
    "streaming_source_quota",
    # dedup_semantic_centroids left this set in r8's second pass: the
    # declared form blocks on the seed-vector quantizer with decimal-exact
    # assignment/dots, and the CC fixpoint is the recursive-CTE oracle
    # (numpy Lloyd's production mode stays pinned by the cluster-agreement
    # tests).
    # similarity_pq_encode left this set in r8: seed codebooks by md5 rank
    # + decimal-exact per-subspace assignment (the IVF precedent); then
    # similarity_pq_eval in r8's second pass (decimal ADC against the
    # flattened reconstructed vector + integer-sum recall recomposition
    # made the whole two-stage eval portable).
    # similarity_jl_eval left this set in r8: md5_32 signs + decimal-exact
    # statistics made the whole distortion eval oracle-checkable; then
    # similarity_quantized_recall (integer-sum mean, NULLS LAST rank
    # windows — every other step was already portable arithmetic).
    "text_bpe_merges",
    "text_bpe_encode",
    # r5 window: the compression-ratio signal's deflate byte counts are
    # zlib-build-dependent (monotonicity pytest-pinned instead), and the
    # online burst monitor's z-scores depend on arrival order by
    # construction (each window judged against only its past; state
    # machine pinned in pytest across drains).
    "text_compression_ratio",
    "streaming_burst_monitor",
}


def test_driver_window_is_exactly_50_registered_names():
    w = registry.DRIVER_WINDOW
    assert len(w) == 50
    assert len(set(w)) == 50  # no duplicates eating slots
    missing = [n for n in w if n not in registry.QUERIES]
    assert not missing, f"window names not registered: {missing}"


def test_driver_window_leads_the_ordered_registry():
    ordered = list(registry.ordered_queries())
    assert ordered[:50] == registry.DRIVER_WINDOW


def test_window_rows_only_entries_are_the_declared_exceptions():
    no_oracle = {n for n in registry.DRIVER_WINDOW if n not in registry.ORACLES}
    assert no_oracle <= ROWS_ONLY_ALLOWED, (
        f"unexpected rows-only queries inside the driver window: "
        f"{no_oracle - ROWS_ONLY_ALLOWED}"
    )


def test_rows_only_set_is_exactly_the_declared_exceptions():
    """Strict both ways: a query losing its oracle must be consciously added
    here, and an upgraded query must be REMOVED here (stale allowances hid
    the r7 sketch_quantile_rollup upgrade for a round)."""
    no_oracle = {n for n in registry.QUERIES if n not in registry.ORACLES}
    assert no_oracle == ROWS_ONLY_ALLOWED, (
        f"missing allowance: {no_oracle - ROWS_ONLY_ALLOWED}; "
        f"stale allowance: {ROWS_ONLY_ALLOWED - no_oracle}"
    )


def test_every_oracle_has_a_query():
    dangling = [n for n in registry.ORACLES if n not in registry.QUERIES]
    assert not dangling



def test_oracle_queries_return_no_nested_columns(spark, sf_dir):
    """No oracle-checked query may return a raw array/map/struct column: the
    driver canonicalizes via pandas ``sort_values`` BEFORE stringifying, and
    factorize cannot hash numpy arrays — the failure class behind the r01
    ``report_show_as_list`` and r04 ``text_winnow_fingerprints`` driver reds
    (``TypeError: unhashable type: 'numpy.ndarray'``) while the old local
    gate (stringify-then-sort) stayed green.  Nested outputs must be
    ``array_join``-ed / ``to_json``-ed in the declared query (the
    plans/report.py pattern).  Schema derivation is lazy — no job runs for
    most queries (trainer queries run their bounded collect), and builds
    are independent, so they run on a small thread pool (guide §2.6:
    overlap independent driver work — this was the suite's single slowest
    test at 45 s serial; conf set/restore inside cluster_canonical is a
    no-op collision since parallelismFirst=false became the engine
    posture)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import types as T

    def _bad(name: str):
        df = registry.QUERIES[name](spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        return (name, bad) if bad else None

    with ThreadPoolExecutor(max_workers=8) as pool:
        offenders = [r for r in pool.map(_bad, sorted(registry.ORACLES)) if r]
    assert not offenders, (
        "oracle-checked queries returning nested columns (driver hash "
        f"canonicalization would crash): {offenders}"
    )


def test_bench_contract_shape():
    """bench.py is a driver contract too: it must print ONE JSON line with
    metric/value/unit/queries/sf, and every name it times must be a
    registered query (a rename that forgets bench would otherwise only
    surface as a driver-side crash at round end)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import __spark_entry__ as em

    qs = set(em.queries())
    timed = bench.HEADLINE + bench.EXTRA + bench.NEW_R3 + bench.NEW_R4 + bench.NEW_R5
    for name in timed:
        assert name in qs, f"bench times unknown query {name!r}"
    # headline set frozen since r1 for cross-round comparability
    assert len(bench.HEADLINE) == 15
    assert len(set(timed)) == len(timed)
    # r11 scaling probes: registered, disjoint from the frozen headline
    # (they ride in the stdout queries map for the driver's low-core ratio
    # measurement but must not change what `value` sums)
    for name in bench.SCALING_PROBES:
        assert name in qs, f"scaling probe is not a registered query: {name!r}"
    assert not set(bench.SCALING_PROBES) & set(bench.HEADLINE)
