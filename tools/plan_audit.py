#!/usr/bin/env python
"""Plan-hygiene audit over every declared query.

For each query in ``__spark_entry__.queries()`` prints the physical plan's
exchange/broadcast counts and flags the scale anti-patterns:

- ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — all-pairs hazards
  (quadratic at scale) unless the broadcast side is provably tiny;
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (the slow
  path; Arrow-vectorized ``ArrowEvalPython``/``MapInPandas``/
  ``FlatMapGroupsInPandas`` are the sanctioned Python surfaces);
- ``GlobalWindow`` — a ``Window`` with an EMPTY partition spec whose input
  subtree contains no reduction (Aggregate/Distinct/Deduplicate/limit):
  the whole corpus funnels through ONE task (the X70 anti-pattern).  A
  global window over an aggregate-REDUCED table (the histogram-CDF
  pattern: per-value counts then a running sum) is fine and not flagged.
- ``ExactPercentile`` — an exact ``percentile``/``median`` aggregate
  (NOT ``percentile_approx``) whose input subtree contains no reduction:
  Spark's exact Percentile buffers every distinct input value in the
  aggregation buffer, so over a corpus-sized continuous column the
  merging reducer's memory is ∝ rows (the r6 X70/X71 hazard class).
  Exact percentile over an already-reduced table, or per bounded group
  with a printed allowlist reason, is fine.

STATIC passes also audit the package source (stale allowlist entries — no
matching site — flag too, so the lists cannot rot):

- every driver-materialization call (``collect``/``toPandas``/
  ``toLocalIterator``/DataFrame ``first``) must carry a COLLECT_ALLOWLIST
  reason proving its result is parameter-bounded, never corpus-sized;
- every ``collect_set``/``collect_list`` aggregate must carry an
  AGG_BUFFER_ALLOWLIST reason proving its per-group buffer is
  cardinality-bounded — collect aggregates hold the whole group's list in
  one buffer BEFORE any downstream slice/filter runs (r7).

Known-intentional shapes are allowlisted with the reason printed, so a
clean run is "every flag is either absent or explained".

Usage: python tools/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

#: query -> (flag, why) or [(flag, why), ...] when several are intentional
ALLOWLIST = {
    # deliberate global-ntile demo: a total-order quartile is inherently a
    # single-task window (documented in the docstring; X47 value_deciles /
    # X14 per-group top-k are the scale forms)
    "window_rank_kinds": ("GlobalWindow", "global ntile(4) demo; X47/X14 are the scale forms"),
    # per-group exact percentile over BOUNDED grouping dimensions: the
    # buffer is one group's distinct values, not the corpus's — and the
    # group keys are monitoring dimensions (event_type, language, returnflag)
    "events_mad_by_type": ("ExactPercentile", "per-event_type exact median/MAD; bounded monitoring groups"),
    "events_outliers_robust": ("ExactPercentile", "per-event_type exact median/MAD; bounded monitoring groups"),
    "text_quality_cutoff": ("ExactPercentile", "per-language exact p25; bounded language strata"),
    "corpus_curation_pipeline": ("ExactPercentile", "per-language exact p25 stage; bounded language strata"),
    "percentile_stats": ("ExactPercentile", "per-returnflag exact-percentile demo; approx_percentile is the scale path"),
    "report_approx_stats": ("ExactPercentile", "per-event_type exact percentile_disc twin; HLL/percentile_approx are the scale path"),
    # reference-literal no-filter overlap: bounded demo of WHY the keyed /
    # binned forms exist; overlap_global_binned is the scale path
    "overlap_global_demo": ("BroadcastNestedLoopJoin", "bounded 500-row demo of the no-key form"),
    # the broadcast side is the ONE merged-sketch row (kilobytes)
    "sketch_frequency_heavy_hitters": ("BroadcastNestedLoopJoin", "single merged-sketch row fan-out"),
    # brute-force ANN baseline: broadcast(queries) x linear corpus scan —
    # the documented exact twin; LSH/IVF are the scale paths
    "similarity_bruteforce_topk": ("BroadcastNestedLoopJoin", "broadcast query set, corpus scanned once"),
    # CPU-scaling probe (r11): broadcast 20-query panel x 10x in-plan
    # amplified corpus scan — deliberately compute-bound measurement query
    "similarity_bruteforce_scale_probe": ("BroadcastNestedLoopJoin", "broadcast query panel x amplified corpus, scaling probe"),
    # exact all-pairs cosine on a bounded 200-vector subset (oracle twin of
    # the LSH/IVF-bucketed scale path)
    "dedup_embedding_cosine": ("BroadcastNestedLoopJoin", "bounded exact twin of bucketed semantic dedup"),
    # TPC-H scalar-subquery shapes: the broadcast side is ONE scalar row
    "q11_important_parts": ("BroadcastNestedLoopJoin", "scalar subquery (global sum threshold) row"),
    "q22_balance_anti": ("BroadcastNestedLoopJoin", "scalar subquery (global avg acctbal) row"),
    # broadcast side is the single corpus-doc-count row for the IDF term
    "text_tfidf_top_terms": ("BroadcastNestedLoopJoin", "single corpus-count row for IDF"),
    # eval-on-a-slice queries: the TRUTH side is deliberately the exact
    # quadratic form on a bounded slice (the thing being measured against)
    "dedup_lsh_eval": ("BroadcastNestedLoopJoin", "bounded exact-truth slice for LSH P/R"),
    "similarity_ann_eval": ("BroadcastNestedLoopJoin", "bounded brute-force truth for recall@k"),
    "similarity_ann_sweep": ("BroadcastNestedLoopJoin", "bounded brute-force truth panel reused across the parameter sweep"),
    # one-row global-total broadcasts (the single-task-window replacement):
    # the broadcast side is exactly ONE aggregate row
    "skew_key_report": ("BroadcastNestedLoopJoin", "single global-total row over per-key counts"),
    "curation_source_mix": ("BroadcastNestedLoopJoin", "single corpus-total row for share"),
    "curation_temperature_resample": ("BroadcastNestedLoopJoin", "single n_min row over per-domain counts"),
    "drift_events_value": ("BroadcastNestedLoopJoin", "single totals row over the 10-bin table"),
    "events_survival_curve": ("BroadcastNestedLoopJoin", "single corpus-end anchor + single user-total row"),
    "embedding_normalize_zscore": ("BroadcastNestedLoopJoin", "single D-bounded per-dimension stats row"),
    "curation_quantile_map": ("BroadcastNestedLoopJoin", "single corpus-total row over per-value counts"),
    "drift_documents_lang": ("BroadcastNestedLoopJoin", "single totals row over per-value counts"),
    # int8/PQ-fidelity evals: broadcast side is the bounded 10-query panel
    "similarity_quantized_recall": ("BroadcastNestedLoopJoin", "bounded query panel vs linear corpus scan"),
    "similarity_pq_eval": ("BroadcastNestedLoopJoin", "bounded query panel vs linear code scan"),
    # JL distortion eval: all-pairs over a bounded 40-vector id slice
    # (broadcast side since r9 — was a 1024-task CartesianProduct)
    "similarity_jl_eval": ("BroadcastNestedLoopJoin", "bounded 40x40 pair panel for distortion stats"),
    # r4 broadcast-join perplexity: the broadcast side is the ONE
    # (n_tokens, vocab) stats row from the capped unigram table
    "text_perplexity_scores": ("BroadcastNestedLoopJoin", "single model-stats row (n_tokens, vocab)"),
    # BM25: the broadcast side is the ONE corpus-stats row (N, total length)
    "text_bm25_topk": ("BroadcastNestedLoopJoin", "single corpus-stats row (N, sum_dl)"),
    # decile binning: the broadcast side is the ONE corpus-total row
    "curation_quality_deciles": ("BroadcastNestedLoopJoin", "single corpus-total row over per-value counts"),
    # decayed activity: the broadcast side is the ONE max-timestamp row
    "events_decayed_activity": ("BroadcastNestedLoopJoin", "single max-timestamp anchor row"),
    # target mix: the broadcast side is the ONE N_k = min(n/t) row
    "curation_target_mix": ("BroadcastNestedLoopJoin", "single achievable-corpus-size row"),
    # hybrid RRF: inherits the brute-force vector arm's broadcast(3-query
    # panel) x corpus scan plus BM25's single corpus-stats row
    "search_hybrid_rrf": ("BroadcastNestedLoopJoin", "bounded 3-query vector panel + 1-row BM25 stats"),
    # hard negatives: inherits BM25's single corpus-stats row
    "text_hard_negatives": ("BroadcastNestedLoopJoin", "single corpus-stats row (N, sum_dl)"),
}

FLAGS = ("BroadcastNestedLoopJoin", "CartesianProduct", "BatchEvalPython")

#: Driver-materialization allowlist for the STATIC pass: every
#: ``.collect()`` / ``.toPandas()`` / ``.toLocalIterator()`` / DataFrame
#: ``.first()`` in the package must appear here with the reason its result
#: is PARAMETER-BOUNDED (independent of corpus size) — the "is every
#: collect bounded by construction?" audit the r5 review did by hand,
#: institutionalized.  Keyed (relative file, enclosing function).
COLLECT_ALLOWLIST = {
    ("operators/bloom.py", "bloom_build"): "<= num_bits/64 packed filter words",
    ("operators/bpe.py", "bpe_train"): "1-row argmax per merge round",
    ("operators/curation.py", "importance_weights"): "single corpus-totals row",
    ("operators/curation.py", "_exact_quantiles_reduced"): "1 stats row + len(fracs) curve rows",
    ("operators/features.py", "_dense_counts"): "single min/max time-bounds row",
    ("operators/similarity.py", "semantic_dedup"): "TakeOrdered-bounded k-means training sample",
    ("operators/similarity.py", "train_ivf_centroids"): "TakeOrdered-bounded IVF training sample",
    ("operators/similarity.py", "ivf_seed_centers"): "n_centroids rows by md5-rank TakeOrdered — the portable quantizer draw",
    ("operators/similarity.py", "pq_train"): "TakeOrdered-bounded PQ training sample",
    ("operators/text.py", "train_bigram_lm"): "top_k-capped LM tables (no-collect join twin exists)",
    ("sources/io.py", "zorder_key"): "single per-column min/max bounds row",
    ("sources/io.py", "write_report_csv_compat"): "reference-compat single-file sink; write_report_csv is the scale path",
    ("sources/io.py", "render_report_compat"): "reference-layout single-file report; max_rows-bounded, write_report_csv is the scale path",
}

#: Aggregation-BUFFER allowlist: every ``collect_set``/``collect_list``
#: call in the package must appear here with the reason its per-group
#: buffer is BOUNDED — collect aggregates hold their whole group's list in
#: one aggregation buffer before any downstream slice/filter runs, the
#: same state-∝-cardinality class as the exact-Percentile hazard (r7).
#: Keyed (relative file, enclosing function); stale entries flag.
AGG_BUFFER_ALLOWLIST = {
    ("functions/sketch.py", "cm_sketch"): "one (cell,count) entry per sketch cell — depth*width bounded",
    ("functions/sketch.py", "cm_merge"): "one (pos,sum) entry per position after the element-wise sum — width bounded",
    ("functions/sketch.py", "hist_sketch"): "one (bin,count) entry per histogram bin — n_bins bounded",
    ("functions/sketch.py", "hll_portable_registers"): "one (idx,rank) entry per register — HLL_M bounded",
    ("functions/sketch.py", "hll_portable_merge"): "one (pos,max) entry per register after the element-wise max — HLL_M bounded",
    ("operators/dedup.py", "lsh_candidate_pairs"): "bucket ids <= max_bucket_size via count pre-filter; uncapped only by explicit None",
    ("operators/text.py", "winnow_candidates"): "bucket ids <= max_bucket_size via the same count pre-filter as lsh_candidate_pairs",
    ("operators/text.py", "vocabulary_overlap"): "per-word group set — bounded by |groups|, the operator's declared small dimension",
    ("operators/similarity.py", "normalize_embeddings_zscore"): "one (dim, mean, std) struct per dimension — D bounded (embedding dim)",
    ("operators/dedup.py", "passage_dedup"): "per-document passages — bounded by the document itself",
    ("operators/text.py", "remove_boilerplate_lines"): "per-document surviving lines — bounded by the document itself",
    ("operators/report.py", "group_section"): "showAsList columns are bounded monitoring dims; capped_distinct_list is the high-cardinality path",
    ("operators/report.py", "capped_distinct_list"): "<= cap rows per group after the WindowGroupLimit prune",
    ("plans/inspector.py", "inspector_nested_poll_agg"): "cpuPolls per run — poll-cadence bounded",
    ("plans/report.py", "report_show_as_list"): "event_type is a bounded monitoring dimension; report_show_as_list_bounded is the scale path",
}

_AGG_BUFFER_CALLS = {"collect_set", "collect_list"}


def _agg_buffer_audit(pkg_root) -> tuple[int, list[str]]:
    """Static AST pass: every collect_set/collect_list call site must carry
    an AGG_BUFFER_ALLOWLIST reason; stale entries flag too."""
    import ast
    import pathlib

    root = pathlib.Path(pkg_root)
    lines: list[str] = []
    flagged = 0
    seen_keys: set[tuple[str, str]] = set()
    for p in sorted(root.rglob("*.py")):
        rel = str(p.relative_to(root))
        tree = ast.parse(p.read_text())
        spans = sorted(
            (n.lineno, n.end_lineno or n.lineno, n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        )
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in _AGG_BUFFER_CALLS
            ):
                continue
            fn = next(
                (name for s, e, name in spans if s <= node.lineno <= e),
                "<module>",
            )
            key = (rel, fn)
            seen_keys.add(key)
            why = AGG_BUFFER_ALLOWLIST.get(key)
            if why:
                lines.append(
                    f"ok    agg-buffer {rel}:{node.lineno} {fn}() .{node.func.attr}() — {why}"
                )
            else:
                flagged += 1
                lines.append(
                    f"FLAG  agg-buffer {rel}:{node.lineno} {fn}() .{node.func.attr}() — not in AGG_BUFFER_ALLOWLIST"
                )
    scanned = {str(p.relative_to(root)) for p in root.rglob("*.py")}
    for key in sorted(set(AGG_BUFFER_ALLOWLIST) - seen_keys):
        if key[0] not in scanned:
            continue
        flagged += 1
        lines.append(f"FLAG  stale agg-buffer entry {key[0]}:{key[1]} — no such call site")
    return flagged, lines


#: driver-materialization attrs; ``first`` only when the receiver is not the
#: functions module (``F.first(...)`` is a column aggregate, not an action)
_DRIVER_CALLS = {"collect", "toPandas", "toLocalIterator", "first"}


def _collect_site_audit(pkg_root) -> tuple[int, list[str]]:
    """Static AST pass: find every driver-materialization call in the package
    and check it against COLLECT_ALLOWLIST.  Returns (n_flagged, lines)."""
    import ast
    import pathlib

    root = pathlib.Path(pkg_root)
    lines: list[str] = []
    flagged = 0
    seen_keys: set[tuple[str, str]] = set()
    for p in sorted(root.rglob("*.py")):
        rel = str(p.relative_to(root))
        tree = ast.parse(p.read_text())
        spans = sorted(
            (n.lineno, n.end_lineno or n.lineno, n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        )
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in _DRIVER_CALLS
            ):
                continue
            recv = node.func.value
            # F.first("col") / pd.x(...) — module-level fn, not an action
            if isinstance(recv, ast.Name) and recv.id in {"F", "pd", "np"}:
                continue
            fn = next(
                (name for s, e, name in spans if s <= node.lineno <= e),
                "<module>",
            )
            key = (rel, fn)
            seen_keys.add(key)
            why = COLLECT_ALLOWLIST.get(key)
            if why:
                lines.append(
                    f"ok    collect-site {rel}:{node.lineno} {fn}() .{node.func.attr}() — {why}"
                )
            else:
                flagged += 1
                lines.append(
                    f"FLAG  collect-site {rel}:{node.lineno} {fn}() .{node.func.attr}() — not in COLLECT_ALLOWLIST"
                )
    scanned = {str(p.relative_to(root)) for p in root.rglob("*.py")}
    for key in sorted(set(COLLECT_ALLOWLIST) - seen_keys):
        if key[0] not in scanned:  # scanning a different tree (tests)
            continue
        flagged += 1
        lines.append(f"FLAG  stale allowlist entry {key[0]}:{key[1]} — no such call site")
    return flagged, lines

#: logical nodes that REDUCE their input to per-group / bounded cardinality —
#: a global window running over one of these is metadata-sized, not corpus-sized
_REDUCING_NODES = {"Aggregate", "Distinct", "Deduplicate", "GlobalLimit", "LocalLimit"}


def _global_windows_over_unreduced(df) -> list[str]:
    """Walk the optimized logical plan; return a description line for every
    Window whose partition spec is EMPTY and whose child subtree contains no
    reducing node — the corpus-through-one-task shape (X70 class)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[str] = []

    def has_reduction(node) -> bool:
        if node.nodeName() in _REDUCING_NODES:
            return True
        cs = node.children()
        return any(has_reduction(cs.apply(i)) for i in range(cs.length()))

    def walk(node) -> None:
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            if not has_reduction(node.children().apply(0)):
                bad.append(node.simpleString(80))
        cs = node.children()
        for i in range(cs.length()):
            walk(cs.apply(i))

    walk(plan)
    return bad


#: exact (non-approx) quantile aggregates; \b keeps percentile_approx /
#: approx_percentile from matching (underscore is a word char)
_EXACT_PCT_RE = __import__("re").compile(
    r"\b(?:percentile|median|percentile_cont|percentile_disc)\("
)


def _exact_percentiles_over_unreduced(df) -> list[str]:
    """Walk the optimized logical plan; return a description line for every
    Aggregate computing an exact percentile/median whose child subtree
    contains no reducing node — the buffer-every-distinct-value-of-the-
    corpus shape (r6 X70/X71 hazard class)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[str] = []

    def has_reduction(node) -> bool:
        if node.nodeName() in _REDUCING_NODES:
            return True
        cs = node.children()
        return any(has_reduction(cs.apply(i)) for i in range(cs.length()))

    def walk(node) -> None:
        if node.nodeName() == "Aggregate" and _EXACT_PCT_RE.search(
            node.simpleString(100)
        ):
            if not has_reduction(node.children().apply(0)):
                bad.append(node.simpleString(80))
        cs = node.children()
        for i in range(cs.length()):
            walk(cs.apply(i))

    walk(plan)
    return bad


def _allowed(name: str):
    entry = ALLOWLIST.get(name, [])
    return [entry] if isinstance(entry, tuple) else list(entry)


#: higher-order functions — their ``arguments()`` (the data arrays) are
#: re-evaluated once per ENCLOSING-lambda element when Catalyst inlines a
#: staged chain into them (the r8 X90 class: 156 s vs 2 s for 500 docs)
_HOF_NAMES = {
    "ArrayTransform",
    "ArrayFilter",
    "ArrayAggregate",
    "ZipWith",
    "ArrayExists",
    "ArrayForAll",
    "ArraySort",
    "MapFilter",
    "TransformKeys",
    "TransformValues",
}
#: expensive per-row primitives (catalyst expression class names)
_EXPENSIVE_EXPRS = {"Md5", "XxHash64", "Sha2", "Sha1", "Crc32", "RegExpReplace", "Conv"}
#: derivation nodes: an expensive call is a HAZARD only when its own subtree
#: re-derives its input (normalize/split/hash chains) — ``xxhash64(attr)``
#: repeated k bounded times (bloom probe, minhash salting) is the intended
#: contract and must not flag
_DERIVE_EXPRS = _EXPENSIVE_EXPRS | {
    "StringTrim",
    "Lower",
    "Upper",
    "StringSplit",
    "ConcatWs",
    "Substring",
    "ArrayJoin",
    "ArrayTransform",
    "ArrayFilter",
}


def _lambda_capture_hash(df) -> list[str]:
    """Structural walk of the optimized plan's expression trees; return a
    line for every spot showing the lambda-capture re-evaluation signature
    (the r8 X90 class):

    - a HOF whose DATA ARGUMENT contains an expensive call while the HOF
      itself sits inside a lambda body — CollapseProject inlined a staged
      chain into span lambdas, so the chain re-runs per outer element;
    - the same shape inside a Filter condition — InferFiltersFromGenerate +
      pushdown copied a staged chain to the scan, re-running it per row on
      top of the projection's own evaluation.

    A HOF whose argument is an attribute/literal and whose LAMBDA hashes
    each element (minhash, shingling) is the intended per-element work and
    does not flag.  Cure for real hits: stage the chain behind
    sources/star.py:stage_barrier (the nondeterministic identity fence
    CollapseProject/pushdown cannot cross)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[str] = []

    def simple(e) -> str:
        return e.getClass().getSimpleName()

    def contains_derivation(e) -> bool:
        if simple(e) in _DERIVE_EXPRS:
            return True
        cs = e.children()
        return any(contains_derivation(cs.apply(i)) for i in range(cs.length()))

    def contains_expensive(e) -> bool:
        """An expensive call whose OWN subtree keeps deriving — a re-inlined
        staged chain, not a bounded hash-of-attribute."""
        if simple(e) in _EXPENSIVE_EXPRS:
            cs = e.children()
            if any(contains_derivation(cs.apply(i)) for i in range(cs.length())):
                return True
        cs = e.children()
        return any(contains_expensive(cs.apply(i)) for i in range(cs.length()))

    def scan(e, in_lambda: bool, where: str) -> None:
        nm = simple(e)
        if nm in _HOF_NAMES and in_lambda:
            args = e.arguments()
            for i in range(args.length()):
                a = args.apply(i)
                if contains_expensive(a):
                    bad.append(
                        f"{where}: {nm} data-arg re-derives an expensive chain "
                        f"per outer element: {a.simpleString(100)[:120]}"
                    )
        child_in_lambda = in_lambda or nm == "LambdaFunction"
        cs = e.children()
        for i in range(cs.length()):
            scan(cs.apply(i), child_in_lambda, where)

    def walk(node) -> None:
        is_filter = node.nodeName() == "Filter"
        exprs = node.expressions()
        for i in range(exprs.length()):
            # a Filter's condition counts as "inside a lambda": the inferred
            # size(chain)>0 filter re-runs the chain per row either way
            scan(exprs.apply(i), is_filter, node.nodeName())
        cs = node.children()
        for i in range(cs.length()):
            walk(cs.apply(i))

    walk(plan)
    return bad


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import get_spark
    import __spark_entry__ as em

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cloudcomputing_servicecompositiontest_datapipeline_spark"
    )
    static_bad, static_lines = _collect_site_audit(pkg)
    buf_bad, buf_lines = _agg_buffer_audit(pkg)
    static_bad += buf_bad
    static_lines += buf_lines
    if not only:
        print("\n".join(static_lines))

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            global_wins = _global_windows_over_unreduced(df)
            exact_pcts = _exact_percentiles_over_unreduced(df)
            lam_hash = _lambda_capture_hash(df)
        except Exception as e:  # streaming-only plans etc.
            print(f"SKIP  {name}: {str(e).splitlines()[0][:90]}")
            continue
        hits = [f for f in FLAGS if f in plan]
        if global_wins:
            hits.append("GlobalWindow")
        if exact_pcts:
            hits.append("ExactPercentile")
        if lam_hash:
            hits.append("LambdaCaptureHash")
        notes = []
        for flag, why in _allowed(name):
            if flag in hits:
                hits.remove(flag)
                notes.append(f"allowed: {flag} — {why}")
        note = f" [{'; '.join(notes)}]" if notes else ""
        status = "FLAG" if hits else "ok"
        if hits:
            bad += 1
        print(
            f"{status:4s}  {name:36s} exch={plan.count('Exchange'):2d} "
            f"bcast={plan.count('BroadcastExchange'):2d}"
            f"{' ' + ';'.join(hits) if hits else ''}{note}"
        )
    if not only:
        bad += static_bad
    print(f"{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
