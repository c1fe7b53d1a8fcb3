"""Round-7 additions: Gopher duplicate-line/paragraph fractions (X84),
stratified k-fold assignment (X85), ExactSubstr-style repeated-span
coverage (X86)."""

from __future__ import annotations

import pytest

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators import (
    curation as cu,
    dedup as dd,
    text as tx,
)


# ---------------------------------------------------------------- X84


@pytest.fixture(scope="module")
def lined_docs(spark):
    rows = [
        # 4 lines, "nav" repeated twice -> dup_line_ratio 1/4;
        # chars: nav(3)*2 + body lines -> dup mass = 3
        (0, "nav\nalpha beta\nnav\ngamma delta epsilon"),
        # no repeats at all
        (1, "one two\nthree four\nfive six"),
        # 2 paragraphs, second an exact copy of the first
        (2, "header line\nbody text\n\nheader line\nbody text"),
        # blank/whitespace-only lines are dropped, not counted
        (3, "a\n\n   \n\na"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_structural_repetition_line_ratios(lined_docs):
    out = {r.doc_id: r for r in tx.structural_repetition(lined_docs, "text", "doc_id").collect()}
    r0 = out[0]
    assert r0.n_lines == 4 and r0.dup_line_ratio == 0.25
    total = 3 + 10 + 3 + 19  # nav + "alpha beta" + nav + "gamma delta epsilon"
    assert r0.dup_line_char_ratio == pytest.approx(3 / total, abs=1e-6)
    r1 = out[1]
    assert r1.dup_line_ratio == 0.0 and r1.dup_line_char_ratio == 0.0


def test_structural_repetition_paragraph_ratios(lined_docs):
    out = {r.doc_id: r for r in tx.structural_repetition(lined_docs, "text", "doc_id").collect()}
    r2 = out[2]
    assert r2.n_paras == 2 and r2.dup_para_ratio == 0.5
    # duplicated paragraph mass = chars of one copy
    assert r2.dup_para_char_ratio == 0.5
    # its 4 lines are 2x2 copies -> dup_line_ratio 0.5
    assert r2.n_lines == 4 and r2.dup_line_ratio == 0.5


def test_structural_repetition_degenerates(lined_docs):
    out = {r.doc_id: r for r in tx.structural_repetition(lined_docs, "text", "doc_id").collect()}
    # whitespace-only segments dropped: doc 3 has lines ["a", "a"]
    assert out[3].n_lines == 2 and out[3].dup_line_ratio == 0.5
    # empty text -> zero segments -> NULL ratios, zero counts
    assert out[4].n_lines == 0 and out[4].dup_line_ratio is None
    # NULL text -> NULL everything
    assert out[5].dup_line_ratio is None and out[5].dup_para_ratio is None


# ---------------------------------------------------------------- X85


@pytest.fixture(scope="module")
def fold_docs(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(101)]
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_kfold_stratified_exact_balance(fold_docs):
    out = cu.kfold_assign(fold_docs, "doc_id", k=5, strata_col="lang").collect()
    assert len(out) == 101 and all(0 <= r.fold < 5 for r in out)
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r.fold)
    for stratum, folds in by.items():
        counts = [folds.count(f) for f in range(5)]
        assert max(counts) - min(counts) <= 1, (stratum, counts)


def test_kfold_deterministic_and_redealable(fold_docs):
    a = {r.doc_id: r.fold for r in cu.kfold_assign(fold_docs, "doc_id", k=5).collect()}
    b = {r.doc_id: r.fold for r in cu.kfold_assign(fold_docs, "doc_id", k=5).collect()}
    assert a == b
    c = {r.doc_id: r.fold for r in cu.kfold_assign(fold_docs, "doc_id", k=5, salt="cv1").collect()}
    assert a != c  # a new salt re-deals


def test_kfold_unstratified_is_map_only(fold_docs):
    plan = (
        cu.kfold_assign(fold_docs, "doc_id", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_kfold_rejects_degenerate_k(fold_docs):
    with pytest.raises(ValueError):
        cu.kfold_assign(fold_docs, "doc_id", k=1)


# ---------------------------------------------------------------- X86


@pytest.fixture(scope="module")
def span_docs(spark):
    shared = "one two three four five"  # a 5-gram shared by docs 0 and 1
    rows = [
        (0, shared + " apple banana cherry date elder fig grape"),
        (1, "kiwi lemon mango nectar orange " + shared),
        (2, "unique words only here nothing repeats at all today friend"),
        (3, "tiny dup"),  # < k tokens, duplicated with doc 4
        (4, "tiny dup"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_span_coverage_marks_shared_spans(span_docs):
    out = {r.doc_id: r for r in dd.repeated_span_coverage(span_docs, "text", "doc_id", k=5).collect()}
    # docs 0/1: exactly the 5 shared positions are covered
    assert out[0].covered_tokens == 5 and out[0].n_tokens == 12
    assert out[0].dup_span_frac == pytest.approx(5 / 12, abs=1e-6)
    assert out[1].covered_tokens == 5 and out[1].n_tokens == 10
    # doc 2 shares nothing
    assert out[2].covered_tokens == 0 and out[2].dup_span_frac == 0.0
    # short duplicated docs are fully covered (truncated gram, clamped)
    assert out[3].dup_span_frac == 1.0 and out[4].dup_span_frac == 1.0


def test_span_coverage_union_not_double_count(spark):
    # one doc that repeats its own 5-gram with overlap: positions must be
    # a union, never counted twice
    text = "a b c d e a b c d e a b c d e"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    r = dd.repeated_span_coverage(df, "text", "doc_id", k=5).collect()[0]
    assert r.n_tokens == 15
    assert r.covered_tokens == 15 and r.dup_span_frac == 1.0


def test_span_coverage_no_corpus_broadcast(span_docs):
    plan = (
        dd.repeated_span_coverage(span_docs, "text", "doc_id", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- X87


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [
        (0, "enable javascript\nreal content zero\nmore real text"),
        (1, "enable javascript\nreal content one"),
        (2, "enable javascript\nreal content two"),
        (3, "enable javascript\nenable javascript"),  # fully boilerplate
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_lines_removed_corpus_wide(boiler_docs):
    out = {
        r.doc_id: r
        for r in tx.remove_boilerplate_lines(
            boiler_docs, "text", "doc_id", min_df=3
        ).collect()
    }
    # "enable javascript" occurs 5x (incl. twice in doc 3) -> dropped
    assert out[0].clean_text == "real content zero\nmore real text"
    assert out[0].n_lines_kept == 2 and out[0].n_lines_removed == 1
    assert out[1].clean_text == "real content one"
    # fully-boilerplate doc survives as an EMPTY string, not a lost row
    assert out[3].clean_text == "" and out[3].n_lines_kept == 0
    assert out[3].n_lines_removed == 2
    # NULL text propagates NULL; empty text stays empty with zero counts
    assert out[4].clean_text is None and out[4].n_lines_removed == 0
    assert out[5].clean_text == "" and out[5].n_lines_kept == 0


def test_boilerplate_keeps_original_line_order(spark):
    df = spark.createDataFrame(
        [(0, "zz last\naa first\nmm mid"), (1, "unrelated line")],
        ["doc_id", "text"],
    )
    out = tx.remove_boilerplate_lines(df, "text", "doc_id", min_df=3).collect()
    got = {r.doc_id: r.clean_text for r in out}
    # nothing repeats -> everything kept, ORIGINAL order (not sorted text)
    assert got[0] == "zz last\naa first\nmm mid"


# ---------------------------------------------------------------- X88


@pytest.fixture(scope="module")
def length_docs(spark):
    # ids 0..199 with token counts alternating tiny/huge: arrival-order
    # batching pads ~half of every batch to the huge length
    rows = [(i, 10 if i % 2 else 500) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "n_tok"])


def test_batch_by_length_shape_and_pad(length_docs):
    out = cu.batch_by_length(
        length_docs, "n_tok", "doc_id", batch_size=8, n_shards=4
    ).collect()
    assert len(out) == 200
    sizes = {}
    for r in out:
        assert r.pad_tokens == r.batch_max_tokens - r.n_tokens >= 0
        sizes.setdefault((r.shard, r.batch_id), 0)
        sizes[(r.shard, r.batch_id)] += 1
    assert max(sizes.values()) <= 8


def test_batch_by_length_beats_arrival_order(length_docs):
    out = cu.batch_by_length(
        length_docs, "n_tok", "doc_id", batch_size=8, n_shards=4
    ).collect()
    waste = sum(r.pad_tokens for r in out) / sum(r.batch_max_tokens for r in out)
    # arrival order on this corpus wastes 0.49 (every batch holds both 10s
    # and 500s, so half of every batch pads 490-to-500); bucketing leaves
    # only each shard's single straddle batch paying that price
    toks = [10 if i % 2 else 500 for i in range(200)]
    pad = tot = 0
    for b in range(0, 200, 8):
        batch = toks[b : b + 8]
        m = max(batch)
        pad += sum(m - t for t in batch)
        tot += m * len(batch)
    arrival = pad / tot
    assert waste < arrival / 2


def test_batch_by_length_drops_tokenless_rows(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, 0), (2, None)], ["doc_id", "n_tok"]
    )
    out = cu.batch_by_length(df, "n_tok", "doc_id", batch_size=4, n_shards=2).collect()
    assert [r.doc_id for r in out] == [0]


# ---------------------------------------------------------------- X89


def test_nostraddle_packing_never_splits_and_flags_overflow(spark):
    rows = [(i, n) for i, n in enumerate([30, 30, 30, 100, 10, 64, 5])]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = cu.pack_documents_nostraddle(
        df, "n_tok", "doc_id", context_len=64, n_shards=1
    ).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
    for rows_in_bin in by_bin.values():
        total = sum(r.n_tokens for r in rows_in_bin)
        if len(rows_in_bin) > 1:
            # multi-doc bins always fit; no document straddles a boundary
            assert total <= 64
    # the 100-token doc is alone in its bin and flagged
    big = next(r for r in out if r.n_tokens == 100)
    assert big.overflow and len(by_bin[big.bin_id]) == 1
    assert big.offset_in_bin == 0
    # nothing else is flagged
    assert sum(1 for r in out if r.overflow) == 1


def test_nostraddle_packing_matches_python_model(spark):
    import hashlib

    toks = [7, 64, 3, 65, 64, 1, 1, 62, 2, 2, 40, 25, 24, 10, 90]
    rows = list(enumerate(toks))
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = {
        r.doc_id: (r.shard, r.bin_id, r.offset_in_bin, r.overflow)
        for r in cu.pack_documents_nostraddle(
            df, "n_tok", "doc_id", context_len=64, n_shards=2
        ).collect()
    }

    def draw(i):
        return hashlib.md5(f"p0:{i}".encode()).hexdigest()

    want = {}
    for s in range(2):
        members = sorted(
            (i for i, _ in rows if int(draw(i)[:6], 16) % 2 == s),
            key=lambda i: (draw(i), i),
        )
        bin_id, used = 0, 0
        for j, i in enumerate(members):
            n = toks[i]
            if j > 0 and used + n > 64:
                bin_id, used = bin_id + 1, 0
            want[i] = (s, bin_id, used, n > 64)
            used += n
    assert out == want
