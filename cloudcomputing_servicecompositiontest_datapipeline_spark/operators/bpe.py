"""Distributed BPE vocabulary induction (SURVEY.md §2.12 X36): the
byte-pair-encoding training loop (Sennrich et al. 2016, public) expressed as
Spark aggregations — the tokenizer-training face of a training-data engine.

The algorithm: represent each word as a symbol sequence (characters, with an
end-of-word marker on the last), repeatedly (a) count adjacent symbol pairs
corpus-wide, (b) merge the most frequent pair into one symbol everywhere.
Every round is ONE partial-agg count shuffle whose reduce side is the
symbol-pair vocabulary (Heaps-law small), plus a row-local merge rewrite —
the corpus itself never shuffles.

100 TB design: pair counting aggregates (pair -> count), so the shuffle
carries |pair vocabulary| rows per partition, not corpus rows.  The classic
optimization — train on the WORD HISTOGRAM, not raw text — is built in:
:func:`word_histogram` collapses the corpus to (word, count) first (one
shuffle on the word), after which every merge round touches |vocabulary|
rows.  Merge application is a row-local array fold; per-round lineage is
truncated with localCheckpoint like the CC loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.star import ensure_parallelism
from .dedup import normalized_text

#: End-of-word marker appended to a word's final symbol (standard BPE "</w>").
EOW = "</w>"


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, n) histogram: the classic BPE-training reduction —
    merge rounds then cost |vocabulary|, not |corpus|.  One shuffle."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    return (
        ensure_parallelism(df)
        .select(F.explode(toks).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Split a word into single-character symbols, EOW-marking the last."""
    chars = F.split(word, "")
    last = F.size(chars) - 1
    return F.transform(
        chars,
        lambda c, i: F.when(i == last, F.concat(c, F.lit(EOW))).otherwise(c),
    )


def _apply_merge(symbols: F.Column, a: str, b: str) -> F.Column:
    """Merge every adjacent (a, b) into ab — row-local left-to-right fold
    (matches the reference BPE semantics: after merging at position i, the
    new symbol can immediately merge again only in a LATER round)."""
    zero = F.struct(
        F.expr("array()").cast("array<string>").alias("out"),
        F.lit(False).alias("pending"),  # previous symbol == a, not yet flushed
    )

    def step(acc: F.Column, x: F.Column) -> F.Column:
        merged = F.concat(F.lit(a), F.lit(b))
        # pending 'a' + current 'b' -> emit merged, clear pending
        take_merge = acc["pending"] & (x == b)
        # flush pending 'a' (not followed by b), maybe re-arm on x == a
        flushed = F.when(acc["pending"], F.concat(acc["out"], F.array(F.lit(a)))).otherwise(
            acc["out"]
        )
        return (
            F.when(take_merge, F.struct(F.concat(acc["out"], F.array(merged)).alias("out"), F.lit(False).alias("pending")))
            .when(x == a, F.struct(flushed.alias("out"), F.lit(True).alias("pending")))
            .otherwise(F.struct(F.concat(flushed, F.array(x)).alias("out"), F.lit(False).alias("pending")))
        )

    return F.aggregate(
        symbols,
        zero,
        step,
        lambda acc: F.when(
            acc["pending"], F.concat(acc["out"], F.array(F.lit(a)))
        ).otherwise(acc["out"]),
    )


def pair_counts(hist_symbols: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over a (symbols, n) histogram frame:
    explode each word's adjacent pairs, weight by the word's corpus count.
    ONE partial-agg shuffle; reduce side = |pair vocabulary| rows."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("symbols") - 2),
        lambda i: F.struct(
            F.element_at(F.col("symbols"), i + 1).alias("a"),
            F.element_at(F.col("symbols"), i + 2).alias("b"),
        ),
    )
    return (
        hist_symbols.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("count"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Round-1 pair counts over the raw corpus (characters + EOW): the
    SQL-expressible face of BPE training, used as the oracle anchor."""
    hist = word_histogram(df, text_col).select(
        _initial_symbols(F.col("word")).alias("symbols"), "n"
    )
    return pair_counts(hist)


def bpe_train(
    df: DataFrame, text_col: str, *, n_merges: int = 10
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: per round, one pair-count aggregate
    (tiny reduce side) + a TakeOrdered(1) argmax to the driver + a row-local
    merge rewrite of the |vocabulary|-row histogram.  Ties break
    lexicographically (deterministic across engines and partitionings).
    Returns [(a, b, count), ...] in merge order."""
    hist = word_histogram(df, text_col).select(
        _initial_symbols(F.col("word")).alias("symbols"), "n"
    )
    hist = hist.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(hist)
            .orderBy(F.col("count").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["count"])
        merges.append((a, b, cnt))
        hist = hist.select(
            _apply_merge(F.col("symbols"), a, b).alias("symbols"), "n"
        ).localCheckpoint(eager=False)
    return merges


def bpe_train_df(df: DataFrame, text_col: str, *, n_merges: int = 10) -> DataFrame:
    """:func:`bpe_train` as a declared-query-shaped DataFrame:
    (merge_order, a, b, merged, count)."""
    merges = bpe_train(df, text_col, n_merges=n_merges)
    spark = df.sparkSession
    rows = [
        (i + 1, a, b, a + b, cnt) for i, (a, b, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "merge_order INT, a STRING, b STRING, merged STRING, count BIGINT"
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple],
) -> DataFrame:
    """Tokenize with a LEARNED merge list: start from character symbols and
    apply the merges in learned priority order (the standard greedy BPE
    encoder) — ``n_merges`` row-local folds, no shuffle, merges baked as
    literals.  Output: (id, tokens:array<string>, n_tokens) per WORD
    position re-joined per document.

    HARD BOUND: the chained-transform plan stops ANALYZING at ~50 merges
    (Spark's resolution batch hits max iterations), so this path is for
    demo/small vocabularies only — a real 32k-merge vocabulary must use
    :func:`bpe_encode_pandas` (O(1) plan, result-identical for learned merge
    lists; parity pinned in tests and the ``text_bpe_encode_parity``
    declared query)."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    words = F.filter(toks, lambda w: F.length(w) > 0)
    symbolized = F.transform(words, _initial_symbols)

    # factory keeps the per-round closure a TRUE 1-arg function — default
    # kwargs would change the signature PySpark inspects to pick the
    # transform lambda arity
    def round_fn(a: str, b: str):
        return lambda s: _apply_merge(s, a, b)

    for m in merges:
        symbolized = F.transform(symbolized, round_fn(m[0], m[1]))
    flat = F.flatten(symbolized)
    return ensure_parallelism(df).select(
        F.col(id_col),
        flat.alias("tokens"),
        F.size(flat).alias("n_tokens"),
    )


def bpe_encode_pandas(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple],
) -> DataFrame:
    """Large-vocabulary encoder: ONE Arrow ``mapInPandas`` pass with the
    merge list shipped as a broadcast — plan size is O(1) in ``|merges|``,
    so a real 32k–100k-merge vocabulary compiles where the per-merge
    literal-fold chain of :func:`bpe_encode` would explode the expression
    tree.  Inside the worker it is the standard rank-priority greedy encoder
    (repeatedly merge the lowest-rank adjacent pair present; GPT-2 style):
    for any merge list LEARNED by :func:`bpe_train` — where a compound
    symbol's constituents always rank earlier than the compound — this is
    result-identical to applying the merges in order, pinned by the
    tests/test_curation.py parity test and the ``text_bpe_encode_parity``
    declared query.

    Words are tokenized JVM-side (same ``normalized_text`` split as every
    other path) so normalization cannot drift between engines; only the
    word arrays cross the Arrow boundary.  100 TB shape: map-only over the
    corpus, merges broadcast once per executor, no shuffle."""
    import pandas as pd

    from .dedup import normalized_text

    rank_of = {(m[0], m[1]): i for i, m in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(rank_of)

    def encode_word(word: str, ranks: dict) -> list[str]:
        syms = list(word)
        syms[-1] += EOW
        while len(syms) >= 2:
            best, best_rank = None, None
            for p in zip(syms, syms[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = p, r
            if best is None:
                break
            a, b = best
            out, i, n = [], 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def run(batches):
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_out = []
            for words in pdf["_words"]:
                doc_toks: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    doc_toks.extend(enc)
                toks_out.append(doc_toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks_out,
                    "n_tokens": [len(t) for t in toks_out],
                }
            )

    toks = F.split(normalized_text(F.col(text_col)), " ")
    base = ensure_parallelism(df).select(
        F.col(id_col),
        F.filter(toks, lambda w: F.length(w) > 0).alias("_words"),
    )
    id_type = dict(base.dtypes)[id_col]
    return base.mapInPandas(
        run, schema=f"{id_col} {id_type}, tokens array<string>, n_tokens int"
    )
