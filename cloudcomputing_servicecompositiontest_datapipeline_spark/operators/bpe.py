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

#: Delimiters of the string-rewrite encoder: word separator, symbol open,
#: symbol close.  BPE corpus normalization strips these three control chars
#: (U+0001 / U+001E / U+001F) EVERYWHERE — training and both encoders — so a
#: symbol can never contain a delimiter and a rewrite boundary can never be
#: forged by data.  (Real tokenizers normalize control chars away too.)
_W_SEP, _S_OPEN, _S_CLOSE = "\x01", "\x1e", "\x1f"


def bpe_normalized(col: F.Column) -> F.Column:
    """BPE corpus normalization: :func:`normalized_text` with the three
    rewrite delimiter control chars stripped."""
    return F.translate(normalized_text(col), _W_SEP + _S_OPEN + _S_CLOSE, "")


def _words(col: F.Column) -> F.Column:
    """Normalized word array (empty words from stripped-char runs dropped)."""
    return F.filter(F.split(bpe_normalized(col), " "), lambda w: F.length(w) > 0)


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, n) histogram: the classic BPE-training reduction —
    merge rounds then cost |vocabulary|, not |corpus|.  One shuffle."""
    return (
        ensure_parallelism(df)
        .select(F.explode(_words(F.col(text_col))).alias("word"))
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
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 10,
    seed: list[tuple[str, str, int]] | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: per round, one pair-count aggregate
    (tiny reduce side) + a TakeOrdered(1) argmax to the driver + a row-local
    merge rewrite of the |vocabulary|-row histogram.  Ties break
    lexicographically (deterministic across engines and partitionings).
    Returns [(a, b, count), ...] in merge order.

    ``seed``: an already-learned merge PREFIX (from a shorter training run
    on the SAME corpus).  Training is deterministic, so the first
    ``len(seed)`` rounds would reproduce it exactly — instead the seed
    merges are replayed as LAZY histogram rewrites (one chained plan, zero
    argmax jobs) and live training resumes at round ``len(seed)+1``.  Cuts
    the job count when several queries train at different vocab sizes."""
    hist = word_histogram(df, text_col).select(
        _initial_symbols(F.col("word")).alias("symbols"), "n"
    )
    merges: list[tuple[str, str, int]] = list(seed or [])[:n_merges]
    for a, b, _cnt in merges:
        hist = hist.select(
            _apply_merge(F.col("symbols"), a, b).alias("symbols"), "n"
        )
    hist = hist.localCheckpoint(eager=False)
    for _ in range(n_merges - len(merges)):
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


def bpe_train_df(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 10,
    seed: list[tuple[str, str, int]] | None = None,
) -> DataFrame:
    """:func:`bpe_train` as a declared-query-shaped DataFrame:
    (merge_order, a, b, merged, count)."""
    merges = bpe_train(df, text_col, n_merges=n_merges, seed=seed)
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
    encoder).  Output: (id, tokens:array<string>, n_tokens) per WORD
    position re-joined per document.

    Formulation: the document becomes ONE delimiter-wrapped symbol string
    (``\\x1e sym \\x1f`` per symbol, ``\\x01`` between words — delimiters the
    corpus normalization guarantees no symbol contains), and each merge
    round is ONE literal-string ``replace`` whose left-to-right
    non-overlapping scan IS the reference fold semantics (after a
    replacement the scan resumes AFTER it, so a merged symbol cannot
    re-merge within its own round).  Every per-merge rewrite stays inside
    whole-stage codegen — measured ~8x over the previous interpreted
    higher-order array fold at 20 merges — and the plan is a flat chain of
    scalar ``StringReplace``s, so plan depth is no longer the binding limit.
    A real 32k-merge vocabulary still wants :func:`bpe_encode_pandas` (O(1)
    plan size, merges broadcast; result-identical for learned merge lists —
    parity pinned in tests and the ``text_bpe_encode_parity`` declared
    query)."""
    # wrap every char as \x1e c \x1f; spaces become word separators; the
    # final symbol of each word takes the EOW marker
    s = F.regexp_replace(bpe_normalized(F.col(text_col)), "(.)", _S_OPEN + "$1" + _S_CLOSE)
    s = F.replace(s, F.lit(_S_OPEN + " " + _S_CLOSE), F.lit(_W_SEP))
    s = F.regexp_replace(s, _S_CLOSE + "(?=" + _W_SEP + r"|\z)", EOW + _S_CLOSE)
    for m in merges:
        a, b = m[0], m[1]
        s = F.replace(
            s,
            F.lit(_S_OPEN + a + _S_CLOSE + _S_OPEN + b + _S_CLOSE),
            F.lit(_S_OPEN + a + b + _S_CLOSE),
        )
    flat = F.coalesce(
        F.filter(
            F.split(F.translate(s, _W_SEP + _S_OPEN, ""), _S_CLOSE),
            lambda t: F.length(t) > 0,
        ),
        # NULL text → empty token list, matching bpe_encode_pandas (a NULL
        # tokens/n_tokens row would break the two encoders' parity contract)
        F.array().cast("array<string>"),
    )
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

    Words are tokenized JVM-side (same :func:`bpe_normalized` split as
    every other path) so normalization cannot drift between engines; only
    the word arrays cross the Arrow boundary.  100 TB shape: map-only over
    the corpus, merges broadcast once per executor, no shuffle."""
    import pandas as pd

    rank_of = {(m[0], m[1]): i for i, m in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(rank_of)

    def encode_word(word: str, ranks: dict) -> list[str]:
        if not word:  # defensive: an empty word has no symbols to merge
            return []
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

    base = ensure_parallelism(df).select(
        F.col(id_col),
        # NULL text → empty word array HERE (JVM-side): a None reaching the
        # pandas kernel is not iterable and would kill the whole Arrow task
        # — one NULL document must not fail a 100 TB encode job
        F.coalesce(
            _words(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_words"),
    )
    id_type = dict(base.dtypes)[id_col]
    return base.mapInPandas(
        run, schema=f"{id_col} {id_type}, tokens array<string>, n_tokens int"
    )
