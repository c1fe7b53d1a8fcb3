"""Text-analysis operators (SURVEY.md §2.12 X4): language-ID heuristic,
quality scoring, token counting, document fingerprinting.  All JVM-side
(built-in functions, no UDFs) so they run inside whole-stage codegen at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.star import ensure_parallelism
from .dedup import normalized_text

#: Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des"],
}

#: A BPE-ish token pattern: runs of word chars, or single non-space symbols.
BPE_TOKEN_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def _stopword_hits(tokens: F.Column, words: list[str]) -> F.Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def language_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Language-ID: per-language stopword hit counts + argmax guess.
    (Heuristic n-gram/stopword scorer — the classic fastText-free fallback.)"""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    out = ensure_parallelism(df).select(F.col(id_col), toks.alias("tokens"))
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"hits_{lang}", _stopword_hits(F.col("tokens"), words))
    hit_cols = [F.col(f"hits_{lang}") for lang in STOPWORDS]
    best = F.greatest(*hit_cols)
    guess = None
    for lang in STOPWORDS:
        cond = F.col(f"hits_{lang}") == best
        guess = F.when(cond, lang) if guess is None else guess.when(cond, lang)
    return out.select(
        id_col,
        *[f"hits_{lang}" for lang in STOPWORDS],
        F.when(best > 0, guess).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Quality scoring: length, token stats, punctuation/stopword ratios —
    the standard cheap pre-filters of an LLM data pipeline."""
    text = F.col(text_col)
    toks = F.split(normalized_text(text), " ")
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    mult = 1000000.0
    avg_word_len = F.floor(
        (n_chars - n_tokens + 1).cast("double") / n_tokens * mult + 0.5
    ) / mult
    return ensure_parallelism(df).select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_word_len.alias("avg_word_len"),
        (F.floor(n_punct.cast("double") / n_chars * mult + 0.5) / mult).alias("punct_ratio"),
        (F.floor(n_stop.cast("double") / n_tokens * mult + 0.5) / mult).alias("stopword_ratio"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish regex token count
    (approximates LLM token budgeting at ingest)."""
    text = F.col(text_col)
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.size(F.split(F.trim(text), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)).alias("bpe_tokens"),
        F.length(text).alias("n_chars"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set (an
    order-independent content signature; near-dup docs with identical
    vocabulary collide — by design, like shingle fingerprinting)."""
    toks = F.sort_array(F.array_distinct(F.split(normalized_text(F.col(text_col)), " ")))
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
        F.sha2(F.array_join(toks, " "), 256).alias("fingerprint_sha"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Sequence chunking: split each document into fixed-size token windows
    with overlap — the pre-tokenization packing step of an LLM data pipeline
    (context-window-sized pieces, overlapping so no boundary context is
    lost).

    One ``posexplode`` over computed chunk starts; no UDFs, no shuffle —
    chunking is embarrassingly parallel per document, so output partitioning
    follows input partitioning at any scale.  Chunk starts stride by
    ``chunk_size - overlap``; the final chunk is allowed to be short.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(normalized_text(F.col(text_col)), " ")
    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
    return (
        ensure_parallelism(df)
        .select(F.col(id_col), toks.alias("_toks"))
        .select(
            id_col,
            "_toks",
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_size), F.size("_toks") - F.col("_start")
            ).alias("n_tokens"),
        )
    )


#: PII patterns scrubbed by :func:`redact_pii` — email, E.164-ish / US phone,
#: IPv4, and 13-16-digit card-like numbers.  Deliberately conservative regexes
#: (high precision) — a production pipeline layers a learned NER pass on top;
#: these are the deterministic regex tier every corpus pipeline runs first.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # country code only with a literal '+'; \b inside the optional '(' keeps
    # (555) forms matching while the trailing \b stops the pattern matching
    # the first 10 digits of a longer (card-like) digit run.  RE2-compatible:
    # no lookaround, so the same pattern runs on DuckDB for the oracle.
    ("phone", r"(\+\d{1,3}[-. ]?)?\(?\b\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{13,16}\b", "<CARD>"),
]


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII scrubbing: regex-redact emails/phones/IPs/card-like numbers and
    count the hits per class — the compliance gate of a training-data
    pipeline.  Chained ``regexp_replace`` stays in whole-stage codegen
    (row-local, shuffle-free); counts come from ``regexp_count`` on the
    ORIGINAL text so the redaction is auditable."""
    text = F.col(text_col)
    redacted = text
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(text, F.lit(pat)).alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, token)
    return ensure_parallelism(df).select(
        F.col(id_col), redacted.alias("redacted_text"), *counts
    )


def repetition_scores(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Within-document repetition: fraction of duplicate tokens and duplicate
    word n-grams — the classic boilerplate/spam signal (templated or
    looping text scores high; clean prose scores low).  Pure array
    expressions per row: no explode, no shuffle."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    mult = 1000000.0

    def dup_ratio(arr: F.Column) -> F.Column:
        total = F.size(arr)
        uniq = F.size(F.array_distinct(arr))
        return F.floor((total - uniq).cast("double") / total * mult + 0.5) / mult

    return ensure_parallelism(df).select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        dup_ratio(toks).alias("dup_token_ratio"),
        dup_ratio(grams).alias(f"dup_{n}gram_ratio"),
    )


def gram_array(toks: F.Column, n: int) -> F.Column:
    """Word n-gram array from a token array — row-local.
    NB: a plain 1-arg lambda — ``lambda i, n=n`` would make PySpark pick
    transform's two-arg (element, index) form and bind n to the index."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )


def modal_coverage_chars(grams: F.Column) -> F.Column:
    """Chars covered by the modal gram = max over grams of count(g)*len(g).
    Computed as sort + run-length fold — O(g log g) per doc, where the
    naive distinct×filter scan is O(u·g) and blows up on long documents
    (26 s vs <1 s for the sf0.1 corpus).  Fold state: (prev gram, current
    run length, best covered-chars so far)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: F.Column, x: F.Column) -> F.Column:
        run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * F.length(x)).alias("best"),
        )

    return F.aggregate(F.array_sort(grams), zero, step, lambda acc: acc["best"])


def top_ngram_coverage(
    df: DataFrame, text_col: str, id_col: str, *, ns: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """Gopher-rule repetition signal (Rae et al. 2021 §A1.1, public): per
    document, the fraction of characters covered by the single most frequent
    word n-gram, for each n in ``ns`` — templated/boilerplate text
    concentrates its characters in one repeated phrase; prose doesn't.

    coverage_n = max over n-grams g of (count(g) * len(g)) /
    len(normalized_text).  Pure higher-order array expressions per row —
    sort + run-length fold, O(g log g) within one document, no explode, NO
    shuffle — the same zero-shuffle posture as :func:`repetition_scores`,
    so at 100 TB this is a map-only pass fused into the scan."""
    norm = normalized_text(F.col(text_col))
    toks = F.split(norm, " ")
    mult = 1000000.0
    cols = [F.col(id_col)]
    for n in ns:
        covered = modal_coverage_chars(gram_array(toks, n))
        ratio = F.least(covered.cast("double") / F.length(norm), F.lit(1.0))
        cols.append((F.floor(ratio * mult + 0.5) / mult).alias(f"top_{n}gram_char_ratio"))
    return ensure_parallelism(df).select(*cols)


def token_ngrams(df: DataFrame, text_col: str, id_col: str, n: int = 5) -> DataFrame:
    """Explode each document into its word n-grams (one row per gram).
    Documents shorter than ``n`` tokens produce no rows.  Explode is
    row-local — no shuffle; downstream joins/aggregations decide the
    partitioning."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        ensure_parallelism(df)
        .filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(grams).alias("gram"))
    )


def contamination_counts(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing word
    n-grams with a held-out evaluation set (the standard pre-training
    hygiene check — e.g. Brown et al. 2020 §C used 13-gram overlap).

    Shape at 100 TB: the eval side is tiny (benchmarks are KBs-to-MBs), so
    the distinct eval-gram set is BROADCAST and the train side never
    shuffles on the gram — one row-local explode, a broadcast-hash
    semi-ish join, then a single aggregation back on the document id.
    Grams are compared via ``md5`` so join width stays 32 bytes regardless
    of n.  Returns only contaminated docs: (id, n_hits = distinct shared
    grams, n_grams = distinct grams in the doc).
    """
    t_grams = token_ngrams(train, text_col, id_col, n).select(
        F.col(id_col), F.md5(F.col("gram")).alias("gh")
    )
    e_grams = (
        token_ngrams(eval_df, text_col, id_col, n)
        .select(F.md5(F.col("gram")).alias("gh"))
        .distinct()
    )
    hit = F.broadcast(e_grams.withColumn("_hit", F.lit(1)))
    return (
        t_grams.join(hit, "gh", "left")
        .groupBy(id_col)
        .agg(
            F.count_distinct(F.when(F.col("_hit") == 1, F.col("gh"))).alias("n_hits"),
            F.count_distinct("gh").alias("n_grams"),
        )
        .filter(F.col("n_hits") > 0)
    )


def tfidf_top_terms(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF.  The score is
    the log-free monotone form ``floor(tc * N * 1e6 / (doc_len * df))`` —
    exact integer products and one IEEE division, so it hashes identically
    across engines (``ln`` differs in the last ulp between libm builds;
    swapping the log variant back in is a one-line change when cross-engine
    hashing isn't needed).

    Scale shape: one shuffle to (doc, term) counts, one vocabulary-keyed
    aggregation for document frequency (stopword terms are hot keys — AQE
    skew-join handles the join back), and a broadcast 1-row corpus count.
    No driver-side collect."""
    from pyspark.sql import Window

    toks = F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term")
    tf = (
        ensure_parallelism(df)
        .select(F.col(id_col), toks)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    dl = tf.groupBy(id_col).agg(F.sum("tc").alias("dlen"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.floor(
        F.col("tc") * F.col("n_docs") * 1000000.0 / (F.col("dlen") * F.col("dfreq"))
    ).cast("long")
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "term")
    return (
        tf.join(dl, id_col)
        .join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(id_col, "term", score.alias("score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


#: Ordered rule names of :func:`quality_funnel` (order = evaluation order —
#: attribution assigns each dropped doc to the FIRST rule it fails).
FUNNEL_RULES = ("min_tokens", "max_dup_tokens", "max_top2gram", "lang_known")


def quality_funnel(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_tokens: int = 10,
    max_dup_token_ratio: float = 0.6,
    max_top2gram_ratio: float = 0.5,
) -> DataFrame:
    """X35 quality-filter funnel with per-rule attribution (the FineWeb-style
    "how much did each filter remove" observability layer, public): evaluate
    the ordered rule chain per document and record, besides the final
    ``keep``, WHICH rule dropped each casualty (``first_failed``) — the
    evidence a curation run needs to publish its per-filter removal stats.

    Rules (all row-local expressions over ONE scan, no Python, no shuffle):
    min token count, duplicate-token ratio cap, Gopher top-2-gram char
    coverage cap, stopword-hit language known.  Output: one row per doc with
    a boolean per rule + keep + first_failed (NULL for kept docs)."""
    norm = normalized_text(F.col(text_col))
    toks = F.split(norm, " ")
    n_toks = F.size(toks)
    dup_ratio = (n_toks - F.size(F.array_distinct(toks))).cast("double") / n_toks
    cov2 = F.least(
        modal_coverage_chars(gram_array(toks, 2)).cast("double") / F.length(norm),
        F.lit(1.0),
    )
    hits = [ _stopword_hits(toks, ws) for ws in STOPWORDS.values() ]
    rules = {
        "min_tokens": n_toks >= min_tokens,
        "max_dup_tokens": dup_ratio <= max_dup_token_ratio,
        "max_top2gram": cov2 <= max_top2gram_ratio,
        "lang_known": F.greatest(*hits) > 0,
    }
    assert tuple(rules) == FUNNEL_RULES
    first_failed = F.lit(None).cast("string")
    for name in reversed(FUNNEL_RULES):
        first_failed = F.when(~rules[name], F.lit(name)).otherwise(first_failed)
    out = [F.col(id_col)]
    out += [rules[name].alias(f"r_{name}") for name in FUNNEL_RULES]
    out += [first_failed.isNull().alias("keep"), first_failed.alias("first_failed")]
    return ensure_parallelism(df).select(*out)


def funnel_report(funnel: DataFrame) -> DataFrame:
    """Funnel rollup of :func:`quality_funnel`: per rule (in evaluation
    order), how many docs REACHED it (survived all earlier rules) and how
    many it dropped.  ONE aggregate scan exploded to per-rule rows (the
    quality_checks.py single-scan pattern); drop_rate = dropped/reached,
    rounded for engine independence."""
    aggs = [F.count(F.lit(1)).alias("n_total")]
    for name in FUNNEL_RULES:
        aggs.append(
            F.sum(F.when(F.col("first_failed") == name, 1).otherwise(0)).alias(
                f"drop_{name}"
            )
        )
    row = funnel.agg(*aggs)
    mult = 1000000.0
    sections = []
    reached = F.col("n_total")
    for i, name in enumerate(FUNNEL_RULES):
        dropped = F.col(f"drop_{name}")
        sections.append(
            F.struct(
                F.lit(i + 1).alias("rule_order"),
                F.lit(name).alias("rule"),
                reached.cast("long").alias("n_reached"),
                dropped.cast("long").alias("n_dropped"),
                (F.floor(dropped / reached * mult + 0.5) / mult).alias("drop_rate"),
            )
        )
        reached = reached - dropped
    return row.select(
        F.explode(F.array(*sections)).alias("s")
    ).select("s.rule_order", "s.rule", "s.n_reached", "s.n_dropped", "s.drop_rate")



def train_bigram_lm(
    df: DataFrame,
    text_col: str,
    *,
    top_k: int | None = None,
) -> dict:
    """X42 CCNet-style quality model: an interpolated add-one bigram LM
    trained on the corpus itself (Wenzek et al. 2020 filter perplexity with
    a KenLM 5-gram; the bigram form keeps the model literal-bakeable).

    Counts are distributed aggregates; only the (optionally top_k-capped,
    count-desc word-asc deterministic) count tables come to the driver --
    the model size is bounded by the PARAMETER, the bounded-collect
    justification of the IVF/Bloom patterns.  Returns {"uni": {...},
    "bi": {...}, "n_tokens": N, "vocab": V}."""
    from .dedup import normalized_text

    toks = F.split(normalized_text(F.col(text_col)), " ")
    words = ensure_parallelism(df).select(F.explode(toks).alias("w")).filter(
        F.length("w") > 0
    )
    uq = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    if top_k:
        uq = uq.orderBy(F.col("n").desc(), "w").limit(top_k)
    uni = {r["w"]: int(r["n"]) for r in uq.collect()}
    pairs_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("a"),
            F.element_at(toks, i + 2).alias("b"),
        ),
    )
    bq = (
        ensure_parallelism(df)
        .filter(F.size(toks) >= 2)
        .select(F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k:
        bq = bq.orderBy(F.col("n").desc(), "a", "b").limit(top_k)
    bi = {(r["a"], r["b"]): int(r["n"]) for r in bq.collect()}
    return {
        "uni": uni,
        "bi": bi,
        "n_tokens": sum(uni.values()),
        "vocab": len(uni),
    }


def perplexity_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: dict,
    *,
    round_scale: int = 6,
) -> DataFrame:
    """X42 scoring: per-document bigram perplexity under ``model`` --
    exp(-mean ln p(w_i | w_{i-1})) with interpolated add-one smoothing
    p(w|prev) = (c(prev,w) + (c(w)+1)/(N+V)) / (c(prev) + 1).

    The model ships as LITERAL maps inside the expression (size bounded by
    the training top_k), so scoring is row-local and shuffle-free; at a
    vocabulary too big to bake, swap the literal maps for a broadcast join
    on the bigram key -- the formula and outputs are unchanged.  Low
    perplexity = in-distribution text; the classic CCNet cut keeps the
    low/middle perplexity bands.  Docs with <2 tokens score NULL."""
    from .dedup import normalized_text

    uni, bi = model["uni"], model["bi"]
    n_tok, vocab = model["n_tokens"], model["vocab"]
    uni_map = (
        F.create_map(
            *[F.lit(x) for kv in uni.items() for x in (kv[0], float(kv[1]))]
        )
        if uni
        else F.create_map().cast("map<string,double>")
    )
    bi_map = (
        F.create_map(
            *[
                F.lit(x)
                for (a, b), n in bi.items()
                for x in (a + "\u0001" + b, float(n))
            ]
        )
        if bi
        else F.create_map().cast("map<string,double>")
    )
    toks = F.split(normalized_text(F.col(text_col)), " ")
    pair_logps = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: (
            F.log(
                (
                    F.coalesce(
                        F.element_at(
                            bi_map,
                            F.concat(
                                F.element_at(toks, i + 1),
                                F.lit("\u0001"),
                                F.element_at(toks, i + 2),
                            ),
                        ),
                        F.lit(0.0),
                    )
                    + (
                        F.coalesce(F.element_at(uni_map, F.element_at(toks, i + 2)), F.lit(0.0))
                        + 1.0
                    )
                    / float(n_tok + vocab)
                )
                / (
                    F.coalesce(F.element_at(uni_map, F.element_at(toks, i + 1)), F.lit(0.0))
                    + 1.0
                )
            )
        ),
    )
    mult = float(10**round_scale)
    # decimal-accumulate the per-pair log-probs (terms are engine-identical
    # doubles; only fold order would differ between engines)
    dec = "decimal(28,12)"
    mean_logp = (
        F.aggregate(
            F.transform(pair_logps, lambda x: x.cast(dec)),
            F.lit(0).cast(dec),
            lambda a, x: (a + x).cast(dec),
        ).cast("double")
        / F.size(pair_logps)
    )
    ppl = F.when(F.size(toks) >= 2, F.exp(-mean_logp))
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (F.floor(ppl * mult + 0.5) / mult).alias("perplexity"),
    )
