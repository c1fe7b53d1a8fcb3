"""Degenerate-schema sweep (r6 verdict item 8): every registered query runs
against a ZERO-ROW copy of the star schema.

The r6 NaN/±Inf sweep found four latent monitor defects; empty frames are
the remaining unswept corner — a whole class of operators (trainers,
cutoff computations, dense-axis builders, global aggregates feeding plan
literals) touch driver-side values that stop existing when the input is
empty.  Contract pinned here:

- a query either returns a DataFrame that COLLECTS cleanly (possibly 0
  rows — most operators), or
- raises ``ValueError`` with a readable message (the documented fail-loud
  paths: quantile_map's empty reference, the k-means/PQ trainers' empty
  embedding table).

Anything else — numpy IndexErrors, Py4J NPEs, ANSI cast errors, silent
hangs — is a latent one-bad-partition bug at 100 TB (an empty partition,
an all-filtered slice) and fails the sweep.

Execution shape (r11): each sweep PREFETCHES every query's outcome on a
small thread pool inside its module fixture (guide §2.6 — independent
driver work overlaps; the engine is thread-safe for concurrent builds
since the package-zip and state-partition races were locked), and the
232 parametrized tests assert the recorded outcome.  Same tests, same
strictness, ~6× less wall-clock: the serial form spent ~0.5 s of
build+collect latency per query × 7 corpora."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

#: queries DOCUMENTED to fail loudly on an empty corpus (ValueError with a
#: readable message) — everything else must produce a collectable frame.
EXPECTED_VALUEERROR = {
    # quantile_map: an empty reference distribution has no quantile curve
    "curation_quantile_map",
    # k-means / PQ trainers: no usable vectors to train on
    "dedup_semantic_centroids",
    "similarity_ivf_topk",
    "similarity_pq_encode",
    "similarity_pq_eval",
    "similarity_ann_eval",
    "similarity_ann_sweep",
}

_QUERIES = em.queries()

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _run_all(spark, sf_dir: str) -> dict[str, tuple[int | None, Exception | None]]:
    """Build + collect every registered query against ``sf_dir`` on a thread
    pool; record (n_rows, exception) per query for the parametrized asserts."""
    from concurrent.futures import ThreadPoolExecutor

    def one(name: str):
        try:
            rows = _QUERIES[name](spark, sf_dir).collect()
            return name, (len(rows), None)
        except Exception as e:  # noqa: BLE001 — the sweep classifies it
            return name, (None, e)

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(one, sorted(_QUERIES)))


def _write_tables(spark, out, make_df) -> str:
    from concurrent.futures import ThreadPoolExecutor

    def one(t: str) -> None:
        make_df(t).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(one, _TABLES))
    return str(out)


@pytest.fixture(scope="module")
def empty_results(spark, tmp_path_factory):
    """Outcomes on a star-schema directory with every table present but ZERO
    rows — schemas cloned from the sf0.001 fixtures so casts/column
    resolution behave exactly as on real data."""
    from tests.conftest import SF_SMOKE

    out = tmp_path_factory.mktemp("sf_empty")

    def make(t: str):
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        return spark.createDataFrame([], df.schema)

    return _run_all(spark, _write_tables(spark, out, make))


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_empty_corpus(name, empty_results):
    n_rows, exc = empty_results[name]
    if name in EXPECTED_VALUEERROR:
        assert isinstance(exc, ValueError), (
            f"{name} must fail loudly (ValueError) on an empty corpus, got {exc!r}"
        )
        return
    assert exc is None, f"{name} crashed on the empty corpus: {exc!r}"
    assert n_rows is not None  # collected cleanly; emptiness is fine


@pytest.fixture(scope="module")
def one_row_results(spark, tmp_path_factory):
    """Outcomes on a star-schema directory with exactly ONE row per table —
    the n=1 degenerate that exercises every (n-1) denominator,
    single-element window, 1-point quantile curve, and 1-vector trainer
    path.  Rows are each table's first row, so joins may legitimately come
    up empty (referential misses are fine; crashes are not)."""
    from tests.conftest import SF_SMOKE

    out = tmp_path_factory.mktemp("sf_one")

    def make(t: str):
        return spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").limit(1)

    return _run_all(spark, _write_tables(spark, out, make))


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_one_row_corpus(name, one_row_results):
    """Every query must collect cleanly on a 1-row corpus: no ANSI /0 from
    an (n-1) denominator, no trainer IndexError on a 1-vector sample, no
    empty-window crash.  ValueError is NOT acceptable here — one row is a
    usable corpus for every operator."""
    n_rows, exc = one_row_results[name]
    assert exc is None, f"{name} crashed on the one-row corpus: {exc!r}"
    assert n_rows is not None


@pytest.fixture(scope="module")
def constant_results(spark, tmp_path_factory):
    """Outcomes on a star-schema directory where every table is its FIRST
    ROW repeated 50 times — the all-duplicates degenerate: every document
    identical (one LSH bucket holds the whole corpus — the skew-cap path),
    every cluster a clique, every score column single-distinct (zero
    variance, one-point quantile curves, zero MAD), duplicate keys
    everywhere."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE

    out = tmp_path_factory.mktemp("sf_const")

    def make(t: str):
        one = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").limit(1)
        return one.crossJoin(
            spark.range(50).select(F.lit(1).alias("_dup"))
        ).drop("_dup")

    return _run_all(spark, _write_tables(spark, out, make))


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_constant_corpus(name, constant_results):
    """Every query must collect cleanly on the all-duplicates corpus — the
    degenerate that produces maximal-skew buckets, cliques, and
    zero-variance statistics.  No ValueError is acceptable: 50 identical
    rows are a usable (if pathological) corpus for every operator."""
    n_rows, exc = constant_results[name]
    assert exc is None, f"{name} crashed on the constant corpus: {exc!r}"
    assert n_rows is not None


#: primary-key columns kept intact in the NULL-heavy fixture — a NULL join
#: key is a data-quality problem upstream of every operator here, but any
#: OTHER column must tolerate NULLs row by row
_TABLE_KEYS = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


@pytest.fixture(scope="module")
def nullheavy_results(spark, tmp_path_factory):
    """Outcomes on a star-schema directory where every NON-KEY column is
    NULL on a seeded ~50% of rows — the dirty-feed degenerate: half-missing
    texts, embeddings, timestamps, and measures, with join keys intact so
    plans still traverse their joins."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE

    out = tmp_path_factory.mktemp("sf_nulls")

    def make(t: str):
        keys = _TABLE_KEYS[t]
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        cols = [
            F.col(c)
            if c in keys
            else F.when(F.xxhash64(F.lit(t + c), F.monotonically_increasing_id()) % 2 == 0, F.col(c))
            .otherwise(F.lit(None))
            .alias(c)
            for c in df.columns
        ]
        return df.select(cols)

    return _run_all(spark, _write_tables(spark, out, make))


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_nullheavy_corpus(name, nullheavy_results):
    """Every query must collect cleanly when half of every non-key column
    is NULL — the realistic dirty-feed shape (failed scrapes, missing
    embeddings, null timestamps).  The fail-loud trainers may raise their
    documented ValueError only if their specific input column lost every
    usable row; everything else must degrade to NULL/absent rows, never
    crash."""
    n_rows, exc = nullheavy_results[name]
    if isinstance(exc, ValueError):
        assert name in EXPECTED_VALUEERROR, (
            f"{name} raised ValueError on the null-heavy corpus but is not "
            "a documented fail-loud operator"
        )
        return
    assert exc is None, f"{name} crashed on the null-heavy corpus: {exc!r}"
    assert n_rows is not None


#: per-table (column -> hot value picker) for the skew fixture: the
#: natural grouping/join keys each get ONE dominant value on ~95% of rows
#: (FK validity preserved — hot values are EXISTING keys/categories), the
#: shape a viral document, a bot user, or a mega-customer produces.
_SKEW_COLS = {
    "events": ["user_id", "event_type"],
    "documents": ["source", "lang"],
    "orders": ["o_custkey"],
    "lineitem": ["l_suppkey"],
    "embeddings": ["label"],
}


@pytest.fixture(scope="module")
def skewed_results(spark, tmp_path_factory):
    """Outcomes on a star-schema directory where each table's natural
    grouping keys are ~95% ONE value (the minimum existing value, so FK
    integrity holds).  Every groupBy/join on those keys sees one
    partition-dominating bucket — the single-hot-key degenerate that AQE
    skew handling, salting, and the capped-bucket dedup paths exist for."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE

    out = tmp_path_factory.mktemp("sf_skew")

    def make(t: str):
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        for c in _SKEW_COLS.get(t, []):
            hot = df.agg(F.min(F.col(c))).collect()[0][0]
            keep = (
                F.xxhash64(F.lit(t + c), F.monotonically_increasing_id()) % 20 == 0
            )
            df = df.withColumn(
                c, F.when(keep, F.col(c)).otherwise(F.lit(hot))
            )
        return df

    return _run_all(spark, _write_tables(spark, out, make))


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_skewed_corpus(name, skewed_results):
    """Every query must collect cleanly when one key owns ~95% of every
    grouping column — the hot-key degenerate.  Correctness only (the
    perf story is AQE + the explicit salting/capped-bucket paths); any
    crash here is a one-hot-partition bug at 100 TB."""
    n_rows, exc = skewed_results[name]
    if isinstance(exc, ValueError):
        assert name in EXPECTED_VALUEERROR, (
            f"{name} raised ValueError on the skewed corpus but is not "
            "a documented fail-loud operator"
        )
        return
    assert exc is None, f"{name} crashed on the skewed corpus: {exc!r}"
    assert n_rows is not None


@pytest.fixture(scope="module")
def unicode_results(spark, tmp_path_factory):
    """Outcomes on a star-schema directory where every document text is
    replaced by a unicode-hostile rendering -- emoji (incl. modifier
    sequences), RTL runs, CJK, combining marks, astral-plane codepoints,
    zero-width joiners and raw control chars spliced between the original
    tokens.  Regex token splits, char-class quality signals, NFC
    normalization, BPE byte handling, winnowing shingles and HTML
    stripping all chew on this at 100 TB; any crash or codec error here is
    a real-corpus bug."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE

    out = tmp_path_factory.mktemp("sf_unicode")
    hostile = [
        "\U0001F600\U0001F3FD",       # emoji + skin-tone modifier
        "\u0645\u0631\u062d\u0628\u0627",  # Arabic (RTL)
        "\u4f60\u597d\u4e16\u754c",  # CJK
        "e\u0301\u0327",               # combining acute + cedilla
        "\U00010348",                   # astral plane (Gothic)
        "\u200d\u200b\ufeff",         # ZWJ / ZWSP / BOM
        "\x01\x1e\x1f",               # raw control chars
        "\u05e9\u05dc\u05d5\u05dd",  # Hebrew (RTL)
    ]

    def make(t: str):
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        if t == "documents":
            # splice a hostile token between every original token, rotating
            # through the list by doc_id so texts stay distinct
            frag = F.element_at(
                F.array(*[F.lit(h) for h in hostile]),
                (F.col("doc_id") % len(hostile) + 1).cast("int"),
            )
            df = df.withColumn(
                "text",
                F.when(
                    F.col("text").isNotNull(),
                    F.concat(
                        frag,
                        F.lit(" "),
                        F.regexp_replace(
                            F.col("text"), " ",
                            F.concat(F.lit(" "), frag, F.lit(" ")),
                        ),
                        F.lit(" \U0001F9EA"),
                    ),
                ),
            )
        return df

    return _run_all(spark, _write_tables(spark, out, make))


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_unicode_corpus(name, unicode_results):
    """Every query must collect cleanly on the unicode-hostile corpus --
    multi-byte, RTL, combining and astral-plane text is normal web data,
    and a codepoint that kills a tokenizer/regex/encoder task kills the
    whole 100 TB job."""
    n_rows, exc = unicode_results[name]
    if isinstance(exc, ValueError):
        assert name in EXPECTED_VALUEERROR, (
            f"{name} raised ValueError on the unicode corpus but is not "
            "a documented fail-loud operator"
        )
        return
    assert exc is None, f"{name} crashed on the unicode corpus: {exc!r}"
    assert n_rows is not None
