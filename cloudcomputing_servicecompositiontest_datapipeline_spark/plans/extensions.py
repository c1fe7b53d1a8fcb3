"""Declared queries for the LLM-data-pipeline extensions (SURVEY.md §2.12)
over ``documents`` / ``embeddings``.  SQL-expressible ops get DuckDB oracles;
MinHash/SimHash/LSH (hash-function-dependent) and the multimodal stubs are
rows-only + pytest-covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import multimodal as mm
from ..operators import similarity as sim
from ..operators import text as tx
from ..session import apply_runtime_conf
from ..sources import star
from .registry import query

#: DuckDB twin of dedup.normalized_text.
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

#: Embedding dimensionality of the ANN/embedding-QC family — ONE constant
#: shared between the Spark call sites (lsh_topk/ann_sweep ``dim=``,
#: embedding_qc ``expected_dim=``) and the DuckDB oracles, so a fixture
#: dimension change cannot silently diverge the two sides' guards
#: (r9 ADVICE).
_ANN_DIM = 64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return star.table(spark, sf_dir, "documents")


@query(
    "dedup_exact_text",
    oracle=f"""
    SELECT sha256({_NORM}) AS content_hash,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup by normalized sha256, first(-lowest-id)-wins."""
    return dd.exact_dedup(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, list_distinct(string_split({_NORM}, ' ')) AS tokens
      FROM documents WHERE doc_id < 500
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           floor(cast(len(list_intersect(a.tokens, b.tokens)) AS double)
                 / len(list_distinct(list_concat(a.tokens, b.tokens))) * 1000000 + 0.5) / 1000000
             AS jaccard
    FROM toks a JOIN toks b
      ON a.doc_id < b.doc_id AND a.lang = b.lang
    WHERE floor(cast(len(list_intersect(a.tokens, b.tokens)) AS double)
                / len(list_distinct(list_concat(a.tokens, b.tokens))) * 1000000 + 0.5) / 1000000 >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact variant: word-set Jaccard near-dup pairs, language-blocked
    self-join.  Quadratic within a block (at corpus scale one language
    dominates and the block explodes), so the DECLARED query runs on a hard
    500-doc slice — exact Jaccard's production roles are the verification
    kernel inside ``minhash_near_dups`` (candidates only) and the bounded
    oracle twin for ``dedup_cluster_canonical``; the unbounded near-dup
    scale path is ``dedup_minhash_lsh`` → ``dedup_cluster_canonical_lsh``."""
    return dd.ngram_jaccard_pairs(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 500),
        "text",
        "doc_id",
        block_col="lang",
        threshold=0.5,
    )


def _md5_lsh_pair_ctes(
    *,
    where: str = "text IS NOT NULL",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 1000,
    threshold: float = 0.5,
) -> str:
    """The md5-LSH pair pipeline as a reusable, PARAMETERIZED CTE chain —
    ends at ``lsh_pairs`` (id_a < id_b, verified jaccard >= threshold),
    with the normalized shingle sets available as ``s(doc_id, items)``.
    Mirrors operators/dedup.py:minhash_near_dups in md5_32 mode exactly:
    slot k is hex window k%4 of digest md5("k//4:" || shingle) (four
    32-bit slots per digest), band b's bucket is md5 of the comma-joined
    decimal slot values, buckets outside [2, max_bucket] are dropped.
    Shared by the dedup_minhash_lsh oracle, (chained into a recursive
    reach CTE) dedup_cluster_canonical_lsh, and — at shingle_n=1/bands=8
    on the eval slice — dedup_lsh_eval's truth-vs-candidates P/R."""
    slots = ",\n        ".join(
        "list_min(list_transform(items, x ->"
        f" cast(('0x' || substr(md5('{k // 4}:' || x), {8 * (k % 4) + 1}, 8)) AS bigint)))"
        for k in range(num_hashes)
    )
    rpb = num_hashes // bands
    band_list = ", ".join(str(b) for b in range(bands))
    return f"""
    t AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS tk
      FROM documents WHERE {where}),
    s AS (
      SELECT doc_id, list_distinct(
        list_transform(range(1, greatest(len(tk) - {shingle_n}, 0) + 2),
                       i -> array_to_string(list_slice(tk, i, i + {shingle_n - 1}), ' '))
      ) AS items FROM t),
    sig AS (
      SELECT doc_id, items, [
        {slots}
      ] AS sg FROM s),
    bb AS (
      SELECT doc_id, b.band,
             md5(array_to_string(
               list_transform(list_slice(sg, b.band * {rpb} + 1, b.band * {rpb} + {rpb}),
                              v -> cast(v AS varchar)), ',')) AS bucket
      FROM sig, (SELECT unnest([{band_list}]) AS band) b),
    ok_buckets AS (
      SELECT band, bucket FROM bb
      GROUP BY band, bucket HAVING count(*) BETWEEN 2 AND {max_bucket}),
    e AS (SELECT bb.doc_id, bb.band, bb.bucket
          FROM bb JOIN ok_buckets USING (band, bucket)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM e a JOIN e b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    j AS (
      SELECT id_a, id_b,
             floor(cast(len(list_intersect(sa.items, sb.items)) AS double)
                   / len(list_distinct(sa.items || sb.items))
                   * 1000000 + 0.5) / 1000000 AS jaccard
      FROM cand
      JOIN s sa ON sa.doc_id = cand.id_a
      JOIN s sb ON sb.doc_id = cand.id_b),
    lsh_pairs AS (SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= {threshold})
"""


_MD5_LSH_PAIR_CTES = _md5_lsh_pair_ctes()


@query(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, list_distinct(string_split({_NORM}, ' ')) AS tokens
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b
        ON a.doc_id < b.doc_id AND a.lang = b.lang
      WHERE floor(cast(len(list_intersect(a.tokens, b.tokens)) AS double)
                  / len(list_distinct(list_concat(a.tokens, b.tokens))) * 1000000 + 0.5) / 1000000 >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    )
    SELECT node AS doc_id, min(r) AS canonical_id FROM reach GROUP BY node
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 completion, ORACLE TWIN: near-dup pairs → connected components →
    one canonical doc per cluster (component-minimum id).  Iterative
    min-label propagation on Spark (bounded by component diameter,
    lineage-truncated per round); the DuckDB oracle computes the same
    fixpoint with a recursive CTE.

    The pair stage here is the exact language-blocked self-join — QUADRATIC
    in block size, kept only because it is SQL-expressible and therefore
    hash-checkable.  The production path at 100 TB is
    ``dedup_cluster_canonical_lsh`` (O(n·bands) MinHash-LSH candidates)."""
    docs = _docs(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(docs, "text", "doc_id", block_col="lang", threshold=0.5)
    return dd.cluster_canonical(docs, pairs, "doc_id")


@query(
    "dedup_cluster_canonical_lsh",
    oracle=f"""
    WITH RECURSIVE {_MD5_LSH_PAIR_CTES},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM lsh_pairs
      UNION SELECT id_b, id_a FROM lsh_pairs
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    )
    SELECT node AS doc_id, min(r) AS canonical_id FROM reach GROUP BY node
    """,
)
def dedup_cluster_canonical_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 at scale — the DEFAULT near-dup clustering path: MinHash-LSH
    candidate pairs (O(n·bands) bucket join) → exact-Jaccard verify on
    candidates only → connected components → canonical id.

    The exact-Jaccard variant (:func:`dedup_cluster_canonical`) self-joins
    within a language block, which is quadratic in block size — at 100 TB a
    single language is most of the corpus, so that form is the ORACLE TWIN
    only, never the scale path.  Since late r7 THIS path is oracle-checked
    too: the declared query runs the engine-portable md5_32 LSH mode, and
    the oracle chains the shared md5-LSH pair CTEs into the same recursive
    reach fixpoint the exact twin uses.  Cluster-level agreement of the
    production xxhash64 mode vs the exact form stays asserted in
    tests/test_extensions.py::test_lsh_clustering_matches_exact."""
    docs = _docs(spark, sf_dir)
    pairs = dd.minhash_near_dups(
        docs, "text", "doc_id", num_hashes=16, bands=4, threshold=0.5,
        max_bucket_size=1000, hash_fn="md5_32",
    )
    return dd.cluster_canonical(docs, pairs, "doc_id")


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_MD5_LSH_PAIR_CTES}
    SELECT id_a, id_b, jaccard FROM lsh_pairs
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join→
    verify).  The declared query runs the engine-portable md5_32 mode so
    the ENTIRE pipeline — signatures, banding, bucket cap, candidate pairs,
    exact-Jaccard verify — is DuckDB-oracle-checked (upgraded from
    rows-only in r7); production callers keep the default xxhash64 mode,
    whose P/R vs exact-Jaccard truth is pinned by dedup_lsh_eval and
    tests/test_extensions.py."""
    return dd.minhash_near_dups(
        _docs(spark, sf_dir), "text", "doc_id", num_hashes=16, bands=4,
        threshold=0.5, max_bucket_size=1000, hash_fn="md5_32",
    )


#: SimHash oracle: one +1/-1 vote sum per bit over md5-derived 32-bit token
#: hashes (the winnowing-fingerprint portability trick), sign → bit.
_SIMHASH_VOTES = ",\n      ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(32)
)
_SIMHASH_RECOMBINE = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN (cast(1 AS bigint) << {b}) ELSE 0 END)"
    for b in range(32)
)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split({_NORM}, ' ')) AS tk
      FROM documents WHERE text IS NOT NULL),
    e AS (
      SELECT doc_id, cast(('0x' || substr(md5(tok), 1, 8)) AS bigint) AS h
      FROM (SELECT doc_id, unnest(tk) AS tok FROM t)),
    v AS (
      SELECT doc_id,
      {_SIMHASH_VOTES}
      FROM e GROUP BY doc_id)
    SELECT doc_id, {_SIMHASH_RECOMBINE} AS simhash FROM v
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 variant: SimHash signatures (JVM-side bit voting; zero shuffle).
    This declared query runs the md5_32 engine-portable mode so the
    signature itself is DuckDB-oracle-checked bit for bit (upgraded from
    rows-only in r7 — the sketch_quantile_rollup precedent); production
    callers keep the default xxhash64/64-bit mode, pinned equivalent in
    Hamming behavior by tests/test_extensions.py."""
    return dd.simhash(_docs(spark, sf_dir), "text", "doc_id", bits=32, hash_fn="md5_32")


@query(
    "similarity_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.query_id, c.vec_id AS cand_id,
        floor(
          cast(list_sum(list_transform(q.qv, (x, i) -> cast(cast(x AS double) * cast(c.embedding[i] AS double) AS decimal(28,12)))) AS double)
          / (sqrt(cast(list_sum(list_transform(q.qv, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double))
             * sqrt(cast(list_sum(list_transform(c.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)))
          * 1000000 + 0.5) / 1000000 AS cosine
      FROM q, embeddings c WHERE q.query_id != c.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
      FROM pairs WHERE cosine IS NOT NULL
    )
    SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= 3
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 exact ANN baseline: brute-force cosine top-3 for query vectors
    (vec_id < 10) against the corpus; decimal-accumulated dot products keep
    the score hash partition-order-insensitive."""
    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=3)


@query(
    "similarity_bruteforce_scale_probe",
    oracle="""
    WITH amp AS (
      SELECT e.vec_id, e.embedding FROM embeddings e, range(10) i
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    pairs AS (
      SELECT q.query_id, c.vec_id AS cand_id,
        CASE WHEN
          sqrt(cast(list_sum(list_transform(q.qv, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double))
          * sqrt(cast(list_sum(list_transform(c.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)) > 0
        THEN floor(
          cast(list_sum(list_transform(q.qv, (x, i) -> cast(cast(x AS double) * cast(c.embedding[i] AS double) AS decimal(28,12)))) AS double)
          / (sqrt(cast(list_sum(list_transform(q.qv, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double))
             * sqrt(cast(list_sum(list_transform(c.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)))
          * 1000000 + 0.5) / 1000000 END AS cosine
      FROM q, amp c WHERE q.query_id != c.vec_id
    )
    SELECT cast(count(cosine) AS bigint) AS n_pairs,
           CASE WHEN count(cosine) > 0 THEN
             floor(cast(sum(cast(cosine AS decimal(28,12))) AS double) * 1000000 + 0.5) / 1000000
           END AS sum_cosine
    FROM pairs WHERE cosine IS NOT NULL
    """,
)
def similarity_bruteforce_scale_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPU-scaling probe over an sf1-scale IN-PLAN sample (r10 verdict item
    2: "include CPU-bound queries or an sf1 sample in the scaling-visible
    set").  After the r11 CPU cuts, every query's sf0.1 wall is latency-
    bound — quiet back-to-back c8/c32 ratios all read 0.8-1.1 — so the
    driver's low-core scaling measurement had no compute-bound row left to
    see.  This probe replicates the embeddings 10x IN THE PLAN (cross join
    with range(10) — recomputed from the parquet input on every execution,
    nothing staged or cached) and runs the exact brute-force decimal
    cosine workload over queries (vec_id < 20) x the amplified corpus:
    ~40M decimal fold terms of genuinely parallel CPU, fully oracle-
    checked down to the decimal-exact global sum.  Output is one
    (n_pairs, sum_cosine) row."""
    apply_runtime_conf(spark)
    from ..sources.star import ensure_parallelism

    emb = star.table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    amp = ensure_parallelism(
        emb.crossJoin(spark.range(10).select(F.lit(1).alias("_copy"))).drop("_copy")
    )
    scored = sim.brute_force_scores(amp, q)
    return scored.agg(
        F.count(F.col("cosine")).cast("long").alias("n_pairs"),
        F.when(
            F.count(F.col("cosine")) > 0,
            F.floor(
                F.sum(F.col("cosine").cast("decimal(28,12)")).cast("double") * 1000000.0
                + 0.5
            )
            / 1000000.0,
        ).alias("sum_cosine"),
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        floor(
          cast(list_sum(list_transform(a.embedding, (x, i) -> cast(cast(x AS double) * cast(b.embedding[i] AS double) AS decimal(28,12)))) AS double)
          / (sqrt(cast(list_sum(list_transform(a.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double))
             * sqrt(cast(list_sum(list_transform(b.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)))
          * 1000000 + 0.5) / 1000000 AS cosine
      FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 embedding-cosine near-dup: pairs above a high cosine threshold are
    duplicate candidates (the semantic-dedup stage of an LLM pipeline).
    Exact all-pairs on a bounded subset here; the scale path reuses the
    LSH/IVF bucketing from similarity.py so only same-bucket pairs score."""
    apply_runtime_conf(spark)
    from ..operators.similarity import _dot_dec, _with_norm
    from ..sources.star import stage_barrier

    emb = star.table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = _with_norm(emb, "id_a", "vec_a", "vec_id", "embedding")
    b = _with_norm(emb, "id_b", "vec_b", "vec_id", "embedding")
    dot = _dot_dec(F.col("vec_a"), F.col("vec_b")).cast("double")
    mult = 1000000.0
    # cosine computed ONCE behind a fence: filtering on the alias let the
    # threshold push into the join CONDITION with the full 64-wide decimal
    # fold substituted in, so every pair paid the fold in the interpreted
    # condition and survivors paid it again in the project (the r10 ANN
    # norm-guard class; plans/r11/dedup_embedding_cosine_{before,after}).
    scored = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        (F.floor(dot / (F.col("vec_a_norm") * F.col("vec_b_norm")) * mult + 0.5) / mult).alias(
            "cosine"
        ),
    )
    return stage_barrier(scored, "cosine").filter(F.col("cosine") >= 0.35)


@query(
    "dedup_semantic_clusters",
    oracle="""
    WITH RECURSIVE sub AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 400
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sub a JOIN sub b ON a.vec_id < b.vec_id AND a.label = b.label
      WHERE floor(
          cast(list_sum(list_transform(a.embedding, (x, i) -> cast(cast(x AS double) * cast(b.embedding[i] AS double) AS decimal(28,12)))) AS double)
          / (sqrt(cast(list_sum(list_transform(a.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double))
             * sqrt(cast(list_sum(list_transform(b.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)))
          * 1000000 + 0.5) / 1000000 >= 0.35
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM sub
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    )
    SELECT node AS vec_id, min(r) AS canonical_id, (min(r) = node) AS is_kept
    FROM reach GROUP BY node
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25 semantic dedup, ORACLE TWIN: attribute-blocked (label) cosine
    pairs ≥ 0.35 → connected components → keep the component-minimum vec_id,
    on a bounded 400-vector slice (attribute blocks grow linearly with the
    corpus, so the slice bound is deliberate — the scale path is
    ``dedup_semantic_centroids``, whose k-means blocking keeps block size
    controlled by n_centroids).  DuckDB computes the same CC fixpoint with a
    recursive CTE."""
    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    return sim.semantic_dedup(emb, threshold=0.35, block_col="label")


@query(
    "dedup_semantic_centroids",
    # The seed-vector quantizer mode is exactly recomputable: 45 centers by
    # md5_32 rank, float-SEQUENTIAL block assignment and pair dots (Spark's
    # aggregate fold and DuckDB's list_reduce are both left-to-right over
    # row-local arrays → bit-identical doubles, at none of the decimal
    # fold's cost; argmin tie → lower centroid index), guarded cosine ≥
    # 0.35 within blocks only (norms stay decimal — one cheap per-vector
    # fold), then the same recursive-CTE CC fixpoint as
    # dedup_semantic_clusters seeded from EVERY input id (null/ragged
    # vectors stay singletons).
    oracle="""
    WITH RECURSIVE seedrank AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY cast(('0x' || substr(md5('42:' || cast(vec_id AS varchar)), 1, 8)) AS bigint), vec_id
             ) AS rn
      FROM embeddings WHERE embedding IS NOT NULL),
    kk AS (SELECT greatest(8, cast(ceil(sqrt(count(*))) AS bigint)) AS k FROM embeddings),
    centers AS (SELECT rn - 1 AS cid, embedding AS cv FROM seedrank, kk WHERE rn <= kk.k),
    dim AS (SELECT len(cv) AS d FROM centers WHERE cid = 0),
    cand AS (
      SELECT vec_id, embedding,
             sqrt(cast(list_sum(list_transform(embedding, x ->
               cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)) AS nrm
      FROM embeddings, dim
      WHERE embedding IS NOT NULL AND len(embedding) = dim.d),
    adist AS (
      SELECT c.vec_id, ct.cid,
             list_reduce(list_transform(c.embedding, (x, i) ->
               (cast(x AS double) - cast(ct.cv[i] AS double))
               * (cast(x AS double) - cast(ct.cv[i] AS double))), (a, b) -> a + b) AS d
      FROM cand c CROSS JOIN centers ct),
    blocked AS (
      SELECT c.vec_id, c.embedding, c.nrm, a.cid
      FROM cand c JOIN (
        SELECT vec_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
          FROM adist) WHERE rr = 1) a ON a.vec_id = c.vec_id),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM blocked a JOIN blocked b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE (CASE WHEN a.nrm * b.nrm > 0 THEN
        floor(list_reduce(list_transform(a.embedding, (x, i) ->
          cast(x AS double) * cast(b.embedding[i] AS double)), (p, q) -> p + q)
          / (a.nrm * b.nrm) * 1000000 + 0.5) / 1000000 END) >= 0.35),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node)
    SELECT node AS vec_id, min(r) AS canonical_id, (min(r) = node) AS is_kept
    FROM reach GROUP BY node
    """,
)
def dedup_semantic_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25 semantic dedup, SCALE PATH (SemDeDup shape): block on a coarse
    quantizer — baked-literal shuffle-free assignment (same machinery as
    IVF ANN) — then within-block cosine pairs → connected components →
    canonical per cluster.  Block size is CONTROLLED: since r8 the
    declared query derives n_centroids = max(8, ceil(sqrt(n))) from the
    corpus itself (one count job; the oracle recomputes the same k), so
    the within-block quadratic stays bounded at ANY scale instead of
    being tuned to one fixture — 23 at sf0.01, 45 at sf0.1, 142 on the
    10x fixture, where the sqrt-scaled seed mode measured 23.5 s vs 60 s
    for the fixture-pinned width (and 133 s for Lloyd's at the same
    width: training cost grows with k, seed centers are one TakeOrdered
    collect regardless).

    The declared query runs the engine-portable mode (seed-vector centers
    by md5_32 rank, float-SEQUENTIAL assignment and pair dots — Spark's
    row-local aggregate fold and DuckDB's list_reduce produce bit-identical
    doubles, so portability costs no BigDecimal time), so blocking, edges,
    and the CC fixpoint are DuckDB-oracle-checked end to end (upgraded
    from rows-only in r8's second pass — it also drops the bounded Lloyd's
    sample collect from the declared plan entirely).  The production
    k-means mode (numpy Lloyd's + Arrow-vectorized assignment) keeps its
    cluster-agreement and invariant pins in tests/test_extensions.py."""
    import math

    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    # sqrt-rule quantizer width, recomputed by the oracle's kk CTE; an
    # empty corpus short-circuits to the seed trainer's loud ValueError
    k = max(8, math.ceil(math.sqrt(emb.count() or 1)))
    centers = sim.ivf_seed_centers(emb, n_centroids=k, seed=42)
    return sim.semantic_dedup(
        emb, threshold=0.35, centers=centers, exact_assign="seq", exact_dots=False
    )


@query(
    "docs_join_embeddings",
    oracle="""
    SELECT d.lang, count(*) AS n_docs,
           floor(cast(sum(cast(e.label AS decimal(28,4))) AS double) / count(*) * 100.0 + 0.5) / 100.0 AS avg_label,
           min(d.n_chars) AS min_chars, max(d.n_chars) AS max_chars
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
)
def docs_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-adjacent: text table joined to its embedding table on the
    shared id (the standard document↔vector layout) with per-language stats."""
    apply_runtime_conf(spark)
    d = star.table(spark, sf_dir, "documents")
    e = star.table(spark, sf_dir, "embeddings")
    s = F.sum(F.col("label").cast("decimal(28,4)")).cast("double")
    n = F.count(F.lit(1))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            n.alias("n_docs"),
            (F.floor(s / n * 100.0 + 0.5) / 100.0).alias("avg_label"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "similarity_ivf_topk",
    # The seed-vector IVF mode is exactly recomputable in SQL: centers are
    # the 8 embeddings with the smallest (md5_32("42:" || vec_id), vec_id),
    # assignment is the decimal-exact full squared distance (argmin tie →
    # lower centroid index), queries probe their 3 nearest lists, and the
    # cosine/rank tail is the similarity_bruteforce_topk fragment restricted
    # to probed-list pairs.
    oracle="""
    WITH seedrank AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY cast(('0x' || substr(md5('42:' || cast(vec_id AS varchar)), 1, 8)) AS bigint), vec_id
             ) AS rn
      FROM embeddings WHERE embedding IS NOT NULL),
    centers AS (SELECT rn - 1 AS cid, embedding AS cv FROM seedrank WHERE rn <= 8),
    dim AS (SELECT len(cv) AS d FROM centers WHERE cid = 0),
    cand AS (
      SELECT vec_id, embedding FROM embeddings, dim
      WHERE embedding IS NOT NULL AND len(embedding) = dim.d),
    adist AS (
      SELECT c.vec_id, ct.cid,
             list_sum(list_transform(c.embedding, (x, i) ->
               cast((cast(x AS double) - cast(ct.cv[i] AS double))
                    * (cast(x AS double) - cast(ct.cv[i] AS double)) AS decimal(28,12)))) AS d
      FROM cand c CROSS JOIN centers ct),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
        FROM adist) WHERE rr = 1),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
        FROM adist WHERE vec_id < 10) WHERE rr <= 3),
    norms AS (
      SELECT vec_id, sqrt(cast(list_sum(list_transform(embedding, x ->
               cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)) AS nrm
      FROM cand),
    pairs AS (
      SELECT p.query_id, a.vec_id AS cand_id,
        CASE WHEN nq.nrm * nc.nrm > 0 THEN
          floor(cast(list_sum(list_transform(eq.embedding, (x, i) ->
                  cast(cast(x AS double) * cast(ec.embedding[i] AS double) AS decimal(28,12)))) AS double)
                / (nq.nrm * nc.nrm) * 1000000 + 0.5) / 1000000 END AS cosine
      FROM probes p
      JOIN assigned a ON a.cid = p.cid AND a.vec_id != p.query_id
      JOIN cand eq ON eq.vec_id = p.query_id
      JOIN cand ec ON ec.vec_id = a.vec_id
      JOIN norms nq ON nq.vec_id = p.query_id
      JOIN norms nc ON nc.vec_id = a.vec_id),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
      FROM pairs WHERE cosine IS NOT NULL)
    SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= 3
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 IVF variant: coarse quantizer → inverted lists by centroid →
    each query probes its n_probe nearest lists only (the partition-pruned
    ANN layout at scale — at 100 TB the corpus is WRITTEN partitioned by
    centroid and a query touches n_probe/n_centroids of it).

    This declared query runs the engine-portable seed-vector quantizer
    (ivf_seed_centers: centers drawn by md5_32 rank — the zero-refinement
    member of the IVF family) with decimal-exact assignment distances, so
    the ENTIRE pipeline — center selection, inverted lists, multi-probe,
    cosine scoring, ranks — is DuckDB-oracle-checked (upgraded from
    rows-only in r8).  The production quantizer keeps Lloyd's refinement
    (train_ivf_centroids, numpy-side → rows-only), whose recall vs this
    seeded baseline and vs brute force is pinned in
    tests/test_extensions.py::test_ivf_seed_centers_portable and the
    ann-eval floors."""
    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    centers = sim.ivf_seed_centers(emb, n_centroids=8, seed=42)
    return sim.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=3, n_centroids=8, n_probe=3,
        centers=centers, exact_assign=True,
    )


@query(
    "similarity_lsh_topk",
    # The md5_32 hyperplane family is exactly recomputable in SQL: component
    # j of plane p is the integer md5_32("hp{p}:{j}") % 1000 - 500, the sign
    # dot is decimal-accumulated (order-insensitive, engine-exact), bucket
    # bits recombine per table (p // planes), and the cosine/rank tail is the
    # similarity_bruteforce_topk fragment restricted to same-bucket pairs.
    oracle=f"""
    WITH planes AS (
      SELECT p.range AS p,
             list(cast(cast(('0x' || substr(md5('hp' || p.range || ':' || j.range), 1, 8)) AS bigint) % 1000 - 500 AS double) ORDER BY j.range) AS cv
      FROM range(16) p, range({_ANN_DIM}) j GROUP BY p.range),
    dots AS (
      SELECT e.vec_id, pl.p,
             list_sum(list_transform(e.embedding, (x, i) -> cast(cast(x AS double) * pl.cv[i] AS decimal(28,12)))) AS dot
      FROM embeddings e CROSS JOIN planes pl),
    sigs AS (
      SELECT vec_id, cast(p // 4 AS int) AS tbl,
             sum(CASE WHEN dot >= 0 THEN cast(1 AS bigint) << cast(p % 4 AS int) ELSE cast(0 AS bigint) END) AS bits
      FROM dots GROUP BY 1, 2),
    norms AS (
      SELECT vec_id, sqrt(cast(list_sum(list_transform(embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)) AS nrm
      FROM embeddings),
    pairs AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id,
        CASE WHEN nq.nrm * nc.nrm > 0 THEN
          floor(cast(list_sum(list_transform(eq.embedding, (x, i) -> cast(cast(x AS double) * cast(ec.embedding[i] AS double) AS decimal(28,12)))) AS double)
                / (nq.nrm * nc.nrm) * 1000000 + 0.5) / 1000000 END AS cosine
      FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.bits = c.bits AND q.vec_id != c.vec_id
      JOIN embeddings eq ON eq.vec_id = q.vec_id
      JOIN embeddings ec ON ec.vec_id = c.vec_id
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      WHERE q.vec_id < 10),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
      FROM pairs WHERE cosine IS NOT NULL)
    SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= 3
    """,
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: hyperplane-LSH bucketed top-k.  Recall-vs-cost is
    traded by plane count (bucket granularity) AND table count (multi-table
    LSH: candidates unioned over independent hyperplane sets — miss rate
    falls exponentially in tables at linear bucket-join cost).

    This declared query runs the md5_32 engine-portable hyperplane family so
    buckets, candidate pairs, cosines AND ranks are DuckDB-oracle-checked
    end-to-end (upgraded from rows-only in r8 — the dedup_minhash_lsh
    precedent).  Production callers keep the default xxhash64 family, whose
    recall curve (0.28 → 0.98 over 1 → 8 tables on the fixture) is measured
    by similarity_ann_eval and pinned in tests along with a md5/xxhash
    mode-agreement check."""
    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    return sim.lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=3,
        planes=4,
        dim=_ANN_DIM,
        tables=4,
        hash_fn="md5_32",
    )


@query(
    "text_language_id",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS tokens FROM documents),
    hits AS (
      SELECT doc_id,
        len(list_filter(tokens, t -> list_contains(['the','and','of','to','in','is','a','for'], t))) AS hits_en,
        len(list_filter(tokens, t -> list_contains(['der','die','das','und','ist','ein','zu','den'], t))) AS hits_de,
        len(list_filter(tokens, t -> list_contains(['le','la','les','et','est','un','une','des'], t))) AS hits_fr
      FROM toks)
    SELECT doc_id, hits_en, hits_de, hits_fr,
           CASE WHEN greatest(hits_en, hits_de, hits_fr) = 0 THEN 'unknown'
                WHEN hits_en = greatest(hits_en, hits_de, hits_fr) THEN 'en'
                WHEN hits_de = greatest(hits_en, hits_de, hits_fr) THEN 'de'
                ELSE 'fr' END AS lang_guess
    FROM hits
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: stopword-hit language heuristic with argmax guess."""
    return tx.language_scores(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, string_split({_NORM}, ' ') AS tokens,
             length(text) AS n_chars,
             len(string_split({_NORM}, ' ')) AS n_tokens,
             length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS n_punct,
             len(list_filter(string_split({_NORM}, ' '),
                 t -> list_contains(['the','and','of','to','in','is','a','for'], t))) AS n_stop
      FROM documents)
    SELECT doc_id, n_chars, n_tokens,
           floor(cast(n_chars - n_tokens + 1 AS double) / n_tokens * 1000000.0 + 0.5) / 1000000.0 AS avg_word_len,
           floor(cast(n_punct AS double) / n_chars * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio,
           floor(cast(n_stop AS double) / n_tokens * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: cheap quality pre-filters (length / punctuation / stopword ratios)."""
    return tx.quality_scores(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS bpe_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: whitespace + BPE-ish regex token counts."""
    return tx.token_counts(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split({_NORM}, ' '))), ' ')) AS fingerprint,
           sha256(array_to_string(list_sort(list_distinct(string_split({_NORM}, ' '))), ' ')) AS fingerprint_sha
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: order-independent content fingerprint (md5/sha256 of the sorted
    vocabulary)."""
    return tx.fingerprint(_docs(spark, sf_dir), "text", "doc_id")


@query("multimodal_decode")
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: binary carrier → Arrow-batched mapInPandas decode (deterministic
    fake kernel — container ships no codecs; plumbing is real).  Rows-only."""
    docs = _docs(spark, sf_dir)
    return mm.decode_media(mm.attach_binary(docs, "text", "doc_id"))


@query("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: binary carrier → Arrow-batched mapInPandas feature extraction
    (deterministic fake encoder; CLIP-style in production).  Rows-only —
    same rationale as multimodal_decode; determinism + batch shape pinned
    in tests/test_extensions.py."""
    docs = _docs(spark, sf_dir)
    return mm.extract_features(mm.attach_binary(docs, "text", "doc_id"), dim=8)


@query(
    "text_quality_cutoff",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, len(string_split({_NORM}, ' ')) AS n_tokens FROM documents),
    thr AS (SELECT lang, quantile_cont(n_tokens, 0.25) AS thr FROM t GROUP BY lang)
    SELECT t.doc_id, t.lang, t.n_tokens
    FROM t JOIN thr USING (lang) WHERE t.n_tokens > thr.thr
    """,
)
def text_quality_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality gate: drop documents at or below their language's 25th
    percentile of token count — the per-stratum quantile-cutoff pattern a
    training-data pipeline uses for quality filtering.  The per-lang
    threshold table is tiny → broadcast back; both engines interpolate
    continuous quantiles identically."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(dd.normalized_text(F.col("text")), " ")).alias("n_tokens"),
    )
    thr = toks.groupBy("lang").agg(
        F.percentile("n_tokens", F.lit(0.25)).alias("thr")
    )
    return (
        toks.join(F.broadcast(thr), "lang")
        .filter(F.col("n_tokens") > F.col("thr"))
        .select("doc_id", "lang", "n_tokens")
    )


@query(
    "text_redact_pii",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '(\+\d{1,3}[-. ]?)?\(?\b\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b', '<PHONE>', 'g'),
               '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             '\b\d{13,16}\b', '<CARD>', 'g') AS redacted_text,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '(\+\d{1,3}[-. ]?)?\(?\b\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b')) AS n_phone,
           len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text, '\b\d{13,16}\b')) AS n_card
    FROM documents
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline compliance gate: regex-redact emails / phones /
    IPv4s / card-like numbers with per-class hit counts (audit trail).
    Row-local chained regexp_replace — shuffle-free at any scale; redaction
    behavior on PII-bearing text is pinned in tests/test_extensions.py."""
    return tx.redact_pii(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "text_repetition_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, toks,
             list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
                            i -> array_to_string(toks[i + 1 : i + 3], ' ')) AS grams
      FROM t)
    SELECT doc_id,
           len(toks) AS n_tokens,
           floor(cast(len(toks) - len(list_distinct(toks)) AS double) / len(toks) * 1000000.0 + 0.5) / 1000000.0
             AS dup_token_ratio,
           floor(cast(len(grams) - len(list_distinct(grams)) AS double) / len(grams) * 1000000.0 + 0.5) / 1000000.0
             AS dup_3gram_ratio
    FROM g
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratios (duplicate tokens / duplicate word
    3-grams) — the boilerplate/looping-text quality signal every corpus
    pipeline computes.  Pure per-row array expressions: no explode, no
    shuffle."""
    return tx.repetition_scores(_docs(spark, sf_dir), "text", "doc_id", n=3)


@query(
    "sample_stratified_systematic",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
    WHERE (rn - 1) % 10 = 0
    """,
)
def sample_stratified_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: every 10th document per language in
    doc_id order — reproducible data mixing without RNG state.  At 100 TB
    the order-free equivalent is hash-mod sampling
    (``pmod(xxhash64(doc_id), 10) = 0``): same statistical effect, no
    per-stratum sort; this declared form keeps a total order so both engines
    agree row-for-row."""
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % 10 == 0)
        .select("doc_id", "lang")
    )


@query(
    "text_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start FROM t)
    SELECT doc_id,
           cast(start / 40 AS int) AS chunk_idx,
           array_to_string(toks[start + 1 : start + 50], ' ') AS chunk_text,
           least(50, len(toks) - start) AS n_tokens
    FROM s
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline chunking: 50-token windows with 10-token overlap
    (stride 40) per document — posexplode over computed starts, no shuffle
    (operators/text.py:chunk_documents)."""
    return tx.chunk_documents(
        _docs(spark, sf_dir), "text", "doc_id", chunk_size=50, overlap=10
    )


@query(
    "text_chunk_content_defined",
    # The rolling boundary hash is exactly recomputable: per-token md5_32
    # hashes, boundary after 0-based token i (window tokens i-2..i, 1-based
    # th[(i-1)..(i+1)]) iff th[i-1]*961 + th[i]*31 + th[i+1] ≡ 0 (mod 16);
    # cuts prepend 0, spans run cut→next-cut (or n), long spans hard-split
    # every 64 tokens.
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents WHERE text IS NOT NULL),
    hs AS (
      SELECT doc_id, tk, len(tk) AS n,
             list_transform(tk, s -> cast(('0x' || substr(md5(s), 1, 8)) AS bigint)) AS th
      FROM t),
    b AS (
      SELECT doc_id, tk, n,
        list_prepend(cast(0 AS bigint),
          list_transform(
            list_filter(range(2, n - 1), i ->
              (th[i - 1] * 961 + th[i] * 31 + th[i + 1]) % 16 = 0),
            i -> i + 1)) AS cuts
      FROM hs),
    s AS (SELECT doc_id, tk, n, cuts, u.idx FROM b, unnest(range(len(cuts))) AS u(idx)),
    spans AS (SELECT doc_id, tk, cuts[idx + 1] AS st,
                     CASE WHEN idx + 1 < len(cuts) THEN cuts[idx + 2] ELSE n END AS en
              FROM s),
    subs AS (SELECT doc_id, tk, v.s AS st, least(en, v.s + 64) AS en
             FROM spans, unnest(range(st, en, 64)) AS v(s))
    SELECT doc_id,
           cast(row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1 AS int) AS chunk_idx,
           array_to_string(tk[st + 1 : en], ' ') AS chunk_text,
           cast(en - st AS int) AS n_tokens
    FROM subs
    """,
)
def text_chunk_content_defined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X90 content-defined chunking (FastCDC/rsync idea at token level):
    boundaries are a function of local content (Gear-style weighted sum of
    the trailing 3 per-token md5_32 hashes ≡ 0 mod 16, expected chunk ≈ 16
    tokens, hard cap 64), so an insertion re-aligns later chunks instead of
    shifting them — the dedup-stable chunking a re-crawl pipeline needs
    before chunk-level exact/near dedup.  Row-local array expressions
    end-to-end, ONE md5 per token then integer ops per boundary test: no
    UDF, no shuffle (operators/text.py:content_defined_chunks)."""
    return tx.content_defined_chunks(
        _docs(spark, sf_dir), "text", "doc_id", window=3, mask=16, max_tokens=64
    )


@query(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH RECURSIVE norm AS (
      SELECT doc_id, lang, {_NORM} AS ntext FROM documents),
    keep1 AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY sha256(ntext)),
    d1 AS (SELECT n.* FROM norm n JOIN keep1 USING (doc_id)),
    toks AS (SELECT doc_id, lang, list_distinct(string_split(ntext, ' ')) AS tokens FROM d1),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id AND a.lang = b.lang
      WHERE floor(cast(len(list_intersect(a.tokens, b.tokens)) AS double)
                  / len(list_distinct(list_concat(a.tokens, b.tokens))) * 1000000 + 0.5) / 1000000 >= 0.8),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM d1
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node),
    canon AS (SELECT node AS doc_id, min(r) AS canonical FROM reach GROUP BY node),
    d2 AS (SELECT d1.* FROM d1 JOIN canon USING (doc_id) WHERE d1.doc_id = canon.canonical),
    tok2 AS (SELECT doc_id, lang, string_split(ntext, ' ') AS toks FROM d2),
    thr AS (SELECT lang, quantile_cont(len(toks), 0.25) AS thr FROM tok2 GROUP BY lang),
    d3 AS (SELECT tok2.* FROM tok2 JOIN thr USING (lang) WHERE len(toks) > thr.thr),
    s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start FROM d3)
    SELECT doc_id, cast(start / 40 AS int) AS chunk_idx,
           array_to_string(toks[start + 1 : start + 50], ' ') AS chunk_text,
           least(50, len(toks) - start) AS n_tokens
    FROM s
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation as ONE composed plan: exact dedup (keep
    lowest id per normalized hash) → near-dup clustering (keep canonical
    docs only) → per-language quality cutoff (> p25 token count among
    survivors) → 50/10 chunking.  Each stage is the already-verified
    operator; this query pins that they compose — the "switch your whole
    pipeline to this engine" demonstration."""
    docs = _docs(spark, sf_dir)
    # 1. exact dedup survivors
    keep = dd.exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    d1 = docs.join(keep, "doc_id", "left_semi")
    # 2. near-dup clustering → canonical docs only
    pairs = dd.ngram_jaccard_pairs(d1, "text", "doc_id", block_col="lang", threshold=0.8)
    canon = dd.cluster_canonical(d1, pairs, "doc_id")
    d2 = d1.join(
        canon.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    # 3. per-language quality cutoff on survivors
    toks = d2.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split(dd.normalized_text(F.col("text")), " ")).alias("n_toks"),
    )
    thr = toks.groupBy("lang").agg(F.percentile("n_toks", F.lit(0.25)).alias("thr"))
    d3 = (
        toks.join(F.broadcast(thr), "lang")
        .filter(F.col("n_toks") > F.col("thr"))
        .select("doc_id", "text")
    )
    # 4. chunk for training
    return tx.chunk_documents(d3, "text", "doc_id", chunk_size=50, overlap=10)


@query(
    "dedup_passages",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 10)) AS start FROM t),
    p AS (SELECT doc_id, cast(start / 10 AS int) AS chunk_idx,
                 array_to_string(toks[start + 1 : start + 10], ' ') AS passage
          FROM s),
    r AS (SELECT *, row_number() OVER (PARTITION BY passage ORDER BY doc_id, chunk_idx) AS rn,
                 count(*) OVER (PARTITION BY doc_id) AS n_passages
          FROM p)
    SELECT doc_id,
           string_agg(passage, ' ' ORDER BY chunk_idx) AS clean_text,
           count(*) AS n_kept,
           any_value(n_passages) - count(*) AS n_dropped
    FROM r WHERE rn = 1 GROUP BY doc_id
    """,
)
def dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 passage-level exact dedup (the C4-style repeated-paragraph pass):
    10-token passages, globally first-wins by (doc_id, passage index),
    surviving passages reassembled per document.  Two narrow-key shuffles
    (passage md5, then doc_id) — see operators/dedup.py:passage_dedup for
    the 100 TB shape."""
    return dd.passage_dedup(_docs(spark, sf_dir), "text", "doc_id", passage_tokens=10)


@query(
    "dedup_against_corpus",
    oracle=f"""
    WITH inc AS (SELECT doc_id, {_NORM} AS ntext FROM documents WHERE doc_id % 2 = 1),
    corp AS (SELECT doc_id, {_NORM} AS ntext FROM documents WHERE doc_id % 2 = 0),
    fresh AS (SELECT i.doc_id, i.ntext FROM inc i
              WHERE NOT EXISTS (SELECT 1 FROM corp c WHERE c.ntext = i.ntext)),
    inc_sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(0, greatest(len(string_split(ntext, ' ')) - 3, 0) + 1),
               i -> array_to_string((string_split(ntext, ' '))[i + 1 : i + 3], ' ')))) AS sh
      FROM fresh),
    corp_sh AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(0, greatest(len(string_split(ntext, ' ')) - 3, 0) + 1),
               i -> array_to_string((string_split(ntext, ' '))[i + 1 : i + 3], ' ')))) AS sh
      FROM corp)
    SELECT i.doc_id,
           floor(cast(sum(CASE WHEN c.sh IS NOT NULL THEN 1 ELSE 0 END) AS double)
                 / count(*) * 1000000 + 0.5) / 1000000 AS containment
    FROM inc_sh i LEFT JOIN corp_sh c ON i.sh = c.sh
    GROUP BY i.doc_id
    HAVING floor(cast(sum(CASE WHEN c.sh IS NOT NULL THEN 1 ELSE 0 END) AS double)
                 / count(*) * 1000000 + 0.5) / 1000000 < 0.8
    """,
)
def dedup_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 cross-corpus (incremental-ingest) dedup: odd doc_ids stand in for
    a new crawl batch, even doc_ids for the existing corpus.  Exact
    normalized-hash anti-join drops verbatim re-crawls; then a directional
    shingle-containment gate (|inc ∩ corpus| / |inc| ≥ 0.8) drops
    near-contained docs.  The corpus shingle set is joined on an md5 key via
    a partitioned shuffle hash join — NOT broadcast (at 100 TB it is far
    larger than any executor) — see operators/dedup.py:dedup_against_corpus."""
    docs = _docs(spark, sf_dir)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    return dd.dedup_against_corpus(
        incoming, corpus, "text", "doc_id", shingle_n=3, containment_threshold=0.8
    )


@query(
    "dedup_bloom_ingest",
    oracle=f"""
    WITH corp AS (SELECT sha256({_NORM}) AS content_hash FROM documents WHERE doc_id % 2 = 0),
    inc AS (SELECT doc_id, sha256({_NORM}) AS content_hash FROM documents WHERE doc_id % 2 = 1)
    SELECT i.doc_id, i.content_hash FROM inc i
    WHERE NOT EXISTS (SELECT 1 FROM corp c WHERE c.content_hash = i.content_hash)
    """,
)
def dedup_bloom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24 Bloom-prefiltered ingest gate: the exact-hash stage of
    cross-corpus dedup with the corpus key set compressed into a Bloom
    filter, so definitely-new docs (the bulk of a crawl batch) pass a
    map-only bit test and never touch the anti-join shuffle.  The filter is
    built as a distributed ``bit_or`` aggregate (reduce side ≤ num_bits/64
    rows regardless of corpus size) and the result is EXACTLY the plain
    anti-join — Bloom filters have no false negatives — so the oracle is a
    plain ``NOT EXISTS``.  See operators/bloom.py for the 100 TB sizing
    story (probe="pandas" broadcasts GB-scale filters once per executor)."""
    from ..operators import bloom as bl

    docs = _docs(spark, sf_dir)
    keyed = docs.select(
        "doc_id", F.sha2(dd.normalized_text(F.col("text")), 256).alias("content_hash")
    )
    incoming = keyed.filter(F.col("doc_id") % 2 == 1)
    corpus = keyed.filter(F.col("doc_id") % 2 == 0).select("content_hash")
    return bl.prefiltered_anti_join(incoming, corpus, "content_hash")


@query(
    "split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE sub AS (
      SELECT doc_id, lang, {_NORM} AS ntext FROM documents WHERE doc_id < 300
    ),
    toks AS (
      SELECT doc_id, lang, list_distinct(string_split(ntext, ' ')) AS tokens FROM sub
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id AND a.lang = b.lang
      WHERE floor(cast(len(list_intersect(a.tokens, b.tokens)) AS double)
                  / len(list_distinct(list_concat(a.tokens, b.tokens))) * 1000000 + 0.5) / 1000000 >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM sub
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    canon AS (SELECT node AS doc_id, min(r) AS canonical_id FROM reach GROUP BY node)
    SELECT doc_id, canonical_id,
           CASE WHEN draw < 0.8 THEN 'train' WHEN draw < 0.9 THEN 'val' ELSE 'test' END AS split
    FROM (
      SELECT doc_id, canonical_id,
             cast(('0x' || substr(md5(concat('split0:', cast(canonical_id AS varchar))), 1, 6)) AS bigint)
               / 16777216.0 AS draw
      FROM canon
    )
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X26 leakage-safe split: near-dup clusters (within-lang word-set
    Jaccard ≥ 0.5 → connected components, bounded 300-doc slice for the
    exact-pairs oracle) assigned to train/val/test by an md5-uniform draw on
    the cluster CANONICAL id, so near-duplicate groups never straddle a
    split boundary.  At scale the pair feed is the LSH candidate path (see
    operators/dedup.py:leakage_safe_split)."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    pairs = dd.ngram_jaccard_pairs(
        docs, "text", "doc_id", block_col="lang", threshold=0.5
    ).select("id_a", "id_b")
    return dd.leakage_safe_split(docs, pairs, "doc_id")


@query(
    "sample_global_shuffle",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY md5(concat('epoch0:', cast(doc_id AS varchar))), doc_id)
             AS shuffle_pos
    FROM documents
    """,
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle for training-data ordering: sort by
    md5(epoch_salt || doc_id) — deterministic, seedable by epoch, identical
    on any engine (md5 is md5), no RNG state to carry.

    The ordinal comes from :func:`~..operators.transform.global_ordinal` —
    range-partition on the hash, rank within each partition, add broadcast
    per-partition offsets — NOT a no-partition window (which would move the
    whole corpus to one task).  Every stage is parallel; the only global
    structure is the 32-row offset table."""
    docs = _docs(spark, sf_dir)
    key = F.md5(F.concat(F.lit("epoch0:"), F.col("doc_id").cast("string")))
    from ..operators.transform import global_ordinal

    return global_ordinal(
        docs.select("doc_id", key.alias("_k")),
        ["_k", "doc_id"],
        out_col="shuffle_pos",
    ).select("doc_id", "shuffle_pos")


@query(
    "sample_domain_mix",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(concat('mix0:', cast(doc_id AS varchar))), 1, 1) <
          CASE lang WHEN 'en' THEN '8' WHEN 'de' THEN '4' ELSE '2' END
    """,
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain/source mixing: per-language keep rates in
    sixteenths of the md5 hash space (en 8/16, de 4/16, others 2/16) — the
    down-weighting step that shapes a training mixture.  Membership is a
    pure function of (salt, doc_id): reproducible across engines and runs,
    no RNG state, shuffle-free (row-local predicate), and the rate is exact
    in expectation at any scale.  Hex-prefix comparison is lexicographic on
    [0-9a-f] in both engines."""
    docs = _docs(spark, sf_dir)
    hexc = F.substring(
        F.md5(F.concat(F.lit("mix0:"), F.col("doc_id").cast("string"))), 1, 1
    )
    thr = (
        F.when(F.col("lang") == "en", "8").when(F.col("lang") == "de", "4").otherwise("2")
    )
    return docs.filter(hexc < thr).select("doc_id", "lang")


@query(
    "pack_chunks_token_budget",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split({_NORM}, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, lang, toks, unnest(range(0, len(toks), 40)) AS start FROM t),
    chunks AS (
      SELECT doc_id, lang, cast(start / 40 AS int) AS chunk_idx,
             least(50, len(toks) - start) AS n_tokens
      FROM s),
    packed AS (
      SELECT doc_id, lang, chunk_idx, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM chunks)
    SELECT doc_id, lang, chunk_idx, n_tokens,
           cast(floor(cast(cum - n_tokens AS double) / 512) AS bigint) AS pack_id
    FROM packed
    """,
)
def pack_chunks_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-split): chunks are laid end-to-end in a
    deterministic order and cut into 512-token packs — ``pack_id`` =
    floor(running-token-offset / budget), the standard approximation that
    wastes no padding.  Packing is per-language (PARTITION BY lang), so at
    100 TB each stratum packs independently — one window shuffle on the
    stratum key, no global sort; the cumulative sum is exact integer math,
    hash-identical on both engines."""
    docs = _docs(spark, sf_dir)
    chunks = tx.chunk_documents(docs, "text", "doc_id", chunk_size=50, overlap=10).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return chunks.select(
        "doc_id",
        "lang",
        "chunk_idx",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")).cast("double") / 512).cast("long").alias("pack_id"),
    )


@query(
    "text_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, md5(array_to_string(t[s+1:s+5], ' ')) AS gh
      FROM (SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS s
            FROM toks WHERE len(t) >= 5)),
    eval_g AS (SELECT DISTINCT gh FROM grams WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, gh FROM grams WHERE doc_id % 97 <> 0)
    SELECT t.doc_id,
           count(DISTINCT CASE WHEN e.gh IS NOT NULL THEN t.gh END) AS n_hits,
           count(DISTINCT t.gh) AS n_grams
    FROM train t LEFT JOIN eval_g e ON t.gh = e.gh
    GROUP BY t.doc_id
    HAVING count(DISTINCT CASE WHEN e.gh IS NOT NULL THEN t.gh END) > 0
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: docs with ``doc_id % 97 == 0`` stand in for
    a held-out benchmark; every training doc sharing a 5-word-gram with it
    is flagged with overlap counts.  The eval gram set is broadcast (eval
    sets are tiny), so at 100 TB the train side does one row-local explode
    and one groupBy(doc_id) — no gram-keyed shuffle of the corpus."""
    docs = _docs(spark, sf_dir)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return tx.contamination_counts(train, eval_df, "text", "doc_id", n=5)


@query(
    "embedding_centroid_by_label",
    oracle="""
    SELECT label, i - 1 AS dim,
           floor(cast(sum(cast(cast(v AS double) AS decimal(28,12))) AS double)
                 / count(*) * 1000000 + 0.5) / 1000000 AS centroid,
           count(*) AS n_vecs
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY label, dim
    """,
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids as (label, dim, centroid, n_vecs) rows —
    the semantic-clustering primitive (IVF retraining, per-cluster probes).
    Exploded output keeps the driver canonicalizer array-free; the one
    shuffle reduces to n_labels x dim rows."""
    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    return sim.label_centroids(emb)


@query(
    "text_length_histogram",
    oracle=f"""
    WITH t AS (SELECT cast(floor(len(string_split({_NORM}, ' ')) / 10) AS bigint) AS bucket
               FROM documents)
    SELECT bucket * 10 AS bucket_lo, count(*) AS n_docs
    FROM t GROUP BY bucket
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (bucket width 10) — the length-distribution
    probe run before choosing chunking/packing budgets.  One tiny
    aggregation; the bucket expression is row-local integer math, identical
    on both engines."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    bucket = F.floor(F.size(toks) / 10).cast("long")
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select((F.col("bucket") * 10).alias("bucket_lo"), "n_docs")
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tc FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, sum(tc) AS dlen FROM tf GROUP BY doc_id),
    dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             cast(floor(tf.tc * n.n_docs * 1000000.0 / (dl.dlen * dfq.dfreq)) AS bigint) AS score
      FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
               FROM scored)
    SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 keyword extraction: top-3 TF-IDF terms per document (log-free
    integer-exact score — see operator docstring for the determinism
    rationale and the scale shape of the vocabulary join)."""
    docs = _docs(spark, sf_dir)
    return tx.tfidf_top_terms(docs, "text", "doc_id", k=3)


@query(
    "text_vocabulary_topk",
    oracle=f"""
    WITH tf AS (
      SELECT term, count(*) AS cnt
      FROM (SELECT unnest(string_split({_NORM}, ' ')) AS term FROM documents)
      GROUP BY term),
    ranked AS (
      SELECT term, cnt,
             row_number() OVER (ORDER BY cnt DESC, term) AS rnk,
             sum(cnt) OVER (ORDER BY cnt DESC, term
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER () AS total
      FROM tf)
    SELECT term, cnt, rnk,
           floor(cast(cum AS double) / total * 1000000 + 0.5) / 1000000 AS coverage
    FROM ranked WHERE rnk <= 20
    """,
)
def text_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary builder: top-20 corpus tokens by frequency with
    cumulative coverage (the fraction of all token occurrences a vocabulary
    prefix explains) — the probe that sizes a tokenizer vocab.

    Scale shape: the heavy side is the corpus explode + (term) count — one
    hash shuffle with map-side partial aggregation.  The ordered
    cumulative-coverage window runs over the VOCABULARY (distinct terms),
    which is orders of magnitude smaller than the corpus (Heaps' law), so
    its single-partition sort is a deliberate, bounded collapse — never the
    corpus itself."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tf = (
        docs.select(
            F.explode(F.split(dd.normalized_text(F.col("text")), " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_ord = Window.orderBy(F.col("cnt").desc(), "term")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    mult = 1000000.0
    return (
        tf.select(
            "term",
            "cnt",
            F.row_number().over(w_ord).alias("rnk"),
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_all).alias("total"),
        )
        .filter(F.col("rnk") <= 20)
        .select(
            "term",
            "cnt",
            "rnk",
            (F.floor(F.col("cum").cast("double") / F.col("total") * mult + 0.5) / mult).alias(
                "coverage"
            ),
        )
    )


@query(
    "sample_weighted_hash",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE cast(('0x' || substr(md5(concat('w0:', cast(doc_id AS varchar))), 1, 6)) AS bigint)
          < cast(floor(least(cast(n_chars AS double) / 400.0, 1.0) * 16777216) AS bigint)
    """,
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling: each document is kept with
    probability proportional to its quality weight (here length/400 capped
    at 1) by comparing a 24-bit md5-uniform draw against the scaled weight —
    reproducible across engines and epochs (pure function of salt‖id), no
    RNG state, shuffle-free row-local predicate.  This is the
    quality-weighted mixing step of training-data curation (upweight good
    docs without a global sort or an RNG sequence)."""
    docs = _docs(spark, sf_dir)
    draw = F.conv(
        F.substring(F.md5(F.concat(F.lit("w0:"), F.col("doc_id").cast("string"))), 1, 6),
        16,
        10,
    ).cast("long")
    weight = F.least(F.col("n_chars").cast("double") / 400.0, F.lit(1.0))
    thr = F.floor(weight * (1 << 24)).cast("long")
    return docs.filter(draw < thr).select("doc_id", "n_chars")


@query(
    "text_quality_percentile",
    oracle="""
    SELECT doc_id, lang,
           percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pct_rank,
           ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
    FROM documents
    """,
)
def text_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality percentile + decile of document length — the
    relative-quality gate (keep the top decile per stratum) that, unlike an
    absolute threshold, survives distribution drift between strata.
    ``percent_rank`` is an exact small-integer ratio (IEEE-identical on both
    engines); ``ntile`` is made deterministic by the (n_chars, doc_id) total
    order.  One window shuffle on the stratum key."""
    docs = _docs(spark, sf_dir)
    w_pr = Window.partitionBy("lang").orderBy("n_chars")
    w_nt = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "lang",
        F.percent_rank().over(w_pr).alias("pct_rank"),
        F.ntile(10).over(w_nt).alias("decile"),
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH old_snap AS (SELECT doc_id, text FROM documents),
    new_snap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, 'new ' || text AS text
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN md5(o.text) <> md5(n.text) THEN 'changed'
           END AS change_type
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
    WHERE (CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN md5(o.text) <> md5(n.text) THEN 'changed' END) IS NOT NULL
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff CDC for incremental ingestion (operators/cdc.py): the
    'new' crawl is derived deterministically from documents — every
    doc_id%10==0 removed, every surviving doc_id%7==0 revised, every
    doc_id%13==0 re-added under a new id — then hash-compare full-outer-join
    emits ONLY the delta.  The reference re-pulls full objects per run
    (s3pull.py:46-94); at 100 TB only this delta should flow downstream.
    One id-shuffle per side (shuffle-free when snapshots are bucketed)."""
    from ..operators.cdc import snapshot_diff

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    revised = docs.where(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    arrived = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(F.lit("new "), F.col("text")).alias("text"),
    )
    return snapshot_diff(docs, revised.unionByName(arrived), "doc_id", ["text"])


@query(
    "quality_constraint_report",
    oracle="""
    WITH agg AS (
      SELECT cast(count(*) - count(DISTINCT doc_id) AS bigint) AS unique_doc_id,
             cast(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS bigint) AS not_null_text,
             cast(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS bigint) AS not_null_lang,
             cast(sum(CASE WHEN lang IS NULL OR lang NOT IN ('de','en','es','fr','zh')
                           THEN 1 ELSE 0 END) AS bigint) AS lang_in_domain,
             cast(sum(CASE WHEN n_chars IS NULL OR n_chars <> length(text)
                           THEN 1 ELSE 0 END) AS bigint) AS n_chars_consistent,
             cast(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS bigint) AS min_length_100
      FROM documents
    )
    SELECT check_name, violations, violations = 0 AS passed FROM (
      SELECT 'unique_doc_id' AS check_name, unique_doc_id AS violations FROM agg
      UNION ALL SELECT 'not_null_text', not_null_text FROM agg
      UNION ALL SELECT 'not_null_lang', not_null_lang FROM agg
      UNION ALL SELECT 'lang_in_domain', lang_in_domain FROM agg
      UNION ALL SELECT 'n_chars_consistent', n_chars_consistent FROM agg
      UNION ALL SELECT 'min_length_100', min_length_100 FROM agg
    )
    """,
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style ingest gate (operators/quality_checks.py): uniqueness,
    completeness, domain, consistency, and length-floor constraints over an
    arriving batch, ALL folded into one aggregate scan — constraint count
    does not multiply 100 TB scan cost.  min_length_100 intentionally has
    real violations in the fixture (shortest doc is 48 chars), so the report
    exercises both pass and fail lanes."""
    from ..operators.quality_checks import constraint_report

    docs = _docs(spark, sf_dir)
    return constraint_report(
        docs,
        unique="doc_id",
        not_null=["text", "lang"],
        row_checks={
            "lang_in_domain": F.col("lang").isNull()
            | ~F.col("lang").isin("de", "en", "es", "fr", "zh"),
            "n_chars_consistent": F.col("n_chars").isNull()
            | (F.col("n_chars") != F.length("text")),
            "min_length_100": F.col("n_chars") < 100,
        },
    )


@query(
    "cdc_apply_delta",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text
    FROM documents WHERE doc_id % 10 <> 0
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, 'new ' || text AS text
    FROM documents WHERE doc_id % 13 = 0
    """,
)
def cdc_apply_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC round-trip law: ``apply(old, diff(old, new)) == new``.  The delta
    (with new-side payloads) from cdc_snapshot_diff's derived crawl is
    applied back onto the old snapshot — anti-join deletes, union-by-name
    upserts — and the oracle is the NEW snapshot computed directly, so the
    driver hash-checks the invariant that lets a 100 TB pipeline ship
    deltas instead of snapshots (operators/cdc.py:apply_changes)."""
    from ..operators.cdc import apply_changes, snapshot_diff

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    revised = docs.where(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    arrived = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(F.lit("new "), F.col("text")).alias("text"),
    )
    new = revised.unionByName(arrived)
    delta = snapshot_diff(docs, new, "doc_id", ["text"], include_payload=True)
    return apply_changes(docs, delta, "doc_id", ["text"])


@query(
    "profile_documents",
    oracle="""
    WITH agg AS (
      SELECT cast(count(*) AS bigint) AS n,
             cast(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_doc_id,
             cast(count(DISTINCT doc_id) AS bigint) AS nd_doc_id,
             cast(min(doc_id) AS varchar) AS min_doc_id,
             cast(max(doc_id) AS varchar) AS max_doc_id,
             cast(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_lang,
             cast(count(DISTINCT lang) AS bigint) AS nd_lang,
             cast(min(lang) AS varchar) AS min_lang,
             cast(max(lang) AS varchar) AS max_lang,
             cast(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_source,
             cast(count(DISTINCT source) AS bigint) AS nd_source,
             cast(min(source) AS varchar) AS min_source,
             cast(max(source) AS varchar) AS max_source,
             cast(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_n_chars,
             cast(count(DISTINCT n_chars) AS bigint) AS nd_n_chars,
             cast(min(n_chars) AS varchar) AS min_n_chars,
             cast(max(n_chars) AS varchar) AS max_n_chars
      FROM documents
    )
    SELECT * FROM (
      SELECT 'doc_id' AS col_name, n AS n_rows, null_doc_id AS n_null,
             nd_doc_id AS n_distinct, min_doc_id AS min_value, max_doc_id AS max_value FROM agg
      UNION ALL SELECT 'lang', n, null_lang, nd_lang, min_lang, max_lang FROM agg
      UNION ALL SELECT 'source', n, null_source, nd_source, min_source, max_source FROM agg
      UNION ALL SELECT 'n_chars', n, null_n_chars, nd_n_chars, min_n_chars, max_n_chars FROM agg
    )
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report over the corpus (operators/quality_checks.py:
    profile_columns): per-column rows / nulls / exact distinct / min / max,
    every statistic folded into ONE aggregate over ONE scan.  The profile is
    what a curation pipeline runs FIRST — its output (null fractions, value
    domains, cardinalities) is where the quality_constraint_report
    thresholds come from.  At 100 TB the exact multi-distinct (one Expand ×
    column count) swaps to approx_count_distinct via exact_distinct=False;
    the report is advisory there, so HLL's ±2% is acceptable."""
    from ..operators.quality_checks import profile_columns

    return profile_columns(
        _docs(spark, sf_dir), ["doc_id", "lang", "source", "n_chars"]
    )


@query(
    "dedup_lsh_eval",
    # Truth = all-pairs exact word-set Jaccard on the slice; pred = the
    # shared md5-LSH CTE chain at the eval's parameters (unigram items,
    # 8 bands of 2 slots).  P/R round through the same floor(x*1e6+0.5)/1e6
    # double arithmetic as the Spark side.
    oracle=f"""
    WITH {_md5_lsh_pair_ctes(where="text IS NOT NULL AND doc_id < 300", shingle_n=1, bands=8)},
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE floor(cast(len(list_intersect(a.items, b.items)) AS double)
                  / len(list_distinct(a.items || b.items)) * 1000000 + 0.5) / 1000000
            >= 0.5),
    m AS (
      SELECT CASE WHEN p.id_a IS NULL THEN 0 ELSE 1 END AS p,
             CASE WHEN t.id_a IS NULL THEN 0 ELSE 1 END AS t
      FROM lsh_pairs p FULL OUTER JOIN truth t
        ON p.id_a = t.id_a AND p.id_b = t.id_b)
    SELECT cast(coalesce(sum(t), 0) AS bigint) AS n_truth,
           cast(coalesce(sum(p), 0) AS bigint) AS n_pred,
           cast(coalesce(sum(p * t), 0) AS bigint) AS n_true_positive,
           floor(cast(coalesce(sum(p * t), 0) AS double)
                 / greatest(coalesce(sum(p), 0), 1) * 1000000 + 0.5) / 1000000 AS precision,
           floor(cast(coalesce(sum(p * t), 0) AS double)
                 / greatest(coalesce(sum(t), 0), 1) * 1000000 + 0.5) / 1000000 AS recall
    FROM m
    """,
)
def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluation of the LSH scale path: precision/recall of MinHash-LSH
    candidate pairs against the exact n-gram-Jaccard truth set on the same
    corpus slice — the measurement a dedup pipeline runs when tuning
    (num_hashes, bands) before trusting LSH at full scale.

    This declared query runs the engine-portable md5_32 LSH mode, so the
    whole eval — truth set, candidate pipeline, P/R arithmetic — is
    DuckDB-oracle-checked (upgraded from rows-only in r8); the xxhash64
    production mode's recall floor stays pinned in
    tests/test_extensions.py::test_lsh_eval_reports_sane_metrics.

    Scale shape: truth is the quadratic exact form, so the eval runs on a
    BOUNDED slice (the standard practice — sample a slice you can afford
    exact truth for, measure, then apply the tuned LSH everywhere)."""
    import cloudcomputing_servicecompositiontest_datapipeline_spark.operators.dedup as dd

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 300)
    # truth is UNBLOCKED all-pairs (the slice is small enough to afford it)
    # so pred and truth rank the identical pair universe
    truth = dd.ngram_jaccard_pairs(
        docs, "text", "doc_id", block_col=None, threshold=0.5
    ).select("id_a", "id_b")
    pred = dd.minhash_near_dups(
        docs, "text", "doc_id", num_hashes=16, bands=8, threshold=0.5,
        shingle_n=1, max_bucket_size=1000, hash_fn="md5_32",
    ).select("id_a", "id_b")
    both = pred.withColumn("p", F.lit(1)).join(
        truth.withColumn("t", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    mult = 1000000.0
    n_truth = F.coalesce(F.sum("t"), F.lit(0)).cast("long")
    n_pred = F.coalesce(F.sum(F.col("p")), F.lit(0)).cast("long")
    tp = F.coalesce(F.sum(F.col("p") * F.col("t")), F.lit(0)).cast("long")
    return both.agg(
        n_truth.alias("n_truth"),
        n_pred.alias("n_pred"),
        tp.alias("n_true_positive"),
        (F.floor(tp.cast("double") / F.greatest(n_pred, F.lit(1)) * mult + 0.5) / mult).alias("precision"),
        (F.floor(tp.cast("double") / F.greatest(n_truth, F.lit(1)) * mult + 0.5) / mult).alias("recall"),
    )


def _ann_eval_cte(n_planes: int, planes_per_table: int, dim: int = _ANN_DIM) -> str:
    """Shared DuckDB CTE prefix for the ANN eval/sweep oracles: per-vector
    norms, the full brute-force pair scores for the 20-query panel (`bf` —
    every ANN candidate set is a subset of these pairs, so preds re-join it
    instead of re-deriving cosines), the exact top-5 `truth`, the md5_32
    hyperplane signatures (`sigs`, table = plane // planes_per_table — the
    similarity_lsh_topk fragment), and the seed-vector IVF quantizer
    (`centers`/`assigned`/`adist` — the similarity_ivf_topk fragment).

    norms and dots carry the same NULL/dimension guard as the
    semantic-centroids oracle (r8 ADVICE): DuckDB's list_sum silently skips
    NULL elements where Spark's fold poisons to NULL, so a ragged or NULL
    embedding would otherwise diverge truth/candidate sets.  (No inline SQL
    comments here — the registry collapses oracles to one line.)"""
    return f"""
    WITH norms AS (
      SELECT vec_id, embedding,
             sqrt(cast(list_sum(list_transform(embedding, x ->
               cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)) AS nrm
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = {dim}),
    bf AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        CASE WHEN q.nrm * c.nrm > 0 THEN
          floor(cast(list_sum(list_transform(q.embedding, (x, i) ->
            cast(cast(x AS double) * cast(c.embedding[i] AS double) AS decimal(28,12)))) AS double)
            / (q.nrm * c.nrm) * 1000000 + 0.5) / 1000000 END AS cosine
      FROM norms q JOIN norms c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 20),
    truth AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
        FROM bf WHERE cosine IS NOT NULL) WHERE rnk <= 5),
    planes AS (
      SELECT p.range AS p,
             list(cast(cast(('0x' || substr(md5('hp' || p.range || ':' || j.range), 1, 8)) AS bigint) % 1000 - 500 AS double) ORDER BY j.range) AS cv
      FROM range({n_planes}) p, range({dim}) j GROUP BY p.range),
    dots AS (
      SELECT e.vec_id, pl.p,
             list_sum(list_transform(e.embedding, (x, i) -> cast(cast(x AS double) * pl.cv[i] AS decimal(28,12)))) AS dot
      FROM embeddings e CROSS JOIN planes pl
      WHERE e.embedding IS NOT NULL AND len(e.embedding) = {dim}),
    sigs AS (
      SELECT vec_id, cast(p // {planes_per_table} AS int) AS tbl,
             sum(CASE WHEN dot >= 0 THEN cast(1 AS bigint) << cast(p % {planes_per_table} AS int) ELSE cast(0 AS bigint) END) AS bits
      FROM dots GROUP BY 1, 2),
    seedrank AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY cast(('0x' || substr(md5('42:' || cast(vec_id AS varchar)), 1, 8)) AS bigint), vec_id
             ) AS rn
      FROM embeddings WHERE embedding IS NOT NULL),
    centers AS (SELECT rn - 1 AS cid, embedding AS cv FROM seedrank WHERE rn <= 8),
    dim AS (SELECT len(cv) AS d FROM centers WHERE cid = 0),
    cand AS (
      SELECT vec_id, embedding FROM embeddings, dim
      WHERE embedding IS NOT NULL AND len(embedding) = dim.d),
    adist AS (
      SELECT c.vec_id, ct.cid,
             list_sum(list_transform(c.embedding, (x, i) ->
               cast((cast(x AS double) - cast(ct.cv[i] AS double))
                    * (cast(x AS double) - cast(ct.cv[i] AS double)) AS decimal(28,12)))) AS d
      FROM cand c CROSS JOIN centers ct),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
        FROM adist) WHERE rr = 1)
    """


@query(
    "similarity_ann_eval",
    # Both ANN paths run engine-portable modes (md5_32 hyperplanes, seed-
    # vector IVF with decimal-exact assignment), so candidates are exactly
    # recomputable; every candidate pair's cosine is a row of the brute-
    # force `bf` CTE, so preds re-join it and the recall aggregate is plain
    # integer arithmetic.
    oracle=_ann_eval_cte(8, 2)
    + """,
    lsh_pred AS (
      SELECT query_id, cand_id FROM (
        SELECT b.query_id, b.cand_id,
               row_number() OVER (PARTITION BY b.query_id ORDER BY b.cosine DESC, b.cand_id) AS rnk
        FROM (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
              FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.bits = c.bits AND q.vec_id != c.vec_id
              WHERE q.vec_id < 20) p
        JOIN bf b ON b.query_id = p.query_id AND b.cand_id = p.cand_id
        WHERE b.cosine IS NOT NULL) WHERE rnk <= 5),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
        FROM adist WHERE vec_id < 20) WHERE rr <= 4),
    ivf_pred AS (
      SELECT query_id, cand_id FROM (
        SELECT b.query_id, b.cand_id,
               row_number() OVER (PARTITION BY b.query_id ORDER BY b.cosine DESC, b.cand_id) AS rnk
        FROM probes p
        JOIN assigned a ON a.cid = p.cid AND a.vec_id != p.query_id
        JOIN bf b ON b.query_id = p.query_id AND b.cand_id = a.vec_id
        WHERE b.cosine IS NOT NULL) WHERE rnk <= 5),
    counts AS (SELECT cast(count(*) AS bigint) AS n_truth FROM truth)
    SELECT h.method, counts.n_truth, cast(h.n_hit AS bigint) AS n_hit,
           CASE WHEN counts.n_truth > 0 THEN
             floor(cast(h.n_hit AS double) / counts.n_truth * 1000000 + 0.5) / 1000000
           END AS recall
    FROM counts CROSS JOIN (
      SELECT 'ivf' AS method,
             (SELECT count(*) FROM truth t JOIN ivf_pred p
              ON t.query_id = p.query_id AND t.cand_id = p.cand_id) AS n_hit
      UNION ALL
      SELECT 'lsh',
             (SELECT count(*) FROM truth t JOIN lsh_pred p
              ON t.query_id = p.query_id AND t.cand_id = p.cand_id)
    ) h
    ORDER BY h.method
    """,
)
def similarity_ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluation of both ANN scale paths: recall@5 of LSH-bucketed and
    IVF top-k against the brute-force exact top-5 for the same 20 queries —
    the tuning measurement (planes / n_centroids / n_probe) a similarity
    pipeline runs on an affordable slice before trusting ANN at corpus
    scale (same eval-on-a-slice posture as dedup_lsh_eval).

    The declared query runs the engine-portable modes — md5_32 hyperplanes
    for LSH, the seed-vector quantizer with decimal-exact assignment for
    IVF — so truth, both candidate sets, AND the recall aggregate are
    DuckDB-oracle-checked end to end (upgraded from rows-only in r8's
    second pass, completing the dedup_lsh_eval precedent).  The production
    xxhash64 / Lloyd's-refined paths keep their recall floors pinned in
    tests/test_extensions.py.  Output: (method, n_truth, n_hit, recall)."""
    from ..operators import similarity as sim

    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    k = 5
    # shared brute-force score table — see similarity_ann_sweep: the truth
    # arm needs every pair scored anyway, so both ANN arms re-join it
    # instead of re-running the decimal cosine fold per candidate
    bf = sim.brute_force_scores(emb, q).localCheckpoint(eager=False)
    truth = sim.topk_from_scores(bf, k=k).select("query_id", "cand_id")
    centers = sim.ivf_seed_centers(emb, n_centroids=8, seed=42)
    lsh = _ann_recall(
        truth, "lsh",
        sim.lsh_topk(emb, q, k=k, planes=2, dim=_ANN_DIM, tables=4,
                     hash_fn="md5_32", scores=bf),
    )
    ivf = _ann_recall(
        truth, "ivf",
        sim.ivf_topk(emb, q, k=k, n_centroids=8, n_probe=4, centers=centers,
                     exact_assign=True, scores=bf),
    )
    return lsh.unionByName(ivf).orderBy("method")


def _ann_recall(truth: DataFrame, name: str, pred: DataFrame) -> DataFrame:
    """One (method, n_truth, n_hit, recall) row: share of the brute-force
    truth pairs the ANN path reproduced.  try_divide: an EMPTY truth panel
    (every query filtered out, or a 1-vector corpus whose only neighbor is
    itself) yields NULL recall, not an ANSI DIVIDE_BY_ZERO that kills the
    eval job (found by the one-row degenerate sweep)."""
    mult = 1000000.0
    return (
        truth.withColumn("t", F.lit(1))
        .join(pred.select("query_id", "cand_id").withColumn("p", F.lit(1)),
              ["query_id", "cand_id"], "left")
        .agg(
            F.lit(name).alias("method"),
            F.count(F.lit(1)).cast("long").alias("n_truth"),
            F.coalesce(F.sum("p"), F.lit(0)).cast("long").alias("n_hit"),
            (
                F.floor(
                    F.try_divide(
                        F.coalesce(F.sum("p"), F.lit(0)), F.count(F.lit(1))
                    )
                    * mult
                    + 0.5
                )
                / mult
            ).alias("recall"),
        )
    )


@query(
    "similarity_ann_sweep",
    # Portable-mode sweep: 16 md5_32 planes (8 tables x 2 planes) and the
    # shared seed-vector quantizer.  A pair reached first in table t (or at
    # probe position pos) belongs to every setting > t (> pos) — the same
    # one-retrieval explode the Spark operators do — and cosines re-join
    # the brute-force `bf` CTE.
    oracle=_ann_eval_cte(16, 2)
    + """,
    lsh_first AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, min(q.tbl) AS first_tbl
      FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.bits = c.bits AND q.vec_id != c.vec_id
      WHERE q.vec_id < 20 GROUP BY 1, 2),
    lsh_pred AS (
      SELECT setting, query_id, cand_id FROM (
        SELECT s.setting, f.query_id, f.cand_id,
               row_number() OVER (PARTITION BY s.setting, f.query_id
                                  ORDER BY b.cosine DESC, f.cand_id) AS rnk
        FROM lsh_first f
        JOIN bf b ON b.query_id = f.query_id AND b.cand_id = f.cand_id
                 AND b.cosine IS NOT NULL
        JOIN (VALUES (1), (4), (8)) s(setting) ON s.setting > f.first_tbl
      ) WHERE rnk <= 5),
    ivf_pos AS (
      SELECT vec_id AS query_id, cid, rr - 1 AS pos FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
        FROM adist WHERE vec_id < 20) WHERE rr <= 4),
    ivf_pred AS (
      SELECT setting, query_id, cand_id FROM (
        SELECT s.setting, p.query_id, a.vec_id AS cand_id,
               row_number() OVER (PARTITION BY s.setting, p.query_id
                                  ORDER BY b.cosine DESC, a.vec_id) AS rnk
        FROM ivf_pos p
        JOIN assigned a ON a.cid = p.cid AND a.vec_id != p.query_id
        JOIN bf b ON b.query_id = p.query_id AND b.cand_id = a.vec_id
                 AND b.cosine IS NOT NULL
        JOIN (VALUES (1), (2), (4)) s(setting) ON s.setting > p.pos
      ) WHERE rnk <= 5),
    counts AS (SELECT cast(count(*) AS bigint) AS n_truth FROM truth),
    grid AS (
      SELECT 'lsh' AS method, setting FROM (VALUES (1), (4), (8)) g(setting)
      UNION ALL
      SELECT 'ivf', setting FROM (VALUES (1), (2), (4)) g(setting)),
    hits AS (
      SELECT 'lsh' AS method, p.setting, count(*) AS h
      FROM truth t JOIN lsh_pred p ON t.query_id = p.query_id AND t.cand_id = p.cand_id
      GROUP BY p.setting
      UNION ALL
      SELECT 'ivf', p.setting, count(*)
      FROM truth t JOIN ivf_pred p ON t.query_id = p.query_id AND t.cand_id = p.cand_id
      GROUP BY p.setting)
    SELECT g.method, cast(g.setting AS int) AS setting, counts.n_truth,
           cast(coalesce(h.h, 0) AS bigint) AS n_hit,
           CASE WHEN counts.n_truth > 0 THEN
             floor(cast(coalesce(h.h, 0) AS double) / counts.n_truth * 1000000 + 0.5) / 1000000
           END AS recall
    FROM grid g CROSS JOIN counts
    LEFT JOIN hits h ON h.method = g.method AND h.setting = g.setting
    ORDER BY g.method, g.setting
    """,
)
def similarity_ann_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration-grade ANN eval (r6 verdict item 7): recall@5 vs brute
    force across a PARAMETER SWEEP — LSH tables ∈ {1,4,8} and IVF n_probe
    ∈ {1,2,4} — so a regression in the bucketing shows up as a broken
    monotone curve, not a single point drifting inside noise.  Recall is
    provably non-decreasing along each axis: more tables / more probes
    produce a candidate SUPERSET, and any candidate outscoring a true
    top-k pair would itself be in the brute-force top-k (global ranking,
    same cand_id tiebreak), so top-k-from-a-superset can only gain truth
    hits — the monotonicity law tests/test_extensions.py pins.  The
    declared query runs the engine-portable modes (md5_32 hyperplanes,
    seed-vector IVF with decimal-exact assignment), so the WHOLE sweep —
    truth, both candidate explosions, every recall point — is DuckDB-
    oracle-checked (upgraded from rows-only in r8's second pass); the
    production xxhash64 / Lloyd's paths keep their monotone-curve pytest
    law.  Output: (method, setting, n_truth, n_hit, recall), ordered."""
    from ..operators import similarity as sim

    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    k = 5
    lsh_settings, ivf_settings = (1, 4, 8), (1, 2, 4)
    # ONE brute-force score table shared by the truth arm AND both sweep
    # arms (the oracle's own `bf` CTE shape): the arms' candidates are a
    # subset of these pairs, so re-joining the table replaces their
    # per-candidate-occurrence decimal cosine folds — the r10 verdict's
    # item 4, re-decided at sf1 where the in-arm folds were 1.5 min of
    # aggregate-input CPU (726k occurrences).  localCheckpoint materializes
    # the table once per execution (within-single-execution reuse, the
    # cluster_canonical pattern — nothing persists across runs).
    bf = sim.brute_force_scores(emb, q).localCheckpoint(eager=False)
    truth = sim.topk_from_scores(bf, k=k).select("query_id", "cand_id")
    # one retrieval per METHOD, not per sweep point: the *_sweep operators
    # bucket/probe once at the widest setting and explode each pair into
    # the settings that reach it (result-identical to per-point runs; the
    # n_probe axis also shares ONE trained quantizer by construction)
    centers = sim.ivf_seed_centers(emb, n_centroids=8, seed=42)
    preds = (
        sim.lsh_topk_sweep(
            emb, q, k=k, planes=2, dim=_ANN_DIM, tables_list=lsh_settings,
            hash_fn="md5_32", scores=bf,
        )
        .select(F.lit("lsh").alias("method"), "setting", "query_id", "cand_id")
        .unionByName(
            sim.ivf_topk_sweep(
                emb, q, k=k, n_centroids=8, n_probe_list=ivf_settings,
                centers=centers, exact_assign=True, scores=bf,
            ).select(F.lit("ivf").alias("method"), "setting", "query_id", "cand_id")
        )
    )
    # every sweep point gets a row even when its candidate set is EMPTY
    # (degenerate corpora at small tables/probes) — build the grid
    # explicitly instead of grouping whatever predictions survived
    grid = spark.createDataFrame(
        [("lsh", t) for t in lsh_settings] + [("ivf", p) for p in ivf_settings],
        "method STRING, setting INT",
    )
    hits = (
        truth.join(preds, ["query_id", "cand_id"], "inner")
        .groupBy("method", "setting")
        .agg(F.count(F.lit(1)).cast("long").alias("_hits"))
    )
    totals = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    mult = 1000000.0
    return (
        grid.crossJoin(F.broadcast(totals))
        .join(hits, ["method", "setting"], "left")
        .select(
            "method",
            "setting",
            "n_truth",
            F.coalesce(F.col("_hits"), F.lit(0)).cast("long").alias("n_hit"),
            (
                F.floor(
                    F.try_divide(F.coalesce(F.col("_hits"), F.lit(0)), F.col("n_truth"))
                    * mult
                    + 0.5
                )
                / mult
            ).alias("recall"),
        )
        .orderBy("method", "setting")
    )


_WINNOW_CTE = f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents),
    g AS (
      SELECT doc_id, greatest(len(tk) - 4, 0) AS n_grams,
             CASE WHEN len(tk) >= 5 THEN
               list_transform(range(1, len(tk) - 4 + 1), i ->
                 cast(('0x' || substr(md5(array_to_string(list_slice(tk, i, i + 4), ' ')), 1, 8)) AS bigint))
             ELSE [] END AS hashes
      FROM t),
    w AS (
      SELECT doc_id, n_grams,
             CASE WHEN len(hashes) >= 4 THEN
               list_sort(list_distinct(list_transform(range(1, len(hashes) - 3 + 1), i ->
                 list_min(list_slice(hashes, i, i + 3)))))
             ELSE list_sort(list_distinct(hashes)) END AS fingerprints
      FROM g)
"""


@query(
    "text_winnow_fingerprints",
    oracle=_WINNOW_CTE
    + "SELECT doc_id, n_grams, array_to_string(fingerprints, ',') AS fingerprints,"
    " len(fingerprints) AS n_fingerprints FROM w",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43 winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003,
    the MOSS algorithm): per-document selected k-gram hash set with the
    guarantee that any shared >= (window+k-1)-token run yields a shared
    fingerprint -- the partial-overlap detector the whole-doc fingerprint
    cannot be.  Entirely row-local array expressions (no UDF, no shuffle);
    k=5 word-grams, window=4.

    The display column joins the (already sorted) fingerprint array into a
    comma string: the driver's hash canonicalizer cannot factorize raw
    array columns (the r04 ``unhashable type: numpy.ndarray`` FAIL) -- the
    same pattern as ``report_show_as_list`` (plans/report.py)."""
    docs = _docs(spark, sf_dir)
    fps = tx.winnow_fingerprints(docs, "text", "doc_id", k=5, window=4)
    return fps.select(
        "doc_id",
        "n_grams",
        F.array_join("fingerprints", ",").alias("fingerprints"),
        "n_fingerprints",
    )


@query(
    "dedup_winnow_candidates",
    oracle=_WINNOW_CTE
    + """
    , e AS (SELECT doc_id AS id, unnest(fingerprints) AS fp FROM w),
    small AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 200),
    ee AS (SELECT e.id, e.fp FROM e JOIN small USING (fp))
    SELECT a.id AS id_a, b.id AS id_b, cast(count(*) AS bigint) AS n_shared
    FROM ee a JOIN ee b ON a.fp = b.fp AND a.id < b.id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def dedup_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43 match step: near-dup candidate pairs by shared winnowing
    fingerprints -- ONE shuffle on the fingerprint value (the bucket key),
    with over-frequent fingerprints (boilerplate) dropped before the join
    under the same skew-cap discipline as the LSH band join.  min_shared=2
    keeps only pairs with at least two independent shared runs."""
    docs = _docs(spark, sf_dir)
    fps = tx.winnow_fingerprints(docs, "text", "doc_id", k=5, window=4)
    return tx.winnow_candidates(fps, "doc_id", min_shared=2, max_bucket_size=200)


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents),
    stats AS (SELECT count(*) AS n_docs, sum(len(tk)) AS sum_dl FROM t),
    q AS (SELECT * FROM (VALUES
      ('q_hash_join', 'hash'), ('q_hash_join', 'join'),
      ('q_window_sort', 'window'), ('q_window_sort', 'sort'), ('q_window_sort', 'agg'),
      ('q_vector_scan', 'vector'), ('q_vector_scan', 'scan')) AS v(query_id, term)),
    tf AS (
      SELECT doc_id, len(tk) AS dl, w AS term, count(*) AS tf
      FROM (SELECT doc_id, tk, unnest(tk) AS w FROM t)
      WHERE w IN (SELECT DISTINCT term FROM q)
      GROUP BY 1, 2, 3),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT q.query_id, tf.doc_id,
             cast(
               ln((cast(n_docs AS double) - cast(df AS double) + 0.5)
                  / (cast(df AS double) + 0.5) + 1.0)
               * (cast(tf AS double) * (1.2 + 1.0)
                  / (cast(tf AS double) + 1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS double)
                     / (cast(sum_dl AS double) / cast(n_docs AS double)))))
             AS decimal(28,12)) AS c
      FROM tf JOIN q ON q.term = tf.term JOIN dft ON dft.term = tf.term, stats),
    scored AS (
      SELECT query_id, doc_id,
             floor(cast(sum(c) AS double) * 1000000 + 0.5) / 1000000 AS score
      FROM contrib GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, doc_id, score,
             cast(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS int) AS rank
      FROM scored)
    SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X44 BM25 lexical retrieval (Robertson & Zaragoza 2009, Lucene idf
    variant) over a 3-query panel: top-10 documents per query.  The corpus
    pass is one map-side-filtered explode (only panel-term hits shuffle);
    stats/doc-freqs are broadcast; per-term contributions
    decimal-accumulate so the engines' fold orders cannot diverge; ranking
    happens on the ROUNDED score with doc_id tiebreak."""
    docs = _docs(spark, sf_dir)
    panel = [
        ("q_hash_join", ["hash", "join"]),
        ("q_window_sort", ["window", "sort", "agg"]),
        ("q_vector_scan", ["vector", "scan"]),
    ]
    return tx.bm25_topk(docs, "text", "doc_id", panel, topk=10)


@query(
    "dedup_winnow_verified",
    oracle=_WINNOW_CTE
    + """
    , e AS (SELECT doc_id AS id, unnest(fingerprints) AS fp FROM w),
    small AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 200),
    ee AS (SELECT e.id, e.fp FROM e JOIN small USING (fp)),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, cast(count(*) AS bigint) AS n_shared
      FROM ee a JOIN ee b ON a.fp = b.fp AND a.id < b.id
      GROUP BY 1, 2 HAVING count(*) >= 2),
    gs AS (
      SELECT doc_id, CASE WHEN len(tk) >= 5 THEN
        list_distinct(list_transform(range(1, len(tk) - 4 + 1), i ->
          md5(array_to_string(list_slice(tk, i, i + 4), ' '))))
      ELSE [] END AS grams FROM t),
    v AS (
      SELECT c.id_a, c.id_b, c.n_shared,
             len(list_filter(ga.grams, x -> list_contains(gb.grams, x))) AS n_common_grams,
             len(ga.grams) + len(gb.grams) AS tot
      FROM cand c JOIN gs ga ON ga.doc_id = c.id_a JOIN gs gb ON gb.doc_id = c.id_b),
    scored AS (
      SELECT id_a, id_b, n_shared, n_common_grams,
             CASE WHEN tot - n_common_grams > 0 THEN
               floor(cast(n_common_grams AS double) / (tot - n_common_grams) * 1000000 + 0.5) / 1000000
             ELSE 0.0 END AS jaccard
      FROM v)
    SELECT * FROM scored WHERE jaccard >= 0.2
    """,
)
def dedup_winnow_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43 full candidates→verify composition: winnowing fingerprint bucket
    join proposes pairs, then EXACT 5-gram Jaccard confirms them -- the
    two-stage shape (cheap recall, exact precision) every near-dup pipeline
    ships.  Gram sets shuffle only for candidate docs; Jaccard rounds
    before the 0.2 threshold so both engines cut identically."""
    docs = _docs(spark, sf_dir)
    fps = tx.winnow_fingerprints(docs, "text", "doc_id", k=5, window=4)
    cand = tx.winnow_candidates(fps, "doc_id", min_shared=2, max_bucket_size=200)
    return tx.winnow_verify(docs, "text", "doc_id", cand, k=5, min_jaccard=0.2)


@query(
    "embedding_normalize_zscore",
    oracle="""
    WITH e AS (
      SELECT vec_id, i, cast(embedding[i] AS double) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
    s AS (
      SELECT i, count(*) AS n,
             cast(sum(cast(x AS decimal(38,12))) AS double) AS sx,
             cast(sum(cast(x * x AS decimal(38,12))) AS double) AS sxx
      FROM e GROUP BY 1),
    st AS (SELECT i, sx / n AS mean, sqrt(sxx / n - (sx / n) * (sx / n)) AS std FROM s)
    SELECT e.vec_id, cast(e.i - 1 AS int) AS dim,
           CASE WHEN st.std > 0 THEN
             floor((e.x - st.mean) / st.std * 1000000 + 0.5) / 1000000
           ELSE 0.0 END AS z
    FROM e JOIN st ON st.i = e.i
    """,
)
def embedding_normalize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X45 per-dimension z-score standardization: one posexplode
    partial-agg to D decimal-exact (n, Σx, Σx²) rows, baked as plan
    literals (D bounded by the model, the IVF-centroid justification), then
    a row-local normalize.  Exploded to (vec_id, dim, z) for the oracle
    hash; the operator's native output is the normalized array."""
    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    out = sim.normalize_embeddings_zscore(emb)
    return out.select(
        "vec_id", F.posexplode("normalized").alias("dim", "z")
    )


#: Decay rate for the 24h-half-life activity feature; repr-injected into the
#: oracle so both engines bake the IDENTICAL double literal.
import math as _math

_LAM_24H = _math.log(2.0) / 24.0


@query(
    "events_decayed_activity",
    oracle=f"""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    g AS (
      SELECT user_id,
             cast(floor(value * exp(-({_LAM_24H!r}) * (date_diff('microsecond', ts, m) / 3600000000.0))
                        * 1000000 + 0.5) AS decimal(38,0)) AS grid,
             date_diff('microsecond', ts, m) AS dmic
      FROM events, mx)
    SELECT user_id, cast(count(*) AS bigint) AS n_events,
           cast(sum(grid) AS double) / 1000000.0 AS decayed_score,
           floor(min(dmic) / 3600000000.0 * 1000000 + 0.5) / 1000000 AS hours_since_last
    FROM g GROUP BY 1
    """,
)
def events_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X46 recency-weighted activity feature: per-user sum of
    value·2^(-Δt/24h) to the corpus max timestamp plus hours-since-last --
    the classic feature-store rollup.  One single-row max-ts broadcast +
    one groupBy(user) shuffle; per-row decay terms are quantized onto a
    1e-6 integer grid BEFORE the exact decimal sum, because Java and glibc
    exp() differ at ulp level (measured: 867/10000 rows bitwise-different)
    and raw double sums would hash-diverge."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.decayed_activity(ev, half_life_hours=24.0)


@query(
    "curation_quality_deciles",
    oracle="""
    WITH pv AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
    cum AS (
      SELECT v, cast(sum(c) OVER (ORDER BY v ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS bigint) AS nbefore
      FROM pv),
    tot AS (SELECT cast(sum(c) AS bigint) AS total FROM pv)
    SELECT d.doc_id, d.n_chars AS value,
           cast(least(9, floor(10 * nbefore / total)) AS int) AS bin
    FROM documents d JOIN cum ON cum.v = d.n_chars, tot
    """,
)
def curation_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X47 curriculum binning: each document's decile of n_chars, via the
    histogram-threshold plan (per-value counts -> tiny running sum ->
    broadcast join back) -- the global-ntile() answer would funnel the
    corpus through ONE window task; this shape never materializes more
    than the distinct-value table in a single place.  Ties share a bin,
    so assignment is deterministic at any partitioning."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.value_deciles(docs, "n_chars", "doc_id", n_bins=10)


@query(
    "dedup_winnow_clusters",
    oracle=_WINNOW_CTE.replace("WITH t AS", "WITH RECURSIVE t AS")
    + """
    , e AS (SELECT doc_id AS id, unnest(fingerprints) AS fp FROM w),
    small AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 200),
    ee AS (SELECT e.id, e.fp FROM e JOIN small USING (fp)),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
      FROM ee a JOIN ee b ON a.fp = b.fp AND a.id < b.id
      GROUP BY 1, 2 HAVING count(*) >= 2),
    gs AS (
      SELECT doc_id, CASE WHEN len(tk) >= 5 THEN
        list_distinct(list_transform(range(1, len(tk) - 4 + 1), i ->
          md5(array_to_string(list_slice(tk, i, i + 4), ' '))))
      ELSE [] END AS grams FROM t),
    vp AS (
      SELECT c.id_a, c.id_b,
             len(list_filter(ga.grams, x -> list_contains(gb.grams, x))) AS ninter,
             len(ga.grams) + len(gb.grams) AS tot
      FROM cand c JOIN gs ga ON ga.doc_id = c.id_a JOIN gs gb ON gb.doc_id = c.id_b),
    vpairs AS (
      SELECT id_a, id_b FROM vp
      WHERE tot - ninter > 0
        AND floor(cast(ninter AS double) / (tot - ninter) * 1000000 + 0.5) / 1000000 >= 0.2),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM vpairs
      UNION SELECT id_b, id_a FROM vpairs),
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM t
      UNION
      SELECT e2.dst, r.lab FROM reach r JOIN edges e2 ON e2.src = r.node),
    canon AS (SELECT node AS doc_id, min(lab) AS canonical_id FROM reach GROUP BY 1)
    SELECT doc_id, canonical_id,
           cast(count(*) OVER (PARTITION BY canonical_id) AS bigint) AS cluster_size
    FROM canon
    """,
)
def dedup_winnow_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43 end-to-end: winnow fingerprints -> bucket-capped candidates ->
    exact-Jaccard verify -> connected components -> (doc, canonical,
    cluster_size).  The full fingerprint-dedup pipeline as one declared
    query; the oracle rebuilds the clustering with a recursive CTE
    (min-reachable-id == the min-label fixpoint of cluster_canonical)."""
    docs = _docs(spark, sf_dir)
    fps = tx.winnow_fingerprints(docs, "text", "doc_id", k=5, window=4)
    cand = tx.winnow_candidates(fps, "doc_id", min_shared=2, max_bucket_size=200)
    pairs = tx.winnow_verify(docs, "text", "doc_id", cand, k=5, min_jaccard=0.2)
    canon = dd.cluster_canonical(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    )
    sizes = canon.groupBy("canonical_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return canon.join(sizes, "canonical_id").select(
        "doc_id", "canonical_id", "cluster_size"
    )


@query(
    "events_mad_by_type",
    oracle="""
    WITH med AS (
      SELECT event_type,
             quantile_cont(CASE WHEN NOT (value IS NULL OR isnan(value) OR abs(value) > 1e308)
                                THEN value END, 0.5) AS m,
             count(*) AS n
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, med.n, med.m,
             CASE WHEN NOT (e.value IS NULL OR isnan(e.value) OR abs(e.value) > 1e308)
                  THEN abs(e.value - med.m) END AS ad
      FROM events e JOIN med ON e.event_type IS NOT DISTINCT FROM med.event_type)
    SELECT event_type, cast(n AS bigint) AS n,
           floor(m * 1000000 + 0.5) / 1000000 AS median,
           floor(quantile_cont(ad, 0.5) * 1000000 + 0.5) / 1000000 AS mad
    FROM dev GROUP BY 1, 2, 3
    """,
)
def events_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X48 robust monitoring stats: exact median + MAD of events.value per
    event_type.  Two |groups|-row aggregations (exact percentile, then the
    deviation pass against the broadcast medians) -- the outlier-resistant
    pair a monitor wants where mean/stddev would be blown up by the very
    anomalies it hunts."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.robust_stats_by_group(ev, "event_type", "value")


@query(
    "events_cohort_retention",
    oracle="""
    WITH fs AS (
      SELECT user_id, min(cast(ts AS date)) AS cohort_day FROM events GROUP BY 1)
    SELECT cast(fs.cohort_day AS varchar) AS cohort_day,
           date_diff('day', fs.cohort_day, cast(e.ts AS date)) AS day_offset,
           cast(count(DISTINCT e.user_id) AS bigint) AS n_active_users
    FROM events e JOIN fs ON fs.user_id = e.user_id
    GROUP BY fs.cohort_day, date_diff('day', fs.cohort_day, cast(e.ts AS date))
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X49 cohort-retention matrix: distinct active users per (first-seen
    day, day offset).  Two same-key user shuffles + one (cohort, offset)
    partial agg whose cardinality is days-squared, never events."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.cohort_retention(ev)


@query(
    "events_outliers_robust",
    oracle="""
    WITH med AS (
      SELECT event_type,
             quantile_cont(CASE WHEN NOT (value IS NULL OR isnan(value) OR abs(value) > 1e308)
                                THEN value END, 0.5) AS m,
             count(*) AS n
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, med.n, med.m,
             CASE WHEN NOT (e.value IS NULL OR isnan(e.value) OR abs(e.value) > 1e308)
                  THEN abs(e.value - med.m) END AS ad
      FROM events e JOIN med ON e.event_type IS NOT DISTINCT FROM med.event_type),
    st AS (
      SELECT event_type,
             floor(m * 1000000 + 0.5) / 1000000 AS median,
             floor(quantile_cont(ad, 0.5) * 1000000 + 0.5) / 1000000 AS mad
      FROM dev GROUP BY 1, m)
    SELECT e.event_id, e.event_type, e.value, st.median, st.mad,
           CASE WHEN e.value IS NOT NULL AND (isnan(e.value) OR abs(e.value) > 1e308) THEN NULL
                WHEN st.mad > 0 THEN
             floor(abs(e.value - st.median) / st.mad * 1000000 + 0.5) / 1000000
           END AS robust_z
    FROM events e JOIN st ON e.event_type IS NOT DISTINCT FROM st.event_type
    WHERE CASE WHEN e.value IS NOT NULL AND (isnan(e.value) OR abs(e.value) > 1e308) THEN TRUE
               WHEN st.mad > 0 THEN abs(e.value - st.median) > 3.0 * st.mad
               ELSE abs(e.value - st.median) > 0 END
    """,
)
def events_outliers_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X48b robust anomaly flagging: events whose value deviates from the
    per-type median by more than 3 MADs (modified z-score rule) -- the
    monitoring cut mean/stddev cannot make because the anomalies inflate
    it.  The |groups|-row stat table broadcasts; flagging is row-local;
    thresholds compare ROUNDED stats so both engines cut identically."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.robust_outliers(ev, "event_type", "value", "event_id", k=3.0)


@query(
    "sample_per_group_reservoir",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             cast(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('rs0:' || cast(doc_id AS varchar)) ASC, doc_id ASC
             ) AS int) AS draw_rank
      FROM documents)
    SELECT doc_id, lang, draw_rank FROM r WHERE draw_rank <= 30
    """,
)
def sample_per_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X50 exact k-per-group uniform sample (30 docs per language) by
    md5-draw ranking -- deterministic, re-dealable by salt, and the
    row_number<=k shape compiles to WindowGroupLimit so each map task
    pre-prunes to k rows per group before the shuffle (plan-asserted in
    tests); the distributed replacement for driver-side reservoir
    sampling."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.per_group_sample(docs, "lang", "doc_id", k=30).select(
        "doc_id", "lang", "draw_rank"
    )


@query(
    "curation_target_mix",
    oracle="""
    WITH tgt AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.3), ('fr', 0.2)) v(lang, t)),
    counts AS (
      SELECT d.lang, count(*) AS n, any_value(t.t) AS t
      FROM documents d JOIN tgt t ON d.lang IS NOT DISTINCT FROM t.lang
      GROUP BY 1),
    nk AS (SELECT min(n / t) AS nk FROM counts),
    rates AS (
      SELECT lang, floor(least(1.0, t * nk / n) * 1000000 + 0.5) / 1000000 AS keep_rate
      FROM counts, nk)
    SELECT d.doc_id, d.lang, r.keep_rate
    FROM documents d JOIN rates r ON d.lang IS NOT DISTINCT FROM r.lang
    WHERE cast(('0x' || substr(md5('m0:' || cast(d.doc_id AS varchar)), 1, 6)) AS bigint)
          < cast(floor(keep_rate * 16777216) AS bigint)
    """,
)
def curation_target_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X51 explicit-proportion mixture rebalance (50% en / 30% de / 20% fr):
    keeps the LARGEST corpus with exactly those shares (binding domain at
    100%), domains outside the spec dropped.  One count agg + broadcast
    rates + md5-draw membership -- no corpus shuffle, reproducible."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    out = cu.target_mix_resample(
        docs, "lang", "doc_id", {"en": 0.5, "de": 0.3, "fr": 0.2}
    )
    return out.select("doc_id", "lang", "keep_rate")


@query(
    "pack_sequences_sharded",
    oracle="""
    WITH b AS (
      SELECT doc_id, cast(n_chars AS bigint) AS n_tokens,
             md5('p0:' || cast(doc_id AS varchar)) AS draw,
             cast(cast(('0x' || substr(md5('p0:' || cast(doc_id AS varchar)), 1, 6)) AS bigint) % 8 AS int) AS shard
      FROM documents WHERE cast(n_chars AS bigint) > 0),
    c AS (
      SELECT doc_id, shard, n_tokens,
             cast(sum(n_tokens) OVER (PARTITION BY shard ORDER BY draw, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS bigint) AS nbefore
      FROM b)
    SELECT doc_id, shard, n_tokens,
           cast(floor(nbefore / 2048) AS int) AS pack_id,
           cast(nbefore % 2048 AS int) AS offset_in_pack
    FROM c
    """,
)
def pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X52 pretraining sequence packing: concatenate-and-cut into 2048-token
    contexts, SHARDED so the running-offset window partitions by an md5
    hash shard instead of funnelling the corpus through one task; exporter
    order (shard, pack_id, offset) reproduces the exact stream."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.pack_sequences_sharded(
        docs, "n_chars", "doc_id", context_len=2048, n_shards=8
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
      FROM events GROUP BY 1),
    c AS (
      SELECT cast(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n0,
             cast(sum(CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN 1 ELSE 0 END) AS bigint) AS n1,
             cast(sum(CASE WHEN t0 IS NOT NULL AND t1 > t0 AND t2 > t1 THEN 1 ELSE 0 END) AS bigint) AS n2
      FROM f)
    SELECT * FROM (
      SELECT 1 AS step_index, 'view' AS step, n0 AS n_users,
             floor(cast(n0 AS double) / n0 * 1000000 + 0.5) / 1000000 AS conversion_rate FROM c
      UNION ALL
      SELECT 2, 'click', n1, floor(cast(n1 AS double) / n0 * 1000000 + 0.5) / 1000000 FROM c
      UNION ALL
      SELECT 3, 'purchase', n2, floor(cast(n2 AS double) / n0 * 1000000 + 0.5) / 1000000 FROM c)
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X53 ordered funnel (view -> click -> purchase): per-user first
    occurrences as conditional mins in ONE user-keyed pass, order predicate
    row-local, tiny rollup -- no self-joins or windows at any scale."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.funnel_conversion(ev, ["view", "click", "purchase"])


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents),
    stats AS (SELECT count(*) AS n_docs, sum(len(tk)) AS sum_dl FROM t),
    qp AS (SELECT * FROM (VALUES
      ('0', 'hash'), ('0', 'join'),
      ('1', 'window'), ('1', 'sort'),
      ('2', 'vector'), ('2', 'scan')) AS v(query_id, term)),
    tf AS (
      SELECT doc_id, len(tk) AS dl, w AS term, count(*) AS tf
      FROM (SELECT doc_id, tk, unnest(tk) AS w FROM t)
      WHERE w IN (SELECT DISTINCT term FROM qp)
      GROUP BY 1, 2, 3),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT qp.query_id, tf.doc_id,
             cast(
               ln((cast(n_docs AS double) - cast(df AS double) + 0.5)
                  / (cast(df AS double) + 0.5) + 1.0)
               * (cast(tf AS double) * (1.2 + 1.0)
                  / (cast(tf AS double) + 1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS double)
                     / (cast(sum_dl AS double) / cast(n_docs AS double)))))
             AS decimal(28,12)) AS c
      FROM tf JOIN qp ON qp.term = tf.term JOIN dft ON dft.term = tf.term, stats),
    bm AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               floor(cast(sum(c) AS double) * 1000000 + 0.5) / 1000000 DESC, doc_id) AS rank
      FROM contrib GROUP BY 1, 2),
    qv AS (SELECT vec_id AS qid, embedding AS v FROM embeddings WHERE vec_id < 3),
    vp AS (
      SELECT cast(qv.qid AS varchar) AS query_id, c.vec_id AS doc_id,
        floor(
          cast(list_sum(list_transform(qv.v, (x, i) -> cast(cast(x AS double) * cast(c.embedding[i] AS double) AS decimal(28,12)))) AS double)
          / (sqrt(cast(list_sum(list_transform(qv.v, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double))
             * sqrt(cast(list_sum(list_transform(c.embedding, x -> cast(cast(x AS double) * cast(x AS double) AS decimal(28,12)))) AS double)))
          * 1000000 + 0.5) / 1000000 AS cosine
      FROM qv, embeddings c WHERE qv.qid != c.vec_id),
    vr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rank
      FROM vp),
    unioned AS (
      SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM bm WHERE rank <= 10
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM vr WHERE rank <= 10),
    fused AS (
      SELECT query_id, doc_id,
             floor(sum(c) * 1000000000 + 0.5) / 1000000000 AS rrf_score,
             cast(count(*) AS int) AS n_sources
      FROM unioned GROUP BY 1, 2),
    out AS (
      SELECT query_id, doc_id, rrf_score, n_sources,
             cast(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS int) AS rank
      FROM fused)
    SELECT * FROM out WHERE rank <= 10
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X54 hybrid search: BM25 over documents + brute-force cosine over the
    aligned embeddings (doc_id = vec_id), fused per query with reciprocal
    rank fusion -- the production default because RRF compares ranks, never
    raw scores across modalities.  Only |panel|*k rows move after the two
    retrievers; fusion is one union + tiny groupBy + windowed top-k."""
    apply_runtime_conf(spark)
    docs = _docs(spark, sf_dir)
    emb = star.table(spark, sf_dir, "embeddings")
    panel = [("0", ["hash", "join"]), ("1", ["window", "sort"]), ("2", ["vector", "scan"])]
    lex = tx.bm25_topk(docs, "text", "doc_id", panel, topk=10)
    vec = (
        sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=10)
        .select(
            F.col("query_id").cast("string").alias("query_id"),
            F.col("cand_id").alias("doc_id"),
            F.col("rnk").alias("rank"),
        )
    )
    return sim.hybrid_rrf(lex.select("query_id", "doc_id", "rank"), vec, topk=10)


@query(
    "text_hard_negatives",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents),
    stats AS (SELECT count(*) AS n_docs, sum(len(tk)) AS sum_dl FROM t),
    qp AS (SELECT * FROM (VALUES
      ('q_hash', 'hash'), ('q_hash', 'join'),
      ('q_scan', 'scan'), ('q_scan', 'vector')) AS v(query_id, term)),
    pos AS (SELECT * FROM (VALUES ('q_hash', 0), ('q_hash', 3), ('q_scan', 1)) AS v(query_id, doc_id)),
    tf AS (
      SELECT doc_id, len(tk) AS dl, w AS term, count(*) AS tf
      FROM (SELECT doc_id, tk, unnest(tk) AS w FROM t)
      WHERE w IN (SELECT DISTINCT term FROM qp)
      GROUP BY 1, 2, 3),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT qp.query_id, tf.doc_id,
             cast(
               ln((cast(n_docs AS double) - cast(df AS double) + 0.5)
                  / (cast(df AS double) + 0.5) + 1.0)
               * (cast(tf AS double) * (1.2 + 1.0)
                  / (cast(tf AS double) + 1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS double)
                     / (cast(sum_dl AS double) / cast(n_docs AS double)))))
             AS decimal(28,12)) AS c
      FROM tf JOIN qp ON qp.term = tf.term JOIN dft ON dft.term = tf.term, stats),
    scored AS (
      SELECT query_id, doc_id,
             floor(cast(sum(c) AS double) * 1000000 + 0.5) / 1000000 AS score
      FROM contrib GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, doc_id, score,
             cast(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS int) AS bm25_rank
      FROM scored),
    cand AS (
      SELECT r.* FROM ranked r
      WHERE bm25_rank <= 50
        AND NOT EXISTS (SELECT 1 FROM pos p WHERE p.query_id = r.query_id AND p.doc_id = r.doc_id)),
    negs AS (
      SELECT query_id, doc_id, bm25_rank, score,
             cast(row_number() OVER (PARTITION BY query_id ORDER BY bm25_rank) AS int) AS neg_rank
      FROM cand)
    SELECT query_id, doc_id, bm25_rank, score, neg_rank FROM negs WHERE neg_rank <= 5
    """,
)
def text_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X55 DPR-style hard-negative mining: top BM25 hits that are not the
    labeled positives, re-ranked to the first 5 per query -- the
    contrastive-training data prep step; everything after retrieval
    touches |panel|*k rows."""
    docs = _docs(spark, sf_dir)
    panel = [
        ("q_hash", ["hash", "join"], [0, 3]),
        ("q_scan", ["scan", "vector"], [1]),
    ]
    return tx.mine_hard_negatives(
        docs, "text", "doc_id", panel, k_candidates=50, n_negatives=5
    )


@query(
    "text_langid_eval",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split({_NORM}, ' ') AS tk FROM documents),
    h AS (
      SELECT doc_id, lang,
             len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','a','for'], x))) AS he,
             len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS hd,
             len(list_filter(tk, x -> list_contains(['le','la','les','et','est','un','une','des'], x))) AS hf
      FROM t),
    g AS (
      SELECT lang AS actual_lang,
             CASE WHEN greatest(he, hd, hf) = 0 THEN 'unknown'
                  WHEN he = greatest(he, hd, hf) THEN 'en'
                  WHEN hd = greatest(he, hd, hf) THEN 'de'
                  ELSE 'fr' END AS guessed_lang
      FROM h)
    SELECT actual_lang, guessed_lang, cast(count(*) AS bigint) AS n
    FROM g GROUP BY 1, 2
    """,
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 self-eval: confusion matrix of the stopword language-ID heuristic
    against the labeled lang column -- languages WITHOUT a stopword list
    (zh/es in the fixture) surface as 'unknown'/misses instead of
    vanishing, which is exactly what a coverage report must show.  The
    guess tie-break matches the operator's when-chain order (en, de, fr)."""
    docs = _docs(spark, sf_dir)
    scored = tx.language_scores(docs, "text", "doc_id")
    return (
        docs.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(scored.select("doc_id", F.col("lang_guess").alias("guessed_lang")), "doc_id")
        .groupBy("actual_lang", "guessed_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "text_normalize_unicode",
    oracle="""
    SELECT doc_id,
           regexp_replace(nfc_normalize(text), '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g') AS norm_text,
           regexp_replace(nfc_normalize(text), '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g') IS DISTINCT FROM text AS changed
    FROM documents
    """,
)
def text_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56 unicode step-0: NFC composition (Arrow pandas UDF over
    ``unicodedata`` -- the standard defines a unique result, so DuckDB's
    utf8proc twin hash-matches) + C0/DEL control stripping (JVM regexp),
    with a changed flag for audit."""
    docs = _docs(spark, sf_dir)
    return tx.normalize_unicode(docs, "text", "doc_id")


@query("text_compression_ratio")
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X57 compression-ratio quality signal: deflate(bytes)/bytes per doc
    (low = looping boilerplate, ~1 = junk).  Map-only Arrow pass; rows-only
    (deflate length is zlib-build-dependent), monotonicity pytest-pinned."""
    docs = _docs(spark, sf_dir)
    return tx.compression_ratio_scores(docs, "text", "doc_id")


@query(
    "curation_importance_weights",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, lang = 'en' AS t, unnest(string_split({_NORM}, ' ')) AS w
      FROM documents),
    fb AS (
      SELECT doc_id, t, cast(('0x' || substr(md5(w), 1, 8)) AS bigint) % 1024 AS b
      FROM f WHERE length(w) > 0),
    dist AS (
      SELECT b, count(*) AS n_raw, sum(CASE WHEN t THEN 1 ELSE 0 END) AS n_tgt
      FROM fb GROUP BY 1),
    tot AS (SELECT sum(n_raw) AS tr, sum(n_tgt) AS tt FROM dist),
    lr AS (
      SELECT b, ln((n_tgt + 1) / (tt + 1024.0)) - ln((n_raw + 1) / (tr + 1024.0)) AS lrv
      FROM dist, tot),
    pd AS (
      SELECT fb.doc_id, count(*) AS n_feats,
             floor(cast(sum(cast(lrv AS DECIMAL(28,12))) AS double) * 1000000 + 0.5)
               / 1000000 AS weight
      FROM fb JOIN lr USING (b) GROUP BY 1)
    SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
           coalesce(weight, 0.0) AS weight
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def curation_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X58 DSIR importance weights (Xie et al. 2023): log-ratio of hashed
    unigram multinomials, target = lang='en' exemplars — score how
    target-like each raw doc is, for importance resampling.  One
    1024-bucket distribution aggregate (broadcast back), one doc-key
    shuffle; per-doc log sums decimal-accumulated (psi_drift pattern)."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.importance_weights(
        docs, "text", "doc_id", F.col("lang") == "en", n_buckets=1024
    )


@query(
    "split_stratified",
    oracle="""
    SELECT doc_id, lang AS stratum,
           CASE WHEN r <= floor(0.8 * n + 0.5) THEN 'train'
                WHEN r <= floor(0.9000000000000001 * n + 0.5) THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY cast(('0x' || substr(md5('strat0:' || cast(doc_id AS varchar)), 1, 8)) AS bigint),
                        doc_id) AS r,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    """,
)
def split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X59 stratified split by language: exact 80/10/10 within every
    stratum via md5-draw ranking (the 0.9000000000000001 literal IS the
    IEEE double 0.8+0.1 the Spark side computes — spelling it 0.9 would
    flip boundary rows).  One stratum shuffle + sort; expectation-only
    hash-draw (leakage_safe_split) is the web-scale-strata alternative."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.stratified_split(docs, "doc_id", "lang", train=0.8, val=0.1)


@query(
    "curation_quality_quantile_norm",
    oracle="""
    SELECT doc_id, lang AS "group", n_chars AS value,
           floor(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
                 * 1000000 + 0.5) / 1000000 AS quantile
    FROM documents
    """,
)
def curation_quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X60 within-group quantile normalization: percent_rank of doc length
    inside each language — the cross-group score calibration that turns
    "top 30% per language" into one filter.  Ties share a rank (standard
    percent_rank, engine-identical); one group shuffle + sort."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.quantile_normalize(docs, "n_chars", "lang", "doc_id")


@query(
    "text_token_stats_by_source",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest(string_split({_NORM}, ' ')) AS w FROM documents),
    pw AS (
      SELECT source, count(*) AS n_tokens, count(DISTINCT w) AS n_vocab
      FROM w WHERE length(w) > 0 GROUP BY 1),
    pd AS (
      SELECT source, count(*) AS n_docs, sum(length(text)) AS n_chars
      FROM documents GROUP BY 1)
    SELECT pd.source AS "group", cast(n_docs AS bigint) AS n_docs,
           cast(coalesce(n_tokens, 0) AS bigint) AS n_tokens,
           cast(coalesce(n_vocab, 0) AS bigint) AS n_vocab,
           cast(n_chars AS bigint) AS n_chars,
           CASE WHEN coalesce(n_tokens, 0) > 0
                THEN floor(cast(n_vocab AS double) / n_tokens * 1000000 + 0.5) / 1000000
           END AS type_token_ratio,
           CASE WHEN n_docs > 0
                THEN floor(cast(coalesce(n_tokens, 0) AS double) / n_docs * 1000000 + 0.5) / 1000000
           END AS tokens_per_doc,
           CASE WHEN coalesce(n_tokens, 0) > 0
                THEN floor(cast(n_chars AS double) / n_tokens * 1000000 + 0.5) / 1000000
           END AS chars_per_token
    FROM pd LEFT JOIN pw USING (source)
    """,
)
def text_token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X61 per-source corpus datasheet: docs, tokens, vocabulary,
    type/token ratio, tokens/doc, chars/token — the numbers a mix designer
    reads before weighting sources.  One explode + two aggregates; ratios
    from exact integer sums."""
    docs = _docs(spark, sf_dir)
    return tx.token_stats_by_group(docs, "text", "source")


@query(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH g AS (
      SELECT sha256({_NORM}) AS h, count(*) AS n_copies
      FROM documents GROUP BY 1),
    s AS (
      SELECT n_copies AS cluster_size, count(*) AS n_clusters FROM g GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM documents)
    SELECT cast(cluster_size AS bigint) AS cluster_size,
           cast(n_clusters AS bigint) AS n_clusters,
           cast(cluster_size * n_clusters AS bigint) AS n_docs,
           floor(cast(cluster_size * n_clusters AS double) / tot.n * 1000000 + 0.5)
             / 1000000 AS corpus_share
    FROM s, tot
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X62 duplication profile: exact-dup cluster-size distribution with
    corpus share — "how much is copies, twins or megaclusters?".  The
    exact-dedup hash aggregate plus a tiny histogram reduce."""
    docs = _docs(spark, sf_dir)
    return dd.cluster_size_histogram(docs, "text", "doc_id")


@query(
    "events_burst_zscore",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts, count(*) AS n_events
      FROM events GROUP BY 1, 2),
    b AS (
      SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
      FROM events),
    axis AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts FROM b),
    ty AS (SELECT DISTINCT event_type FROM events),
    dense AS (
      SELECT ty.event_type, axis.bucket_ts, coalesce(c.n_events, 0) AS n_events
      FROM ty CROSS JOIN axis
      LEFT JOIN c ON c.event_type = ty.event_type AND c.bucket_ts = axis.bucket_ts),
    st AS (
      SELECT event_type, count(*) AS nb, sum(n_events) AS s,
             sum(n_events * n_events) AS ss
      FROM dense GROUP BY 1),
    z AS (
      SELECT d.event_type, d.bucket_ts, d.n_events,
             cast(s AS double) / nb AS mean,
             sqrt(greatest(cast(ss AS double) / nb
                           - (cast(s AS double) / nb) * (cast(s AS double) / nb),
                           0.0)) AS std
      FROM dense d JOIN st USING (event_type))
    SELECT event_type, bucket_ts, cast(n_events AS bigint) AS n_events,
           CASE WHEN std > 0
                THEN floor((n_events - mean) / std * 1000000 + 0.5) / 1000000
           END AS z_score,
           coalesce(CASE WHEN std > 0
                         THEN floor((n_events - mean) / std * 1000000 + 0.5) / 1000000
                    END >= 2.0, false) AS is_burst
    FROM z
    """,
)
def events_burst_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X63 rate-burst detection: per-type hourly counts on a DENSE time
    axis (missing hours are real zeros), z-scored against the type's own
    mean/std from explicit integer sum/sum-of-squares (not the engines'
    stddev builtins).  Reduce side is |types|x|hours| rows, never events."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.burst_detection(ev)


@query(
    "dedup_dup_rate_by_source",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, sha256({_NORM}) AS h FROM documents),
    g AS (
      SELECT sha256({_NORM}) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY 1)
    SELECT source AS "group", cast(count(*) AS bigint) AS n_docs,
           cast(sum(CASE WHEN n_copies >= 2 AND doc_id != keep_id THEN 1 ELSE 0 END)
                AS bigint) AS n_dropped,
           floor(cast(sum(CASE WHEN n_copies >= 2 AND doc_id != keep_id THEN 1 ELSE 0 END)
                      AS double) / count(*) * 1000000 + 0.5) / 1000000 AS dup_rate
    FROM t JOIN g USING (h) GROUP BY 1
    """,
)
def dedup_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X64 dedup attribution: per-source duplicate rates (what exact dedup
    would drop, charged to the dropped copy's source).  Annotate-back join
    on the content hash the dedup aggregate already partitioned on — the
    cluster table is corpus-sized, deliberately NOT broadcast."""
    docs = _docs(spark, sf_dir)
    return dd.dup_rate_by_group(docs, "text", "doc_id", "source")


@query(
    "embedding_qc",
    oracle=f"""
    SELECT vec_id,
           cast(CASE WHEN embedding IS NULL THEN 0 ELSE len(embedding) END AS int) AS dim,
           cast(CASE WHEN embedding IS NULL THEN 0
                ELSE len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e308))
                END AS int) AS n_nonfinite,
           CASE WHEN embedding IS NULL
                     OR len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e308)) > 0
                THEN NULL
                ELSE floor(sqrt(list_reduce(
                       list_transform(embedding, x -> cast(x AS double) * cast(x AS double)),
                       (a, b) -> a + b)) * 1000000 + 0.5) / 1000000
           END AS norm,
           embedding IS NULL AS is_null,
           embedding IS NOT NULL AND len(embedding) != {_ANN_DIM} AS bad_dim,
           embedding IS NOT NULL
             AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e308)) > 0
             AS has_nonfinite,
           coalesce(embedding IS NOT NULL
             AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e308)) = 0
             AND (floor(sqrt(list_reduce(
                    list_transform(embedding, x -> cast(x AS double) * cast(x AS double)),
                    (a, b) -> a + b)) * 1000000 + 0.5) / 1000000 < 0.000001
                  OR floor(sqrt(list_reduce(
                       list_transform(embedding, x -> cast(x AS double) * cast(x AS double)),
                       (a, b) -> a + b)) * 1000000 + 0.5) / 1000000 > 1000000.0),
             false) AS bad_norm,
           coalesce(embedding IS NOT NULL AND len(embedding) = {_ANN_DIM}
             AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e308)) = 0
             AND NOT (floor(sqrt(list_reduce(
                        list_transform(embedding, x -> cast(x AS double) * cast(x AS double)),
                        (a, b) -> a + b)) * 1000000 + 0.5) / 1000000 < 0.000001
                      OR floor(sqrt(list_reduce(
                           list_transform(embedding, x -> cast(x AS double) * cast(x AS double)),
                           (a, b) -> a + b)) * 1000000 + 0.5) / 1000000 > 1000000.0),
             false) AS ok
    FROM embeddings
    """,
)
def embedding_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X65 embedding QC gate: flag NULL / wrong-dim / non-finite /
    degenerate-norm vectors before any index build (one poisoned vector in
    an IVF training sample skews every centroid).  Map-only row-local
    array expressions; norm² folds in array order so it is
    engine-identical without decimal machinery."""
    apply_runtime_conf(spark)
    emb = star.table(spark, sf_dir, "embeddings")
    return sim.embedding_qc(emb, "embedding", "vec_id", expected_dim=_ANN_DIM)


@query(
    "events_bootstrap_ci",
    oracle="""
    WITH src AS (
      SELECT event_type AS g, cast(value AS double) AS v,
             cast(event_id AS varchar) AS id
      FROM events WHERE value IS NOT NULL),
    base AS (
      SELECT g, v, (j * 8 + i) AS b,
             cast(('0x' || substr(md5('boot0:' || cast(j AS varchar) || ':' || id),
                                  i * 4 + 1, 4)) AS bigint) AS draw
      FROM src,
           (SELECT unnest(generate_series(0, 6)) AS j),
           (SELECT unnest(generate_series(0, 7)) AS i)
      WHERE j * 8 + i < 50),
    drawn AS (SELECT g, v, b FROM base WHERE draw < 32768),
    rep AS (
      SELECT g, b,
             floor(cast(sum(cast(v AS DECIMAL(28,12))) AS double) / count(*)
                   * 1000000000 + 0.5) / 1000000000 AS m
      FROM drawn GROUP BY 1, 2),
    band AS (
      SELECT g, cast(count(*) AS int) AS n_replicates,
             floor(quantile_cont(m, 0.05) * 1000000 + 0.5) / 1000000 AS ci_lo,
             floor(quantile_cont(m, 0.95) * 1000000 + 0.5) / 1000000 AS ci_hi
      FROM rep GROUP BY 1),
    pt AS (
      SELECT g, floor(cast(sum(cast(v AS DECIMAL(28,12))) AS double) / count(v)
                      * 1000000 + 0.5) / 1000000 AS mean
      FROM src GROUP BY 1)
    SELECT pt.g AS "group", mean, ci_lo, ci_hi,
           coalesce(n_replicates, 0) AS n_replicates
    FROM pt LEFT JOIN band USING (g)
    """,
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X66 deterministic bootstrap CI of the per-type mean event value —
    the error bars a metric report needs before anyone acts on a delta.
    50 md5-seeded half-sample replicates generated map-side (explode of a
    literal sequence, no join); shuffle carries |types|x50 partial sums;
    replicate means decimal-accumulated, band = [5%, 95%] quantiles."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.bootstrap_ci(ev, "value", "event_type", "event_id")


@query(
    "text_strip_html",
    oracle=r"""
    WITH s AS (
      SELECT doc_id, length(text) AS n_raw_chars,
        trim(regexp_replace(
          replace(replace(replace(replace(replace(replace(replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(text, '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
                  '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
              '(?s)</?[a-zA-Z!][^>]*>', ' ', 'g'),
            '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
            '&quot;', '"'), '&#39;', chr(39)), '&apos;', chr(39)),
          '\s+', ' ', 'g')) AS clean_text,
        text AS raw FROM documents)
    SELECT doc_id, clean_text, cast(n_raw_chars AS bigint) AS n_raw_chars,
           cast(length(clean_text) AS bigint) AS n_clean_chars,
           clean_text IS DISTINCT FROM raw AS had_markup
    FROM s
    """,
)
def text_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67 HTML/boilerplate strip: script/style blocks, comments, tags,
    common entities, whitespace collapse — the crawl-to-text ingest step
    before any quality/dedup operator.  Chained JVM regexp_replace
    (row-local, codegen); patterns are RE2-compatible so the DuckDB twin
    runs them verbatim."""
    docs = _docs(spark, sf_dir)
    return tx.strip_html(docs, "text", "doc_id")


@query(
    "pack_efficiency_report",
    oracle="""
    WITH b AS (
      SELECT doc_id, cast(n_chars AS bigint) AS n_tokens,
             md5('p0:' || cast(doc_id AS varchar)) AS draw,
             cast(cast(('0x' || substr(md5('p0:' || cast(doc_id AS varchar)), 1, 6)) AS bigint) % 8 AS int) AS shard
      FROM documents WHERE cast(n_chars AS bigint) > 0),
    c AS (
      SELECT doc_id, shard, n_tokens,
             cast(sum(n_tokens) OVER (PARTITION BY shard ORDER BY draw, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS bigint) AS nbefore
      FROM b),
    agg AS (
      SELECT shard, count(*) AS n_docs, sum(n_tokens) AS total_tokens,
             sum(CASE WHEN (nbefore % 2048) + n_tokens > 2048 THEN 1 ELSE 0 END) AS n_straddling
      FROM c GROUP BY 1)
    SELECT shard, cast(n_docs AS bigint) AS n_docs,
           cast(total_tokens AS bigint) AS total_tokens,
           cast(floor((total_tokens - 1) / 2048) + 1 AS bigint) AS n_packs,
           floor(cast(total_tokens AS double)
                 / ((floor((total_tokens - 1) / 2048) + 1) * 2048) * 1000000 + 0.5)
             / 1000000 AS utilization,
           cast(n_straddling AS bigint) AS n_straddling
    FROM agg
    """,
)
def pack_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68 packing-efficiency report: per-shard utilization and
    boundary-straddle counts over the X52 packed stream — the number you
    read before choosing concatenate-and-cut vs document-boundary packing.
    One |shards|-row aggregate on top of the packing plan."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    packed = cu.pack_sequences_sharded(
        docs, "n_chars", "doc_id", context_len=2048, n_shards=8
    )
    return cu.packing_report(packed, context_len=2048)


@query(
    "curation_quantile_map",
    oracle="""
    WITH newt AS (
      SELECT event_id, cast(value AS double) AS value FROM events
      WHERE event_id % 2 = 1
        AND NOT (value IS NULL OR isnan(value) OR abs(value) > 1e308)),
    ref AS (
      SELECT cast(value AS double) AS v FROM events WHERE event_id % 2 = 0
        AND NOT (value IS NULL OR isnan(value) OR abs(value) > 1e308)),
    curve AS (
      SELECT quantile_cont(v, list_transform(range(0, 1001), i -> i / 1000.0)) AS q
      FROM ref),
    pr AS (
      SELECT event_id, value, percent_rank() OVER (ORDER BY value) AS p FROM newt)
    SELECT event_id, value,
           floor(p * 1000000 + 0.5) / 1000000 AS quantile,
           floor((q[cast(floor(p * 1000) AS int) + 1]
                  + (p * 1000 - floor(p * 1000))
                    * (q[least(cast(floor(p * 1000) AS int) + 2, 1001)]
                       - q[cast(floor(p * 1000) AS int) + 1]))
                 * 1000000 + 0.5) / 1000000 AS mapped_value
    FROM pr, curve
    """,
)
def curation_quantile_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X70 quantile mapping (CDF matching): calibrate the odd-id events'
    value distribution onto the even-id reference — mapped(x) =
    Q_ref(F_new(x)) via a 1001-point exact reference curve (one aggregate,
    single-row broadcast) and row-local interpolation."""
    from ..operators import curation as cu

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    new = ev.filter(F.col("event_id") % 2 == 1)
    ref = ev.filter(F.col("event_id") % 2 == 0)
    return cu.quantile_map(new, ref, "value", "event_id", grid=1000)


@query(
    "curation_temporal_split",
    oracle="""
    WITH cut AS (SELECT quantile_cont(epoch(ts), 0.8) AS c FROM events)
    SELECT event_id, ts,
           CASE WHEN epoch(ts) <= c THEN 'train'
                WHEN epoch(ts) > c + 86400.0 THEN 'test'
                ELSE 'embargo' END AS split
    FROM events, cut
    """,
)
def curation_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71 temporal split with a 1-day embargo: train <= the 0.8 timestamp
    quantile, test after cutoff+embargo, the gap rows flagged 'embargo' —
    the purged time-series split.  One quantile aggregate broadcast back;
    membership is row-local."""
    from ..operators import curation as cu

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return cu.temporal_split_embargo(
        ev, "ts", "event_id", train_frac=0.8, embargo_seconds=86400.0
    )


@query(
    "dedup_fuzzy_suppliers",
    oracle="""
    WITH s AS (
      SELECT s_suppkey, s_name, s_nationkey,
             count(*) OVER (PARTITION BY s_nationkey) AS bn
      FROM supplier),
    kept AS (SELECT * FROM s WHERE bn <= 1000)
    SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           a.s_nationkey AS block,
           cast(levenshtein(a.s_name, b.s_name) AS int) AS distance
    FROM kept a JOIN kept b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
)
def dedup_fuzzy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72 fuzzy entity matching: supplier-name candidate duplicates via a
    nation-blocked Levenshtein<=2 self-join (record linkage / master-data
    dedup).  Per-block quadratic with the LSH-style skew cap; levenshtein
    is a built-in on both engines."""
    apply_runtime_conf(spark)
    sup = star.table(spark, sf_dir, "supplier")
    return dd.fuzzy_pairs_by_block(
        sup, "s_name", "s_suppkey", "s_nationkey", max_distance=2
    )


@query(
    "sample_weighted_per_group",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             floor(ln((cast(('0x' || substr(md5('ws0:' || cast(doc_id AS varchar)), 1, 6))
                            AS bigint) + 1.0) / 16777217.0)
                   / cast(n_chars AS double) * 1000000000 + 0.5) / 1000000000 AS key
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id ASC) AS weight_rank
      FROM keyed)
    SELECT doc_id, lang, cast(n_chars AS bigint) AS n_chars, cast(weight_rank AS int) AS weight_rank
    FROM ranked WHERE weight_rank <= 5
    """,
)
def sample_weighted_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X74 weighted k-per-group sample (Efraimidis-Spirakis): 5 docs per
    language with inclusion probability proportional to length — the
    distributed one-pass weighted reservoir, grid-rounded keys for
    libm-proof cross-engine ranking; WindowGroupLimit map-side pruning."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    out = cu.weighted_per_group_sample(docs, "lang", "doc_id", "n_chars", k=5)
    return out.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("weight_rank").cast("int").alias("weight_rank"),
    )


@query(
    "text_vocabulary_overlap",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT source AS g, w FROM (
        SELECT source, unnest(string_split({_NORM}, ' ')) AS w FROM documents)
      WHERE length(w) > 0),
    sizes AS (SELECT g, count(*) AS n FROM w GROUP BY 1),
    inter AS (
      SELECT a.g AS group_a, b.g AS group_b, count(*) AS n_shared
      FROM w a JOIN w b ON a.w = b.w AND a.g < b.g
      GROUP BY 1, 2)
    SELECT group_a, group_b, cast(n_shared AS bigint) AS n_shared,
           cast(sa.n AS bigint) AS n_vocab_a, cast(sb.n AS bigint) AS n_vocab_b,
           floor(cast(n_shared AS double) / (sa.n + sb.n - n_shared) * 1000000 + 0.5)
             / 1000000 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = inter.group_a
    JOIN sizes sb ON sb.g = inter.group_b
    """,
)
def text_vocabulary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X75 cross-source vocabulary redundancy matrix: pairwise Jaccard of
    per-source distinct-word vocabularies via the inverted-index self-join
    (keyed on the WORD — carries group lists, never documents)."""
    docs = _docs(spark, sf_dir)
    return tx.vocabulary_overlap(docs, "text", "source")


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events),
    pairs AS (
      SELECT from_type, to_type, count(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
    totals AS (
      SELECT from_type, sum(n_transitions) AS row_n FROM pairs GROUP BY 1)
    SELECT p.from_type, p.to_type, cast(n_transitions AS bigint) AS n_transitions,
           floor(cast(n_transitions AS double) / row_n * 1000000 + 0.5) / 1000000
             AS probability
    FROM pairs p JOIN totals USING (from_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X76 first-order Markov transition matrix over per-user event
    streams: one user-keyed window shuffle (lead), a |types|^2 aggregate,
    probabilities from exact integer counts."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.transition_matrix(ev)


@query(
    "events_survival_curve",
    oracle="""
    WITH u AS (
      SELECT user_id, min(epoch(ts)) AS f, max(epoch(ts)) AS l
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
    e AS (SELECT max(epoch(ts)) AS endp
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    lu AS (
      SELECT floor((l - f) / 3600.0 * 1000000 + 0.5) / 1000000 AS lifetime_h,
             (endp - l) / 3600.0 > 24.0 AS churned
      FROM u, e),
    hist AS (SELECT lifetime_h, count(*) AS c FROM lu GROUP BY 1),
    below AS (
      SELECT lifetime_h,
             sum(c) OVER (ORDER BY lifetime_h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS b
      FROM hist),
    tot AS (SELECT count(*) AS n FROM lu),
    deaths AS (SELECT lifetime_h, count(*) AS d FROM lu WHERE churned GROUP BY 1),
    curve AS (
      SELECT d.lifetime_h, d.d, (tot.n - below.b) AS n_at_risk,
             CASE WHEN d.d < (tot.n - below.b)
                  THEN cast(ln(1.0 - cast(d.d AS double) / (tot.n - below.b))
                            AS decimal(28,12)) END AS lnv
      FROM deaths d JOIN below ON d.lifetime_h = below.lifetime_h, tot)
    SELECT lifetime_h, cast(d AS bigint) AS d, cast(n_at_risk AS bigint) AS n_at_risk,
           CASE WHEN d >= n_at_risk THEN 0.0 ELSE
           floor(exp(cast(sum(lnv) OVER (ORDER BY lifetime_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double))
                 * 1000000 + 0.5) / 1000000 END AS survival
    FROM curve
    """,
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X77 Kaplan-Meier retention estimate over user lifetimes (24h churn
    horizon, right-censored users excluded from deaths but kept at risk):
    one per-user aggregate, then everything runs on the |users|-reduced
    table; the cumulative product is a log-domain window over |distinct
    lifetimes| rows."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.survival_curve(ev, horizon_hours=24.0)


@query(
    "events_ab_test",
    oracle="""
    WITH s AS (
      SELECT event_type AS g,
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b,
             sum(cast(CASE WHEN user_id % 2 = 0 THEN cast(value AS double)
                      ELSE 0.0 END AS DECIMAL(28,8))) AS sa,
             sum(cast(CASE WHEN user_id % 2 = 1 THEN cast(value AS double)
                      ELSE 0.0 END AS DECIMAL(28,8))) AS sb,
             sum(cast(CASE WHEN user_id % 2 = 0
                      THEN cast(value AS double) * cast(value AS double)
                      ELSE 0.0 END AS DECIMAL(28,8))) AS ssa,
             sum(cast(CASE WHEN user_id % 2 = 1
                      THEN cast(value AS double) * cast(value AS double)
                      ELSE 0.0 END AS DECIMAL(28,8))) AS ssb
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    m AS (
      SELECT g, n_a, n_b,
             cast(sa AS double) / n_a AS ma, cast(sb AS double) / n_b AS mb,
             (cast(ssa AS double) / n_a - (cast(sa AS double) / n_a) * (cast(sa AS double) / n_a)) * n_a / (n_a - 1) AS va,
             (cast(ssb AS double) / n_b - (cast(sb AS double) / n_b) * (cast(sb AS double) / n_b)) * n_b / (n_b - 1) AS vb
      FROM s)
    SELECT g AS "group", cast(n_a AS bigint) AS n_a, cast(n_b AS bigint) AS n_b,
           floor(ma * 1000000 + 0.5) / 1000000 AS mean_a,
           floor(mb * 1000000 + 0.5) / 1000000 AS mean_b,
           CASE WHEN n_a > 1 AND n_b > 1 AND va + vb > 0
                THEN floor((mb - ma) / sqrt(va / n_a + vb / n_b) * 1000000 + 0.5) / 1000000
           END AS z_score,
           coalesce(CASE WHEN n_a > 1 AND n_b > 1 AND va + vb > 0
                         THEN abs((mb - ma) / sqrt(va / n_a + vb / n_b)) >= 1.96
                    END, false) AS significant
    FROM m
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X78 two-sample z-test per event type (arms = user_id parity): the
    experiment-dashboard significance read — one partial-agg shuffle of
    decimal-accumulated moments, engine-identical z statistics."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.ab_test_zscores(ev, F.col("user_id") % 2 == 1)


@query(
    "events_cusum_shifts",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts, count(*) AS n_events
      FROM events GROUP BY 1, 2),
    b AS (
      SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
      FROM events),
    axis AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts FROM b),
    ty AS (SELECT DISTINCT event_type FROM events),
    dense AS (
      SELECT ty.event_type, axis.bucket_ts, coalesce(c.n_events, 0) AS n_events
      FROM ty CROSS JOIN axis
      LEFT JOIN c ON c.event_type = ty.event_type AND c.bucket_ts = axis.bucket_ts),
    st AS (
      SELECT event_type, count(*) AS nb, sum(n_events) AS s,
             sum(n_events * n_events) AS ss
      FROM dense GROUP BY 1),
    drift AS (
      SELECT d.event_type, d.bucket_ts, d.n_events,
             d.n_events - cast(s AS double) / nb
               - 0.5 * sqrt(greatest(cast(ss AS double) / nb
                            - (cast(s AS double) / nb) * (cast(s AS double) / nb), 0.0)) AS dv,
             4.0 * sqrt(greatest(cast(ss AS double) / nb
                        - (cast(s AS double) / nb) * (cast(s AS double) / nb), 0.0)) AS h
      FROM dense d JOIN st USING (event_type)),
    cum AS (
      SELECT event_type, bucket_ts, n_events, h,
             sum(dv) OVER (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
      FROM drift),
    scored AS (
      SELECT event_type, bucket_ts, n_events, h,
             cumv - least(0.0, min(cumv) OVER (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sv
      FROM cum)
    SELECT event_type, bucket_ts, cast(n_events AS bigint) AS n_events,
           floor(sv * 1000000 + 0.5) / 1000000 AS cusum,
           coalesce(sv > h AND h > 0, false) AS is_shift
    FROM scored
    """,
)
def events_cusum_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X79 CUSUM level-shift scores (Page 1954): one-sided cumulative-sum
    statistic per type over the dense hourly rate, via the closed form
    S_t = cum_t - min(0, running-min cum) — two stacked windows, no
    recursion; flags when S crosses 4 std.  The persistent-shift detector
    beside the X63 spike detector."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.cusum_changepoints(ev)


@query(
    "dedup_winnow_containment",
    oracle=_WINNOW_CTE
    + """
    , e AS (SELECT doc_id AS id, unnest(fingerprints) AS fp FROM w),
    small AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 200),
    ee AS (SELECT e.id, e.fp FROM e JOIN small USING (fp)),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ee a JOIN ee b ON a.fp = b.fp AND a.id < b.id
      GROUP BY 1, 2 HAVING count(*) >= 1),
    gs AS (
      SELECT doc_id, CASE WHEN len(tk) >= 5 THEN
        list_distinct(list_transform(range(1, len(tk) - 4 + 1), i ->
          md5(array_to_string(list_slice(tk, i, i + 4), ' '))))
      ELSE [] END AS grams FROM t),
    v AS (
      SELECT c.id_a, c.id_b,
             len(list_filter(ga.grams, x -> list_contains(gb.grams, x))) AS n_common_grams,
             len(ga.grams) AS na, len(gb.grams) AS nb
      FROM cand c JOIN gs ga ON ga.doc_id = c.id_a JOIN gs gb ON gb.doc_id = c.id_b),
    scored AS (
      SELECT id_a, id_b, cast(n_common_grams AS int) AS n_common_grams,
             CASE WHEN na > 0 THEN floor(cast(n_common_grams AS double) / na * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS containment_a_in_b,
             CASE WHEN nb > 0 THEN floor(cast(n_common_grams AS double) / nb * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS containment_b_in_a
      FROM v)
    SELECT id_a, id_b, n_common_grams, containment_a_in_b, containment_b_in_a,
           CASE WHEN containment_a_in_b >= containment_b_in_a THEN 'a_in_b'
                ELSE 'b_in_a' END AS direction
    FROM scored
    WHERE containment_a_in_b >= 0.6 OR containment_b_in_a >= 0.6
    """,
)
def dedup_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X80 containment detection: asymmetric gram containment over winnow
    candidate pairs (min_shared=1 — a small doc inside a big one shares
    few fingerprints, the Jaccard-blind case) — finds quotes, aggregator
    pages, sub-document re-renders that symmetric near-dup misses."""
    docs = _docs(spark, sf_dir)
    fps = tx.winnow_fingerprints(docs, "text", "doc_id", k=5, window=4)
    cand = tx.winnow_candidates(fps, "doc_id", min_shared=1, max_bucket_size=200)
    return tx.winnow_containment(
        docs, "text", "doc_id", cand.select("id_a", "id_b"), k=5, min_containment=0.6
    )


@query(
    "curation_concentration",
    oracle="""
    WITH c AS (
      SELECT lang AS g, source AS w, count(*) AS n FROM documents GROUP BY 1, 2),
    t AS (SELECT g, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.g AS "group", cast(count(*) AS bigint) AS n_sources,
           cast(max(tot) AS bigint) AS n_docs,
           floor(cast(sum(cast((cast(n AS double) / tot) * (cast(n AS double) / tot)
                               AS decimal(28,12))) AS double) * 1000000 + 0.5)
             / 1000000 AS hhi,
           floor(max(cast(n AS double) / tot) * 1000000 + 0.5) / 1000000 AS top_share
    FROM c JOIN t USING (g) GROUP BY 1
    """,
)
def curation_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X81 source-concentration report: per-language Herfindahl index over
    sources (+ top share, source count) — 'is this language's data one
    crawl wearing many names?'.  Two tiny aggregates; decimal-accumulated
    share squares."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.concentration_report(docs, "lang", "source")


@query(
    "events_rolling_rate",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts, count(*) AS n_events
      FROM events GROUP BY 1, 2),
    b AS (
      SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
      FROM events),
    axis AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts FROM b),
    ty AS (SELECT DISTINCT event_type FROM events),
    dense AS (
      SELECT ty.event_type, axis.bucket_ts, coalesce(c.n_events, 0) AS n_events
      FROM ty CROSS JOIN axis
      LEFT JOIN c ON c.event_type = ty.event_type AND c.bucket_ts = axis.bucket_ts),
    r AS (
      SELECT event_type, bucket_ts, n_events,
             cast(sum(n_events) OVER w AS double) / count(*) OVER w AS avg
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, bucket_ts, cast(n_events AS bigint) AS n_events,
           floor(avg * 1000000 + 0.5) / 1000000 AS trailing_avg,
           CASE WHEN avg > 0
                THEN floor(n_events / avg * 1000000 + 0.5) / 1000000
           END AS ratio_to_avg
    FROM r
    """,
)
def events_rolling_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X82 rolling-rate smoother: 7-bucket trailing mean of the dense
    per-type hourly rate plus each bucket's ratio to its own trailing mean
    — the dashboard line under the X63/X79 anomaly flags.  Shares the
    dense-axis aggregate; trailing means from exact integer sums."""
    from ..operators import features as ft

    apply_runtime_conf(spark)
    ev = star.table(spark, sf_dir, "events")
    return ft.rolling_rate(ev)


@query(
    "text_novelty_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, md5(array_to_string(t[s+1:s+5], ' ')) AS gh
      FROM (SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS s
            FROM toks WHERE len(t) >= 5)),
    ref_g AS (SELECT DISTINCT gh FROM grams WHERE doc_id % 2 = 0),
    new_g AS (SELECT doc_id, gh FROM grams WHERE doc_id % 2 = 1),
    per AS (
      SELECT n.doc_id, count(*) AS n_grams,
             sum(CASE WHEN r.gh IS NOT NULL THEN 1 ELSE 0 END) AS n_seen
      FROM new_g n LEFT JOIN ref_g r ON n.gh = r.gh GROUP BY 1)
    SELECT d.doc_id, cast(coalesce(n_grams, 0) AS bigint) AS n_grams,
           cast(coalesce(n_seen, 0) AS bigint) AS n_seen,
           CASE WHEN coalesce(n_grams, 0) > 0
                THEN floor(cast(n_grams - n_seen AS double) / n_grams * 1000000 + 0.5)
                     / 1000000
           END AS novelty
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN per USING (doc_id)
    """,
)
def text_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X83 n-gram novelty of the odd-id docs vs the even-id reference
    corpus: the inverse-of-contamination acquisition signal.  The
    reference is corpus-sized, so the gram join shuffles on the md5 gram
    hash (never broadcasts); one gram shuffle + one doc aggregate."""
    docs = _docs(spark, sf_dir)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    return tx.novelty_scores(new, ref, "text", "doc_id", n=5)


#: Deterministic multi-line rendering of the (newline-free) test corpus so
#: the structural-repetition queries have real line/paragraph structure to
#: judge: 3-token lines, 4 lines (12 tokens) per paragraph.  Both engines
#: build the SAME string, so the operator's split/dup logic is what the
#: hash compares.  ONE indexed transform over the token array — every
#: token is emitted with its following separator (space, newline every 3,
#: double newline every 12; the last token's trailing separator is
#: harmless because both operators trim segments and drop empties).  The
#: first version of this rendering sliced a lines-array inside a
#: paragraphs-transform: each lambda reference re-evaluated the whole
#: captured subtree (split + regexp normalize), an O(paragraphs × lines ×
#: tokens) per-row blowup that made the queries ~20x slower than the
#: operator itself.
_LINED = f"""
    array_to_string(
      list_transform(
        string_split({_NORM}, ' '),
        (x, i) -> x || CASE WHEN i % 12 = 0 THEN chr(10) || chr(10)
                            WHEN i % 3 = 0 THEN chr(10)
                            ELSE ' ' END),
      '')
"""


def _lined_text(text_col: str) -> F.Column:
    """Spark twin of ``_LINED``: 3-token lines, 12-token paragraphs, one
    O(tokens) indexed transform (Spark's lambda index is 0-based where
    DuckDB's is 1-based, hence ``i + 1``)."""
    toks = F.split(dd.normalized_text(F.col(text_col)), " ")
    return F.array_join(
        F.transform(
            toks,
            lambda x, i: F.concat(
                x,
                F.when((i + 1) % 12 == 0, F.lit("\n\n"))
                .when((i + 1) % 3 == 0, F.lit("\n"))
                .otherwise(F.lit(" ")),
            ),
        ),
        "",
    )


@query(
    "text_dup_line_fraction",
    oracle=f"""
    WITH lined AS (SELECT doc_id, {_LINED} AS txt FROM documents),
    seg AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(txt, chr(10)), s -> trim(s)),
                         s -> len(s) > 0) AS ln,
             list_filter(list_transform(string_split(txt, chr(10) || chr(10)), s -> trim(s)),
                         s -> len(s) > 0) AS pa
      FROM lined)
    SELECT doc_id,
           cast(len(ln) AS bigint) AS n_lines,
           CASE WHEN len(ln) > 0 THEN
             floor(cast(len(ln) - len(list_distinct(ln)) AS double) / len(ln) * 1000000 + 0.5) / 1000000
           END AS dup_line_ratio,
           CASE WHEN coalesce(list_sum(list_transform(ln, s -> len(s))), 0) > 0 THEN
             floor(cast(list_sum(list_transform(ln, s -> len(s)))
                        - list_sum(list_transform(list_distinct(ln), s -> len(s))) AS double)
                   / list_sum(list_transform(ln, s -> len(s))) * 1000000 + 0.5) / 1000000
           END AS dup_line_char_ratio,
           cast(len(pa) AS bigint) AS n_paras,
           CASE WHEN len(pa) > 0 THEN
             floor(cast(len(pa) - len(list_distinct(pa)) AS double) / len(pa) * 1000000 + 0.5) / 1000000
           END AS dup_para_ratio,
           CASE WHEN coalesce(list_sum(list_transform(pa, s -> len(s))), 0) > 0 THEN
             floor(cast(list_sum(list_transform(pa, s -> len(s)))
                        - list_sum(list_transform(list_distinct(pa), s -> len(s))) AS double)
                   / list_sum(list_transform(pa, s -> len(s))) * 1000000 + 0.5) / 1000000
           END AS dup_para_char_ratio
    FROM seg
    """,
)
def text_dup_line_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X84 Gopher duplicate-line/paragraph fractions (Rae et al. 2021
    §A1.1) — the line-level boilerplate signal complementing
    text_repetition_score's n-gram ratios.  The test corpus is
    newline-free, so the query first renders each doc into a deterministic
    3-token-line / 12-token-paragraph layout (both engines build the
    identical string); real corpora skip that step and feed raw text.
    Map-only: per-row array expressions, no shuffle."""
    docs = _docs(spark, sf_dir)
    lined = docs.select("doc_id", _lined_text("text").alias("text"))
    return tx.structural_repetition(lined, "text", "doc_id")


@query(
    "split_kfold",
    oracle="""
    SELECT doc_id, lang AS stratum,
           cast((row_number() OVER (
                   PARTITION BY lang
                   ORDER BY cast(('0x' || substr(md5('cv0:' || cast(doc_id AS varchar)), 1, 8)) AS bigint),
                            doc_id) - 1) % 5 AS int) AS fold
    FROM documents
    """,
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X85 stratified k-fold cross-validation assignment (k=5, strata =
    language): md5-draw ranking dealt round-robin, so every language lands
    n/k ±1 rows in each fold — deterministic, engine-portable, re-dealable
    by salt.  One stratum shuffle + sort (the exactness price); the
    unstratified variant is a map-only hash mod."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    return cu.kfold_assign(docs, "doc_id", k=5, strata_col="lang")


@query(
    "dedup_span_coverage",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents),
    g AS (
      SELECT doc_id, s AS pos, array_to_string(tk[s + 1 : s + 5], ' ') AS gram
      FROM (SELECT doc_id, tk,
                   unnest(range(0, greatest(len(tk) - 5, 0) + 1)) AS s
            FROM t)),
    rep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    cov AS (
      SELECT doc_id, count(DISTINCT pos + j) AS covered_raw
      FROM (SELECT g.doc_id, g.pos, unnest(range(0, 5)) AS j
            FROM g JOIN rep USING (gram))
      GROUP BY doc_id),
    n AS (SELECT doc_id, cast(len(tk) AS bigint) AS n_tokens FROM t)
    SELECT n.doc_id, n.n_tokens,
           least(coalesce(cov.covered_raw, 0), n.n_tokens) AS covered_tokens,
           CASE WHEN n.n_tokens > 0 THEN
             floor(cast(least(coalesce(cov.covered_raw, 0), n.n_tokens) AS double)
                   / n.n_tokens * 1000000 + 0.5) / 1000000
           END AS dup_span_frac
    FROM n LEFT JOIN cov ON n.doc_id = cov.doc_id
    """,
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X86 ExactSubstr-style duplicate-span coverage (Lee et al. 2022): the
    per-document fraction of token positions inside a 5-gram that repeats
    anywhere in the corpus — the signal the suffix-array ExactSubstr pass
    removes, as a curation-gate score.  All shuffles are keyed on a 64-bit
    gram hash (count → co-partitioned join → per-doc distinct-position
    count); the corpus-sized gram table is never broadcast."""
    docs = _docs(spark, sf_dir)
    return dd.repeated_span_coverage(docs, "text", "doc_id", k=5)


@query(
    "text_remove_boilerplate",
    oracle=f"""
    WITH lined AS (SELECT doc_id, {_LINED} AS txt FROM documents),
    seg AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(txt, chr(10)), s -> trim(s)),
                         s -> len(s) > 0) AS ls
      FROM lined),
    ex AS (SELECT doc_id, unnest(ls) AS ln, generate_subscripts(ls, 1) AS i FROM seg),
    keep AS (SELECT ln FROM ex GROUP BY ln HAVING count(*) < 3),
    kept AS (
      SELECT doc_id, string_agg(ln, chr(10) ORDER BY i) AS clean,
             count(*) AS n_kept
      FROM ex JOIN keep USING (ln) GROUP BY doc_id),
    tot AS (SELECT doc_id, cast(len(ls) AS bigint) AS n_lines FROM seg)
    SELECT t.doc_id,
           CASE WHEN t.n_lines IS NOT NULL THEN coalesce(k.clean, '') END AS clean_text,
           coalesce(k.n_kept, 0) AS n_lines_kept,
           coalesce(t.n_lines, 0) - coalesce(k.n_kept, 0) AS n_lines_removed
    FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id
    """,
)
def text_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X87 C4-style cross-corpus boilerplate-line removal (Raffel et al.
    2020 §2.2): every line occurring 3+ times anywhere in the corpus is
    dropped; documents are reassembled in original line order (left-joined
    back, so fully-boilerplate docs survive as empty strings).  Same
    deterministic lined rendering as text_dup_line_fraction — the tiny
    shared vocabulary makes repeated 3-token lines common, so the removal
    path has real work to do.  All shuffles are line-hash-keyed."""
    docs = _docs(spark, sf_dir)
    lined = docs.select("doc_id", _lined_text("text").alias("text"))
    return tx.remove_boilerplate_lines(lined, "text", "doc_id", min_df=3)


@query(
    "curation_batch_by_length",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             cast(len(string_split({_NORM}, ' ')) AS bigint) AS n_tokens,
             cast(cast(('0x' || substr(md5('b0:' || cast(doc_id AS varchar)), 1, 6)) AS bigint)
                  % 8 AS int) AS shard
      FROM documents
      WHERE len(string_split({_NORM}, ' ')) > 0),
    b AS (
      SELECT doc_id, shard, n_tokens,
             cast(floor((row_number() OVER (
                    PARTITION BY shard ORDER BY n_tokens DESC, doc_id) - 1) / 16.0)
                  AS bigint) AS batch_id
      FROM t)
    SELECT doc_id, shard, batch_id, n_tokens,
           max(n_tokens) OVER (PARTITION BY shard, batch_id) AS batch_max_tokens,
           max(n_tokens) OVER (PARTITION BY shard, batch_id) - n_tokens AS pad_tokens
    FROM b
    """,
)
def curation_batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X88 length-bucketed batching: hash-deal docs into 8 shards, sort
    each shard by token count, cut batches of 16 — near-equal lengths per
    batch so padding-to-batch-max waste collapses vs arrival order.
    pad_tokens/batch_max sums give the waste share directly.  One shard
    shuffle + per-shard window (the pack_sequences_sharded contract)."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(dd.normalized_text(F.col("text")), " ")).alias("n_tok"),
    )
    return cu.batch_by_length(
        with_tokens, "n_tok", "doc_id", batch_size=16, n_shards=8
    )


@query(
    "pack_documents_nostraddle",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT doc_id,
             cast(len(string_split({_NORM}, ' ')) AS bigint) AS n_tokens,
             cast(cast(('0x' || substr(md5('p0:' || cast(doc_id AS varchar)), 1, 6)) AS bigint)
                  % 8 AS int) AS shard,
             md5('p0:' || cast(doc_id AS varchar)) AS draw
      FROM documents
      WHERE len(string_split({_NORM}, ' ')) > 0),
    r AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY draw, doc_id) AS rn
      FROM t),
    rec AS (
      SELECT shard, rn, doc_id, n_tokens,
             cast(0 AS bigint) AS bin_id, cast(0 AS bigint) AS offset_in_bin,
             n_tokens AS used
      FROM r WHERE rn = 1
      UNION ALL
      SELECT x.shard, x.rn, x.doc_id, x.n_tokens,
             CASE WHEN rec.used + x.n_tokens <= 64 THEN rec.bin_id ELSE rec.bin_id + 1 END,
             CASE WHEN rec.used + x.n_tokens <= 64 THEN rec.used ELSE cast(0 AS bigint) END,
             CASE WHEN rec.used + x.n_tokens <= 64 THEN rec.used + x.n_tokens ELSE x.n_tokens END
      FROM rec JOIN r x ON x.shard = rec.shard AND x.rn = rec.rn + 1)
    SELECT doc_id, shard, bin_id, offset_in_bin, n_tokens,
           n_tokens > 64 AS overflow
    FROM rec
    """,
)
def pack_documents_nostraddle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X89 no-straddle greedy packing (next-fit) into 64-token bins, 8 md5
    shards: documents never split across contexts — the SFT-exporter mode
    (X52 concat-and-cut is the pretraining mode).  The inherently
    sequential per-shard scan is one Arrow applyInPandas pass (state: two
    ints); the oracle replays the exact recurrence as a per-shard
    recursive CTE.  Docs longer than the context get their own bin with
    overflow=true — surfaced, never dropped or truncated."""
    from ..operators import curation as cu

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(dd.normalized_text(F.col("text")), " ")).alias("n_tok"),
    )
    return cu.pack_documents_nostraddle(
        with_tokens, "n_tok", "doc_id", context_len=64, n_shards=8
    )
