"""r10 optimization-round equivalence pins.

Each r10 driver-tax optimization restructured HOW an expression tree is
built (matrix-literal signatures, subspace-indexed PQ codes, memoized
parallelism probe) while claiming bit-identical VALUES.  These tests pin
that claim against the original unrolled construction, so a future edit
that drifts the restructured form shows up as a value diff, not a silent
oracle red."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.similarity import (
    _argmin_centroids,
    _argmin_centroids_exact,
    _bucket_structs,
    _pq_codes,
    lsh_bucket,
)
from cloudcomputing_servicecompositiontest_datapipeline_spark.sources.star import (
    ensure_parallelism,
)


def _vectors_df(spark, n=24, dim=8):
    rows = [
        (i, [((i * 31 + j * 17) % 19 - 9) / 7.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_bucket_structs_matches_unrolled_lsh_bucket(spark):
    """_bucket_structs (one matrix-literal transform) must reproduce the
    original per-table lsh_bucket loop bit-for-bit in BOTH hash modes."""
    dim, planes, tables = 8, 2, 4
    df = _vectors_df(spark, dim=dim)
    for hash_fn in ("md5_32", "xxhash64"):
        old = df.select(
            "vec_id",
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(
                            F.col("embedding"),
                            planes=planes,
                            dim=dim,
                            plane_offset=t * planes,
                            hash_fn=hash_fn,
                        ).alias("bits"),
                    )
                    for t in range(tables)
                ]
            ).alias("bk"),
        )
        new = df.select(
            "vec_id",
            _bucket_structs(
                F.col("embedding"), planes=planes, dim=dim, tables=tables, hash_fn=hash_fn
            ).alias("bk"),
        )
        got_old = {r.vec_id: [(s.tbl, s.bits) for s in r.bk] for r in old.collect()}
        got_new = {r.vec_id: [(s.tbl, s.bits) for s in r.bk] for r in new.collect()}
        assert got_new == got_old, f"bucket divergence in {hash_fn} mode"


def test_pq_codes_matches_unrolled_argmin(spark):
    """_pq_codes (3-level codebook literal, subspace-indexed transform) must
    reproduce the original per-subspace argmin loop in both assign modes."""
    dim, m = 8, 2
    sub = dim // m
    df = _vectors_df(spark, dim=dim)
    codebooks = [
        [[((j * 13 + c * 7 + k * 3) % 11 - 5) / 3.0 for k in range(sub)] for c in range(3)]
        for j in range(m)
    ]
    for exact in (True, False):
        argmin = _argmin_centroids_exact if exact else _argmin_centroids
        codes = []
        for j, cb in enumerate(codebooks):
            subvec = F.slice(F.col("embedding"), j * sub + 1, sub)
            codes.append(argmin(subvec, cb, 1)[0])
        old = df.select("vec_id", F.array(*codes).alias("codes"))
        new = df.select(
            "vec_id", _pq_codes(F.col("embedding"), codebooks, exact).alias("codes")
        )
        got_old = {r.vec_id: list(r.codes) for r in old.collect()}
        got_new = {r.vec_id: list(r.codes) for r in new.collect()}
        assert got_new == got_old, f"pq code divergence (exact_assign={exact})"


def test_ensure_parallelism_memoizes_per_input(spark, sf_dir):
    """Repeated calls on the same input object must return the SAME child
    (one planning probe, canonically-equal exchange subtrees for reuse),
    and the memo must not leak across distinct inputs."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    df = star.table(spark, sf_dir, "embeddings")
    out1 = ensure_parallelism(df)
    out2 = ensure_parallelism(df)
    assert out1 is out2
    other = df.filter(F.col("vec_id") < 5)
    out3 = ensure_parallelism(other)
    assert out3 is not out1
    # values unchanged by the round-robin spread
    assert out1.count() == df.count()


def test_winnow_candidates_matches_join_formulation(spark):
    """winnow_candidates' row-local pair expansion (one collect_list
    aggregate per fingerprint) must reproduce the original explode +
    bucket-count + fp self-join pair set exactly — including the bucket
    cap counting ROWS (NULL ids included) while pairs only ever contain
    non-NULL ids, and the min_shared cut on the pair count."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.text import (
        winnow_candidates,
    )

    # hand-built fingerprint sets: fp 1 shared by 4 docs, fp 2 by 2, fp 3
    # oversized (> cap) and must be dropped, fp 4 shared only via a NULL id
    rows = [
        (1, [1, 2, 4]),
        (2, [1, 2]),
        (3, [1, 3]),
        (4, [1, 3]),
        (5, [3]),
        (6, [3]),
        (None, [4, 1]),
        (7, [4]),
    ]
    fps = spark.createDataFrame(rows, "doc_id BIGINT, fingerprints ARRAY<BIGINT>")

    def old_form(fps, cap, min_shared):
        e = fps.select(
            F.col("doc_id").alias("_id"), F.explode_outer("fingerprints").alias("fp")
        ).filter(F.col("fp").isNotNull())
        small = (
            e.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_bucket"))
            .filter(F.col("_bucket") <= cap)
            .select("fp")
        )
        e = e.join(small, "fp")
        a = e.select(F.col("_id").alias("id_a"), "fp")
        b = e.select(F.col("_id").alias("id_b"), "fp")
        return (
            a.join(b, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )

    for cap, min_shared in ((3, 1), (4, 1), (200, 2)):
        want = {
            (r.id_a, r.id_b): r.n_shared
            for r in old_form(fps, cap, min_shared).collect()
        }
        got = {
            (r.id_a, r.id_b): r.n_shared
            for r in winnow_candidates(
                fps, "doc_id", min_shared=min_shared, max_bucket_size=cap
            ).collect()
        }
        assert got == want, f"pair divergence at cap={cap} min_shared={min_shared}"


def test_table_memoizes_per_session_and_dir(spark, sf_dir, sf_check_dir):
    """star.table memoizes the resolved scan per (session, dir, name): the
    same object comes back (one relation resolution per session instead of
    one per plan build), distinct dirs/tables stay distinct, and the scan
    still reads the parquet data on every execution (values correct)."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.sources import star

    a1 = star.table(spark, sf_dir, "region")
    a2 = star.table(spark, sf_dir, "region")
    assert a1 is a2
    b = star.table(spark, sf_check_dir, "region")
    assert b is not a1
    c = star.table(spark, sf_dir, "nation")
    assert c is not a1
    assert a1.count() == 5  # fixture regions — a real execution, not a cache


def test_apply_runtime_conf_memo_reapplies_on_canary_miss(spark):
    """apply_runtime_conf skips the 11 conf round-trips once applied, but a
    session whose timeZone canary was reset gets the full engine conf
    re-applied (the hostile-session contract of tools/check.py PLAIN mode)."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.session import (
        apply_runtime_conf,
    )

    apply_runtime_conf(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # simulate a hostile reset of a VALUE-affecting conf
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        apply_runtime_conf(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_scratch_root_honors_env(tmp_path, monkeypatch):
    """scratch_root prefers SG_SCRATCH_DIR (the cluster-deployment knob)
    over the RAM-backed local default."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark import session as sess

    target = tmp_path / "scratch"
    monkeypatch.setenv("SG_SCRATCH_DIR", str(target))
    assert sess.scratch_root() == str(target)
    assert target.is_dir()
    monkeypatch.delenv("SG_SCRATCH_DIR")
    root = sess.scratch_root()
    assert root and root != str(target)


def test_vocabulary_overlap_matches_selfjoin_formulation(spark):
    """vocabulary_overlap's row-local pair expansion (collect_set per word +
    sorted combos) must reproduce the original distinct + word-keyed
    self-join pair counts exactly — including NULL-group exclusion and the
    binary string ordering of group_a < group_b."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.text import (
        vocabulary_overlap,
    )
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.dedup import (
        normalized_text,
    )

    rows = [
        (1, "alpha beta gamma", "s1"),
        (2, "beta gamma delta", "s2"),
        (3, "gamma delta", "s3"),
        (4, "alpha alpha beta", "s1"),   # within-group dup words
        (5, "epsilon", None),            # NULL group must not pair
        (6, "Beta, GAMMA!", "s2"),       # normalization collapses case/punct
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")

    def old_form(df):
        words = (
            df.select(
                F.col("source").alias("_g"),
                F.explode(F.split(normalized_text(F.col("text")), " ")).alias("_w"),
            )
            .filter(F.length("_w") > 0)
            .distinct()
        )
        a = words.select(F.col("_g").alias("group_a"), "_w")
        b = words.select(F.col("_g").alias("group_b"), "_w")
        return (
            a.join(b, "_w")
            .filter(F.col("group_a") < F.col("group_b"))
            .groupBy("group_a", "group_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        )

    want = {(r.group_a, r.group_b): r.n_shared for r in old_form(df).collect()}
    out = {(r.group_a, r.group_b): r for r in vocabulary_overlap(df, "text", "source").collect()}
    assert {k: r.n_shared for k, r in out.items()} == want
    # full output row sanity: jaccard = shared / (na + nb - shared)
    for (a, b), r in out.items():
        assert abs(r.jaccard - r.n_shared / (r.n_vocab_a + r.n_vocab_b - r.n_shared)) < 1e-6


def test_remove_boilerplate_anti_join_matches_inner_join(spark):
    """The >= min_df anti-join inversion must keep exactly the lines the
    original under-threshold inner join kept."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.text import (
        remove_boilerplate_lines,
    )

    nav = "enable javascript"
    rows = [
        (1, f"{nav}\nunique one\ncommon line"),
        (2, f"{nav}\nunique two\ncommon line"),
        (3, f"{nav}\nunique three"),
        (4, f"{nav}\n{nav}"),          # fully-boilerplate doc survives empty
        (5, None),                      # NULL text
        (6, "  \n\n  "),                # only blank lines
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in remove_boilerplate_lines(df, "text", "doc_id", min_df=3).collect()}
    # nav occurs 5 times (>=3, dropped); "common line" twice (kept)
    assert out[1].clean_text == "unique one\ncommon line"
    assert out[2].clean_text == "unique two\ncommon line"
    assert out[3].clean_text == "unique three"
    assert (out[1].n_lines_kept, out[1].n_lines_removed) == (2, 1)
    assert out[4].clean_text == "" and out[4].n_lines_kept == 0 and out[4].n_lines_removed == 2
    assert out[5].clean_text is None
    assert out[6].clean_text == "" and out[6].n_lines_removed == 0


def test_dup_rate_window_matches_join_formulation(spark):
    """dup_rate_by_group's (hash, group) aggregate + cluster-min window must
    reproduce the original exact_dedup annotate-back join counts — incl.
    cross-group clusters (drop attributed to the dropped copy's group),
    singleton clusters, and a group with only duplicates."""
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.dedup import (
        dup_rate_by_group,
        exact_dedup,
    )
    from cloudcomputing_servicecompositiontest_datapipeline_spark.operators.dedup import (
        normalized_text,
    )

    rows = [
        (10, "same content", "s1"),   # keeper (min id of the cluster)
        (11, "same content", "s2"),   # cross-group dup -> counts against s2
        (12, "same content", "s1"),   # within-group dup -> counts against s1
        (None, "same content", "s2"), # NULL id: never dropped (id != keep is NULL)
        (10, "same content", "s1"),   # duplicate keeper id: BOTH rows survive
        (20, "unique a", "s1"),
        (21, "unique b", "s2"),
        (30, "other dup", "s3"),      # keeper
        (31, "OTHER  dup", "s3"),     # normalization makes this a dup
        (40, None, "s1"),             # NULL text: excluded (NULL hash never joins)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")

    h = F.sha2(normalized_text(F.col("text")), 256)
    tagged = df.select(F.col("doc_id"), F.col("source").alias("group"), h.alias("content_hash"))
    old = {
        r.group: (r.n_docs, r.n_dropped)
        for r in tagged.join(exact_dedup(df, "text", "doc_id"), "content_hash")
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when((F.col("n_copies") >= 2) & (F.col("doc_id") != F.col("keep_id")), 1)
                .otherwise(0)
            ).cast("long").alias("n_dropped"),
        )
        .collect()
    }
    new = {
        r.group: (r.n_docs, r.n_dropped)
        for r in dup_rate_by_group(df, "text", "doc_id", "source").collect()
    }
    assert new == old
    assert new["s2"] == (3, 1) and new["s1"] == (4, 1) and new["s3"] == (2, 1)
