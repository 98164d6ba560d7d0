"""LLM-pipeline operator tests: dedup tiers, similarity tiers, text
analysis, multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from shredder_spark.catalog import load_table
from shredder_spark.functions import text as T
from shredder_spark.operators import dedup as D
from shredder_spark.operators import similarity as S
from shredder_spark.operators.multimodal import (
    extract_image_features, frame_sample_plan, read_binary_dir,
    unavailable_decoder,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def doc_block(documents):
    return documents.filter(F.col("doc_id") < 100)


def _pairs(df):
    return {(r.i, r.j) for r in df.collect()}


def test_exact_dedup(spark, documents):
    kept = D.exact_dedup(documents, ["lang", "n_chars"], "doc_id")
    groups = documents.groupBy("lang", "n_chars").count()
    assert kept.count() == groups.count()
    # keeper is the min doc_id of its group
    k = kept.groupBy("lang", "n_chars").agg(F.min("doc_id").alias("m"),
                                            F.count("*").alias("c")).collect()
    assert all(r.c == 1 for r in k)


def test_minhash_sql_text_matches_column_form(spark, documents):
    """r12: minhash_lsh_pairs builds its token-hash + signature
    expressions as parsed SQL text (one F.expr) instead of per-call
    Column composition (~1.2 s of py4j churn). Pin bit-equality of
    the two forms over the full fixture."""
    src = documents.select(F.col("doc_id").alias("_id"),
                           F.col("text").alias("_text"))
    col_form = (src.select("_id", D.token_hashes(F.col("_text")).alias("_hs"))
                .select("_id", D.minhash_from_hashes(
                    F.col("_hs"), 64, 1).alias("_sig")))
    sql_form = (src.select("_id", F.expr(D._TOKEN_HASHES_SQL.format(
                    col="_text")).alias("_hs"))
                .select("_id", F.expr(D._minhash_sql(
                    "_hs", 64, 1)).alias("_sig")))
    n_diff = (col_form.alias("x").join(sql_form.alias("y"), "_id")
              .filter(F.expr("x._sig <> y._sig")).count())
    assert n_diff == 0


def test_minhash_lsh_recall(spark, doc_block):
    exact = _pairs(D.jaccard_pairs(doc_block, "doc_id", "text", 0.8))
    assert exact, "fixture must contain near-dup pairs"
    approx = _pairs(D.minhash_lsh_pairs(doc_block, "doc_id", "text",
                                        threshold=0.8))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(exact)} pairs"
    # verified tier keeps precision 1.0
    assert approx <= exact | approx  # approx pairs all exact-verified ≥0.8
    extra = approx - exact
    assert not extra


def test_simhash_properties(spark, doc_block):
    df = doc_block.select("doc_id", D.simhash64(F.col("text")).alias("sh"))
    a = {r.doc_id: r.sh for r in df.collect()}
    b = {r.doc_id: r.sh for r in df.collect()}
    assert a == b  # deterministic
    # identical text → identical fingerprint → distance 0
    dup = doc_block.limit(1).select(F.lit(9001).alias("doc_id"), "text")
    both = doc_block.limit(1).select("doc_id", "text").unionAll(dup)
    pairs = D.simhash_pairs(both, "doc_id", "text", max_distance=0)
    assert pairs.count() == 1


def test_simhash_whole_fingerprint_key_no_ansi_overflow(spark, doc_block):
    """key_blocks == n_blocks (64-bit packed key) must not hit ANSI
    ARITHMETIC_OVERFLOW — the key is xxhash-folded instead of
    arithmetic-packed (round-9 advice) — and must find the same
    distance-0 pairs as the default single-block key."""
    sub = doc_block.limit(20).select("doc_id", "text")
    dup = sub.limit(3).select((F.col("doc_id") + 9000).alias("doc_id"),
                              "text")
    both = sub.unionAll(dup)
    base = {(r.i, r.j) for r in D.simhash_pairs(
        both, "doc_id", "text", max_distance=0).collect()}
    folded = {(r.i, r.j) for r in D.simhash_pairs(
        both, "doc_id", "text", max_distance=0, n_blocks=4,
        key_blocks=4).collect()}
    assert folded == base and len(folded) >= 3


def test_simhash_hot_bucket_reblocking_same_pairs(spark, documents):
    """r11: hot buckets are re-blocked on the remaining bits
    (max_distance+1 sub-ranges; pigeonhole one level down) before any
    salting. Forcing EVERY bucket hot (salt_threshold=1) must yield
    exactly the all-cold path's pair set — recall preserved AND
    exactly-once emission preserved (set equality implies no dup rows
    because simhash_pairs emits each pair at one combo+sub-range)."""
    blk = documents.filter(F.col("doc_id") < 300).select("doc_id", "text")
    for md in (0, 3):
        base = D.simhash_pairs(blk, "doc_id", "text",
                               max_distance=md).collect()
        hot = D.simhash_pairs(blk, "doc_id", "text", max_distance=md,
                              salt_threshold=1, salts=4).collect()
        base_pairs = {(r.i, r.j) for r in base}
        hot_pairs = {(r.i, r.j) for r in hot}
        assert len(base) == len(base_pairs)  # exactly-once, cold path
        assert len(hot) == len(hot_pairs)    # exactly-once, hot path
        assert hot_pairs == base_pairs, (
            f"md={md}: {len(hot_pairs ^ base_pairs)} differing pairs")
    assert base_pairs, "fixture must contain qualifying pairs at md=3"


def test_simhash_sub_first_match_high_subrange(spark):
    """r12 advice guard: the exactly-once sub-range predicate shifts a
    BIGINT base. With an int base, shiftleft wraps the count mod 32, so
    a pair whose lowest equal sub-range index is ≥ 31 (reachable at
    n_sub up to 63) would be silently dropped. Construct that exact
    shape: n_sub=33 / sub_bits=1 / rem_width=63 (the n_blocks=64 /
    key_blocks=1 / max_distance=32 geometry); a._rem=0 vs
    b._rem=0xFFFFFFFF differ in single-bit sub-ranges 0..31 and agree
    only at sub-range 32, so the pair must be emitted at sq=32 and
    nowhere else."""
    a = spark.createDataFrame([(0, sq) for sq in (0, 31, 32)],
                              "_rem long, sq int").alias("a")
    b = spark.createDataFrame([(0xFFFFFFFF,)], "_rem long").alias("b")
    pred = D._sub_first_match_pred(n_sub=33, sub_bits=1, rem_width=63)
    got = {r.sq for r in
           a.crossJoin(b).filter(pred).select("a.sq").collect()}
    assert got == {32}


def test_ngram_jaccard(spark, doc_block):
    ng = _pairs(D.ngram_jaccard_pairs(doc_block, "doc_id", "text", n=3,
                                      threshold=0.5))
    word = _pairs(D.jaccard_pairs(doc_block, "doc_id", "text", 0.8))
    # 3-gram similarity at 0.5 is stricter than unigram 0.8: should be
    # non-empty on the near-dup fixture and mostly inside the word tier
    assert ng
    assert len(ng & word) / len(ng) > 0.5


def test_content_fingerprint_dedup(spark, documents):
    dup = documents.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    with_dups = documents.unionAll(dup)
    fp = with_dups.select(D.content_fingerprint(F.col("text")).alias("fp"))
    assert fp.distinct().count() == documents.select(
        D.content_fingerprint(F.col("text"))).distinct().count()


def test_cosine_exact_vs_blocked(spark, embeddings):
    exact = S.cosine_topk(embeddings, 0, k=5)
    q = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    blocked = S.cosine_topk_blocked(
        embeddings.filter(F.col("vec_id") != 0), q, k=5)
    a = [(r.vec_id, r.sim) for r in exact.collect()]
    b = [(r.vec_id, r.sim) for r in blocked.collect()]
    assert a == b


def test_zero_norm_vectors_excluded_not_nan(spark, embeddings):
    """Degenerate embeddings: a zero vector has no direction, so every
    similarity tier must EXCLUDE it — never emit NaN (Spark sorts NaN
    greater than any number, so one NaN sim would rank FIRST in every
    desc top-k at 100 TB)."""
    dim = len(embeddings.first()["embedding"])
    zeros = spark.createDataFrame(
        [(900001, [0.0] * dim, 0), (900002, [0.0] * dim, 0)],
        embeddings.schema)
    world = embeddings.unionAll(zeros)

    top = S.cosine_topk(world, 0, k=5).collect()
    assert all(r.vec_id < 900000 for r in top)           # never ranked
    assert all(r.sim == r.sim for r in top)              # no NaN

    q = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    blocked = S.cosine_topk_blocked(
        world.filter(F.col("vec_id") != 0), q, k=5).collect()
    assert all(r.vec_id < 900000 for r in blocked)
    exact = S.cosine_topk(world, 0, k=5).collect()
    assert [(r.vec_id, r.sim) for r in exact] \
        == [(r.vec_id, r.sim) for r in blocked]          # tier parity

    import pytest as _pytest
    with _pytest.raises(ValueError, match="zero-norm query"):
        S.cosine_topk_blocked(embeddings, [0.0] * dim, k=5)

    block = world.filter((F.col("vec_id") < 40) | (F.col("vec_id") >= 900000))
    pairs = S.cosine_pairs_exact(block, 0.0).collect()
    ids = {r.i for r in pairs} | {r.j for r in pairs}
    assert not ids & {900001, 900002}                    # excluded
    assert all(r.sim == r.sim for r in pairs)

    # sign-LSH tier: NULL-normalized rows fall out of the bucket join
    lsh_pairs = S.cosine_near_dup_lsh(block, 0.9)
    lids = {r.i for r in lsh_pairs.collect()} | {r.j for r in lsh_pairs.collect()}
    assert not lids & {900001, 900002}


def test_ann_lsh_recall_planted(spark, embeddings):
    """Sign-LSH recall is a function of the angular gap: the synthetic
    embeddings are near-uniform (best cosine ≈0.3 ≈ 72°), where
    hyperplane LSH has no structure to exploit — so measure recall on
    the actual near-dup use case: planted neighbors at cosine ≥0.95."""
    import numpy as np
    rng = np.random.default_rng(3)
    base = embeddings.filter(F.col("vec_id") == 0).first()
    q = np.array(base["embedding"], dtype=np.float64)
    planted = []
    for i in range(10):
        v = q + rng.standard_normal(len(q)) * 0.08 * np.linalg.norm(q) / np.sqrt(len(q))
        planted.append((100000 + i, [float(x) for x in v], 0))
    extra = spark.createDataFrame(planted, embeddings.schema)
    world = embeddings.unionAll(extra)

    exact = {r.vec_id for r in S.cosine_topk(world, 0, k=10).collect()}
    assert exact == {100000 + i for i in range(10)}  # planted are nearest
    approx = {r.vec_id for r in S.ann_topk_lsh(world, 0, k=10).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.8, f"ANN recall {recall}"


def test_with_quality_score_matches_scalar(spark, documents):
    """r12: with_quality_score builds its staged metrics as parsed SQL
    text — bit-equality vs the Column-composed scalar form over the
    full fixture."""
    sql_form = T.with_quality_score(documents).select("doc_id", "q")
    col_form = documents.select(
        "doc_id", T.quality_score(F.col("text")).alias("q"))
    assert sql_form.exceptAll(col_form).count() == 0
    assert col_form.exceptAll(sql_form).count() == 0


def test_with_quality_score_replaces_existing_out_col(spark, documents):
    """ADVICE r12: an input already carrying out_col (or a staging
    name) must be REPLACED in place — no duplicate/ambiguous columns."""
    pre = documents.selectExpr("*", "0.5D AS q", "99 AS _qs_n")
    out = T.with_quality_score(pre)
    assert out.columns.count("q") == 1
    assert out.columns.count("_qs_n") == 1
    assert out.columns == pre.columns  # replacement keeps position
    ref = T.with_quality_score(documents).select("doc_id", "q")
    got = out.select("doc_id", "q")
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
    # the pre-existing _qs_n column passes through untouched
    assert out.select("_qs_n").distinct().collect()[0][0] == 99


def test_with_lang_id_staging_collision(spark, documents):
    pre = documents.selectExpr("*", "'keep' AS _lid_toks")
    out = T.with_lang_id(pre)
    assert out.columns.count("_lid_toks") == 1
    assert out.columns.count("lid") == 1
    ref = T.with_lang_id(documents).select("doc_id", "lid")
    got = out.select("doc_id", "lid")
    assert got.exceptAll(ref).count() == 0
    assert out.select("_lid_toks").distinct().collect()[0][0] == "keep"


def test_with_lang_id_matches_scalar(spark, documents):
    """r12: with_lang_id builds its stopword scores as parsed SQL text
    — decision equality vs the Column-composed scalar form."""
    sql_form = T.with_lang_id(documents).select("doc_id", "lid")
    col_form = documents.select(
        "doc_id", T.lang_id(F.col("text")).alias("lid"))
    assert sql_form.exceptAll(col_form).count() == 0
    assert col_form.exceptAll(sql_form).count() == 0


def test_text_functions(spark, documents):
    df = documents.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lid"),
        T.quality_score(F.col("text")).alias("q"),
        T.token_count_ws(F.col("text")).alias("tw"),
        T.token_count_bpe_ish(F.col("text")).alias("tb"),
        T.doc_fingerprint(F.col("text")).alias("fp"),
    )
    rows = df.collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    assert all(r.tb >= r.tw > 0 for r in rows)  # subword ≥ whitespace
    assert all(len(r.fp) == 32 for r in rows)
    assert {r.lid for r in rows} <= {"en", "de", "fr", "es", "und"}


def test_multimodal_binary_pipeline(spark, tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    for i in range(6):
        (media / f"img_{i}.jpg").write_bytes(bytes([i]) * (100 + i * 13))
    df = read_binary_dir(spark, str(media), glob="*.jpg")
    assert df.count() == 6
    meta = df.select("meta.*").collect()
    assert all(r.media_type == "jpg" for r in meta)
    assert {r.n_bytes for r in meta} == {100 + i * 13 for i in range(6)}

    # injection plumbing: the deterministic fake decoder (the DEFAULT
    # is the real PNG/BMP codec, covered in test_imagecodec.py)
    from shredder_spark.operators.multimodal import fake_image_decoder
    feats = extract_image_features(df, decoder=fake_image_decoder)
    out = feats.collect()
    assert len(out) == 6
    assert all(64 <= r.width < 576 and r.mean_luma >= 0 for r in out)
    # deterministic across runs
    assert sorted(map(tuple, feats.collect())) == sorted(map(tuple, out))

    frames = frame_sample_plan(df, every_n=4)
    assert frames.count() == 24

    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_image_features(df, decoder=unavailable_decoder).collect()


def test_multimodal_pil_real_codec(spark, tmp_path):
    """Real-codec path: with Pillow installed, pil_image_decoder /
    pil_image_resizer run through the same mapInPandas plumbing as the
    fakes. Skips where the environment has no Pillow (this container);
    passes unchanged wherever it does."""
    from shredder_spark.operators.multimodal import (
        pil_available, pil_image_decoder, pil_image_resizer,
        read_binary_dir, resize_images)

    if not pil_available():
        pytest.skip("Pillow not installed in this environment")
    from PIL import Image
    import io

    media = tmp_path / "pm"
    media.mkdir()
    for i in range(3):
        buf = io.BytesIO()
        Image.new("RGB", (40 + i, 20 + i), (i * 40, 100, 200)).save(
            buf, format="PNG")
        (media / f"p_{i}.png").write_bytes(buf.getvalue())
    df = read_binary_dir(spark, str(media), glob="*.png")

    feats = {r.path.rsplit("/", 1)[-1]: r for r in
             extract_image_features(df, decoder=pil_image_decoder)
             .collect()}
    for i in range(3):
        r = feats[f"p_{i}.png"]
        assert (r.width, r.height) == (40 + i, 20 + i)
        assert 0.0 <= r.mean_luma <= 255.0

    out = resize_images(df, 16, 8, resizer=pil_image_resizer).collect()
    for r in out:
        with Image.open(io.BytesIO(bytes(r.content))) as im:
            assert im.size == (16, 8)


def test_cosine_pairs_exact_symmetric_bounds(spark, embeddings):
    block = embeddings.filter(F.col("vec_id") < 50)
    pairs = S.cosine_pairs_exact(block, 0.25).collect()
    assert all(r.i < r.j and 0.25 <= r.sim <= 1.0 for r in pairs)


def test_cosine_near_dup_lsh_recall(spark, embeddings):
    """Planted near-duplicates (cos >= 0.9): LSH tier must recover
    >=80% of the exact tier's pairs, with precision 1.0 (every LSH pair
    is exact-verified, so it must appear in the exact tier too)."""
    import numpy as np
    rng = np.random.default_rng(11)
    base = embeddings.filter(F.col("vec_id") < 20).collect()
    planted = []
    for k, row in enumerate(base[:10]):
        v = np.array(row.embedding, dtype=np.float64)
        v = v + rng.standard_normal(len(v)) * 0.05 * np.linalg.norm(v) / np.sqrt(len(v))
        planted.append((200000 + row.vec_id, [float(x) for x in v], 0))
    world = embeddings.filter(F.col("vec_id") < 20).unionAll(
        spark.createDataFrame(planted, embeddings.schema))

    exact = {(r.i, r.j) for r in S.cosine_pairs_exact(world, 0.9).collect()}
    assert len(exact) >= 8  # the planted pairs dominate
    approx = {(r.i, r.j) for r in S.cosine_near_dup_lsh(world, 0.9).collect()}
    assert approx <= exact  # precision 1.0 (exact-verified candidates)
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"recall {recall:.2f} over {len(exact)} pairs"


def test_multimodal_resize(spark, tmp_path):
    from shredder_spark.operators.multimodal import read_binary_dir, resize_images

    media = tmp_path / "m"
    media.mkdir()
    for i in range(4):
        (media / f"v_{i}.png").write_bytes(bytes([i + 1]) * (50 + i))
    df = read_binary_dir(spark, str(media), glob="*.png")
    from shredder_spark.operators.multimodal import fake_resizer
    out = resize_images(df, 32, 16, resizer=fake_resizer).collect()
    assert len(out) == 4
    assert all(len(bytes(r.content)) == (32 * 16) // 64 for r in out)
    assert all(r.meta.n_bytes == (32 * 16) // 64 for r in out)
    assert all(r.meta.width == 32 and r.meta.height == 16 for r in out)


def test_ivf_topk_recall_planted(spark, embeddings):
    """IVF tier: planted near-neighbors must be recovered with the
    planted cluster probed (same planting recipe as the LSH test)."""
    import numpy as np

    from shredder_spark.operators.similarity import IVFIndex, ivf_topk

    rng = np.random.default_rng(5)
    base = embeddings.filter(F.col("vec_id") == 0).first()
    q = np.array(base["embedding"], dtype=np.float64)
    planted = []
    for i in range(10):
        v = q + rng.standard_normal(len(q)) * 0.08 * np.linalg.norm(q) / np.sqrt(len(q))
        planted.append((100000 + i, [float(x) for x in v], 0))
    world = embeddings.unionAll(spark.createDataFrame(planted, embeddings.schema))

    idx = IVFIndex(n_clusters=8, seed=3).fit(world)
    assigned = idx.assign(world).cache()
    try:
        # partition function sanity: every row lands in exactly one cluster
        assert assigned.count() == world.count()
        assert assigned.select("cluster").distinct().count() <= 8

        exact = {r.vec_id for r in S.cosine_topk(world, 0, k=10).collect()}
        approx = {r.vec_id for r in
                  ivf_topk(assigned, idx, q, k=10, n_probe=2, exclude_id=0).collect()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"IVF recall {recall}"
    finally:
        assigned.unpersist()


def test_winnow_udf_matches_reference(spark, documents):
    """Vectorized winnowing UDF == pure-Python reference on real docs."""
    sample = documents.filter(F.col("doc_id") < 30)
    got = {r.doc_id: list(r.fp) for r in sample.select(
        "doc_id", D.winnow_fingerprints().alias("fp")).collect()}
    for r in sample.select("doc_id", "text").collect():
        assert got[r.doc_id] == D.winnow_reference(r.text), r.doc_id


def test_winnow_overlap_pairs_finds_near_dups(spark, documents):
    base = documents.limit(3).select("doc_id", "text")
    # perturbed copies: edit a short prefix, keep the body
    dup = base.select((F.col("doc_id") + 500000).alias("doc_id"),
                      F.concat(F.lit("EDITED PREFIX "), F.col("text")).alias("text"))
    world = base.unionAll(dup)
    pairs = {(r.i, r.j): r.overlap
             for r in D.winnow_overlap_pairs(world, "doc_id", "text").collect()}
    for r in base.collect():
        key = (r.doc_id, r.doc_id + 500000)
        assert key in pairs and pairs[key] >= 0.8, (key, pairs)


def test_tokenize_udtf_matches_posexplode(spark, documents):
    """Python UDTF (B50) agrees with the JVM posexplode path on real docs."""
    from shredder_spark.functions.text import register_tokenize_udtf

    register_tokenize_udtf(spark)
    documents.filter(F.col("doc_id") < 20).createOrReplaceTempView("_udtf_docs")
    via_udtf = spark.sql("""
        SELECT d.doc_id, t.pos, t.tok FROM _udtf_docs d,
        LATERAL tokenize_py(d.text) t ORDER BY d.doc_id, t.pos""").collect()
    via_jvm = spark.sql("""
        SELECT doc_id, CAST(pos AS INT) AS pos, tok
        FROM _udtf_docs LATERAL VIEW POSEXPLODE(SPLIT(text,' ')) x AS pos, tok
        ORDER BY doc_id, pos""").collect()
    assert [tuple(r) for r in via_udtf] == [tuple(r) for r in via_jvm]


def test_histogram_numeric_invariants(spark):
    # q233 is rows-only (sketch bin centers are approximate); pin the
    # sketch's hard guarantees instead: bin count, total mass, centers
    # inside the data range and strictly increasing.
    orders = load_table(spark, SF, "orders")
    from shredder_spark.queries import registry
    hist = registry()["q233_histogram_numeric"].run(spark, SF).collect()
    n_rows = orders.count()
    lo, hi = orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    assert len(hist) == 10
    assert abs(sum(r.cnt for r in hist) - n_rows) < 1e-6
    centers = [r.bin_center for r in hist]
    assert all(lo <= c <= hi for c in centers)
    assert centers == sorted(centers) and len(set(centers)) == len(centers)


def test_semdedup_greedy_equivalence(spark, embeddings):
    # Survivors must exactly match a numpy re-derivation of the
    # cluster-local greedy rule: j removed iff some i<j in the same
    # cluster has cosine(i,j) >= threshold.
    import numpy as np

    threshold = 0.4
    idx = S.IVFIndex(n_clusters=8, seed=7).fit(embeddings)
    assigned = idx.assign(embeddings).collect()
    ids = np.array([r.id for r in assigned])
    clusters = np.array([r.cluster for r in assigned])
    X = np.array([r.v for r in assigned], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    expect_removed = set()
    for c in set(clusters.tolist()):
        m = clusters == c
        cid, cx = ids[m], X[m]
        order = np.argsort(cid)
        cid, cx = cid[order], cx[order]
        sims = cx @ cx.T
        for a in range(len(cid)):
            for b in range(a + 1, len(cid)):
                if sims[a, b] >= threshold:
                    expect_removed.add(int(cid[b]))
    survivors = {r.vec_id for r in S.semdedup(embeddings, threshold=threshold).collect()}
    assert survivors == set(ids.tolist()) - expect_removed
    assert expect_removed, "threshold chosen so dedup actually removes rows"
    # survivors are pairwise below threshold within every cluster
    # (guaranteed by the keep-lowest-id rule; spot-check via the matrix)
    for c in set(clusters.tolist()):
        m = clusters == c
        cid, cx = ids[m], X[m]
        keep = np.isin(cid, list(survivors))
        sims = cx[keep] @ cx[keep].T
        np.fill_diagonal(sims, 0.0)
        assert (sims < threshold).all()


def test_map_in_arrow_normalize_matches_jvm_path(spark, embeddings):
    # Arrow-native batch transform (B271) must agree with the
    # higher-order-fn normalization to float tolerance.
    arrow = {r.vec_id: r.nv
             for r in S.normalize_embeddings_arrow(embeddings).collect()}
    jvm = {r.vec_id: r.nv for r in embeddings.select(
        "vec_id",
        S.normalized(S.as_double(F.col("embedding"))).alias("nv")).collect()}
    assert arrow.keys() == jvm.keys()
    for k in arrow:
        assert len(arrow[k]) == len(jvm[k]) == 64
        assert max(abs(a - b) for a, b in zip(arrow[k], jvm[k])) < 1e-9
    # unit norms
    import math
    for v in arrow.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9


def test_pagerank_matches_numpy_power_iteration(spark, documents):
    import numpy as np

    from shredder_spark.operators.graph import pagerank, token_adjacency_edges

    edges_df = token_adjacency_edges(documents)
    # pagerank drops self-loops (repeated consecutive tokens) — mirror
    edges = {(r.src, r.dst) for r in edges_df.collect() if r.src != r.dst}
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {t: i for i, t in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(10):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    got = {row.id: row["rank"] for row in pagerank(edges_df, iters=10).collect()}
    assert set(got) == set(nodes)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for t in nodes:
        assert abs(got[t] - r[idx[t]]) < 1e-9, t


def test_apply_in_arrow_group_centroids(spark, embeddings):
    # groupBy().applyInArrow (B283): per-cluster mean vector computed
    # over Arrow batches must match the posexplode/groupBy JVM path.
    import pyarrow as pa
    import numpy as np

    grouped = embeddings.withColumn("g", (F.col("vec_id") % 4).cast("int"))

    def centroid(batch: pa.Table) -> pa.Table:
        g = batch.column("g")[0].as_py()
        mat = np.vstack([np.asarray(v) for v in
                         batch.column("embedding").to_pylist()]).astype("float64")
        m = mat.mean(axis=0)
        return pa.table({"g": pa.array([g], type=pa.int32()),
                         "centroid": pa.array([m.tolist()],
                                              type=pa.list_(pa.float64()))})

    got = {r.g: r.centroid for r in grouped.groupBy("g")
           .applyInArrow(centroid, "g int, centroid array<double>").collect()}

    jvm = (grouped.select("g", F.posexplode("embedding").alias("d", "x"))
           .groupBy("g", "d").agg(F.avg(F.col("x").cast("double")).alias("m"))
           .groupBy("g").agg(F.array_sort(F.collect_list(F.struct("d", "m")))
                             .alias("dm")))
    want = {r.g: [s.m for s in r.dm] for r in jvm.collect()}
    assert got.keys() == want.keys()
    for g in got:
        assert max(abs(a - b) for a, b in zip(got[g], want[g])) < 1e-9


def test_arrow_optimized_python_udf(spark, documents):
    # Spark 4 Arrow-serialized Python UDF (useArrow=True) must agree
    # with the JVM REVERSE built-in (q38's UDF surface, Arrow tier).
    from pyspark.sql.functions import udf

    rev = udf(lambda s: s[::-1], "string", useArrow=True)
    rows = documents.select(
        rev(F.col("lang")).alias("a"),
        F.reverse(F.col("lang")).alias("b")).collect()
    assert rows and all(r.a == r.b for r in rows)


def test_seeded_sample_deterministic_and_bounded(spark, documents):
    def pick(seed):
        return sorted(r.doc_id for r in documents.where(
            F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(100)) < 20
        ).collect())

    a, b = pick(7), pick(7)
    assert a == b  # content-hash sampling: identical on every re-plan
    # and after an arbitrary repartition (partition-layout independent)
    shuffled = documents.repartition(7)
    c = sorted(r.doc_id for r in shuffled.where(
        F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(100)) < 20).collect())
    assert a == c
    n = documents.count()
    assert 0.10 * n <= len(a) <= 0.32 * n  # loose binomial bounds
    assert a != pick(8)  # different seed actually changes the sample


def test_minhash_parity_with_mllib_lsh(spark):
    """B72 parity proof: our band-bucket MinHash-LSH and Spark MLlib's
    ml.feature.MinHashLSH recover (near-)identical near-dup pair sets
    against the exact-Jaccard ground truth — two independent
    implementations of the same sketch family agreeing on the same
    corpus. Ours is exact-verified (precision 1.0 by construction);
    MLlib's approxSimilarityJoin also filters by exact distance, so
    both sides differ from ground truth only by banding recall."""
    import pyspark.sql.functions as F
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from shredder_spark.catalog import load_table
    from shredder_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    # bounded block (same as the q42/q59 exact tier): this synthetic
    # corpus is extremely self-similar, so full-corpus buckets blow
    # past the skew cap and get skipped by design — recall guarantees
    # hold modulo that cap (see minhash_lsh_pairs docstring)
    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .filter("doc_id < 100"))
    exact = {(r.i, r.j) for r in
             jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()}
    assert exact, "fixture must contain near-dup pairs"

    ours = {(r.i, r.j) for r in
            minhash_lsh_pairs(docs, "doc_id", "text",
                              threshold=0.8).collect()}

    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    cv = CountVectorizer(inputCol="toks", outputCol="vec", binary=True)
    vecs = cv.fit(toks).transform(toks)
    mh = MinHashLSH(inputCol="vec", outputCol="h", numHashTables=16, seed=7)
    mllib = {(ra, rb) for ra, rb in (
        (r["datasetA"].doc_id, r["datasetB"].doc_id)
        for r in mh.fit(vecs).approxSimilarityJoin(
            vecs, vecs, 0.2 + 1e-9, distCol="jd").collect())
        if ra < rb}

    assert ours <= exact                      # exact-verified: precision 1.0
    assert len(ours & exact) / len(exact) >= 0.9
    assert len(mllib & exact) / len(exact) >= 0.9


def test_cosine_lsh_banding_is_ids_only(spark, embeddings):
    """Round-3 verdict item: the (table, bucket) banding relation must
    not carry embedding arrays — vectors are deferred to a re-join on
    the deduped candidates (same shape as the MinHash tier). Any plan
    Project that outputs a bucket column must not also output a vector
    column (bucket EXPRESSIONS may consume `_v` map-side; the old shape
    projected `_v AS va` alongside `_b`, which is what this pins out)."""
    import re

    df = S.cosine_near_dup_lsh(embeddings.filter(F.col("vec_id") < 50), 0.5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for ln in plan.splitlines():
        if "_b#" not in ln:
            continue
        assert "AS va#" not in ln and "AS vb#" not in ln, ln
        # a bare `_v#N` output entry (not inside an expression) would
        # also ship the vector with the band rows
        assert not re.search(r"[\[, ]_v#\d+[,\]]", ln), ln


def test_ivf_partitioned_layout_prunes_and_matches(spark, embeddings,
                                                   tmp_path):
    """The 100 TB IVF layout: the assigned table persisted
    partitionBy(cluster) gives probes that (a) read ONLY the probed
    clusters' files — asserted via inputFiles against the directory
    layout — and (b) return exactly what the in-memory probe returns."""
    import numpy as np

    from shredder_spark.operators.similarity import IVFIndex, ivf_topk

    q = np.array(
        embeddings.filter(F.col("vec_id") == 0).first()["embedding"],
        dtype=np.float64)
    idx = IVFIndex(n_clusters=8, seed=3).fit(embeddings)
    assigned = idx.assign(embeddings)
    path = str(tmp_path / "ivf")
    idx.write_partitioned(assigned, path)

    probes = set(idx.probe_clusters(q, 2))
    pruned = idx.probe_partitioned(spark, path, q, k=10, n_probe=2,
                                   exclude_id=0)
    # (a) plan-time pruning: the cluster IN (...) predicate must appear
    # as a PartitionFilter on the scan (inputFiles() ignores pushdown,
    # so assert on the physical plan like the other pruning tests)
    from shredder_spark.plans import inspect as P
    plan = P.formatted_plan(pruned)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "cluster" in pf[0], plan[:800]
    import os
    all_clusters = {d for d in os.listdir(path) if d.startswith("cluster=")}
    assert len(all_clusters) > len(probes)  # pruning had something to skip
    # (b) result parity with the in-memory probe
    mem = [(r.vec_id, r.sim) for r in
           ivf_topk(assigned, idx, q, k=10, n_probe=2, exclude_id=0)
           .collect()]
    disk = [(r.vec_id, r.sim) for r in pruned.collect()]
    assert disk == mem


def _mmr_reference(vecs: dict[int, list[float]], qid: int, n_cand: int,
                   k: int, lam: float, mu: float):
    """Independent pure-Python MMR: scalar loops + math.sqrt, no numpy,
    no shared code with the operator. Quantized integer dots make every
    float a fixed IEEE expression, so equality with the operator is
    exact, not approximate."""
    import math

    q = {i: [round(x * 10000) for x in v] for i, v in vecs.items()}
    qq = q[qid]
    qn2 = sum(x * x for x in qq)
    rel = {}
    for i, v in q.items():
        if i == qid:
            continue
        n2 = sum(x * x for x in v)
        if n2 == 0 or qn2 == 0:
            continue
        rel[i] = (sum(a * b for a, b in zip(v, qq))
                  / (math.sqrt(n2) * math.sqrt(qn2)))
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:n_cand]

    def sim(a, b):
        na = math.sqrt(sum(x * x for x in q[a]))
        nb = math.sqrt(sum(x * x for x in q[b]))
        return sum(x * y for x, y in zip(q[a], q[b])) / (na * nb)

    selected, out = [], []
    for step in range(1, min(k, len(cand)) + 1):
        best = None
        for c in cand:
            if c in selected:
                continue
            if selected:
                score = lam * rel[c] - mu * max(sim(c, s) for s in selected)
            else:
                score = lam * rel[c]
            if best is None or score > best[0] or (score == best[0]
                                                   and c < best[1]):
                best = (score, c)
        out.append((step, best[1], rel[best[1]], best[0]))
        selected.append(best[1])
    return out


@pytest.mark.parametrize("lam,mu", [(0.7, 0.3), (0.5, 0.5)])
def test_mmr_rerank_matches_pure_python_reference(spark, lam, mu):
    """Greedy MMR vs an independent scalar reference, on vectors crafted
    so (a) the MMR order DIFFERS from the relevance order (a near-dup of
    pick 1 gets demoted) and (b) negative similarities occur (the
    penalty term must keep them negative, not floor at 0)."""
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],           # query
        1: [0.95, 0.05, 0.0, 0.0],         # top relevance
        2: [0.94, 0.06, 0.0, 0.0],         # near-dup of 1 -> demoted
        3: [0.5, 0.866, 0.0, 0.0],
        4: [0.5, -0.866, 0.0, 0.0],        # negative sim to 3
        5: [-0.3, 0.9, 0.0, 0.0],          # negative rel + negative sims
        6: [0.2, 0.1, 0.9, 0.0],
        7: [0.1, 0.0, 0.0, 0.99],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>")
    got = [(r.step, r.vec_id, r.rel, r.score)
           for r in S.mmr_rerank(df, 0, n_candidates=6, k=4,
                                 lam=lam, mu=mu).collect()]
    want = _mmr_reference(vecs, 0, n_cand=6, k=4, lam=lam, mu=mu)
    assert got == want  # exact: same integer dots, same IEEE float ops
    assert got[0][1] == 1
    if mu >= 0.5:
        # diversification engaged: at equal weighting the near-dup of
        # pick 1 must be demoted (at mu=0.3 relevance legitimately wins)
        assert got[1][1] != 2, "MMR must demote the near-duplicate of pick 1"


def test_mmr_rerank_excludes_zero_norm_and_caps_k(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]),
            (3, [1e-9, 0.0])]  # 2: zero vector; 3: quantizes to zero
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rows = S.mmr_rerank(df, 0, n_candidates=10, k=5).collect()
    assert [r.vec_id for r in rows] == [1]  # only the finite-norm survivor
    assert [r.step for r in rows] == [1]


def test_similarity_tiers_tolerate_degenerate_vectors(spark):
    """NULL / empty / zero-norm vectors must be excluded, not crash or
    corrupt: the Arrow tiers build rectangular matrices (ragged input
    either throws vstack or — worse — silently misaligns a zero-copy
    reshape), so every tier filters JVM-side before Python."""
    import numpy as np

    rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)], i % 3)
            for i in range(12)]
    rows += [(12, None, 0), (13, [], 1), (14, [0.0] * 8, 2)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")

    idx = S.IVFIndex(n_clusters=3, seed=1).fit(df)
    assigned = idx.assign(df)
    got = {r.id for r in assigned.collect()}
    assert got == set(range(12)) | {14}  # NULL+empty dropped; zero assignable

    normed = S.normalize_embeddings_arrow(df)
    out = {r.vec_id for r in normed.collect()}
    assert out == set(range(12)) | {14}
    z = [r.nv for r in normed.collect() if r.vec_id == 14][0]
    assert all(v == 0.0 for v in z)  # zero vector stays zero (1e-12 floor)

    blocked = S.cosine_topk_blocked(df, [1.0] + [0.0] * 7, k=20)
    ids = [r.vec_id for r in blocked.collect()]
    assert 12 not in ids and 13 not in ids and 14 not in ids

    surv = S.semdedup(df.filter(F.col("embedding").isNotNull()
                                & (F.size("embedding") > 0)),
                      threshold=0.99, n_clusters=2, seed=1)
    assert surv.count() >= 1


def test_simhash_arrow_tier_equals_catalyst_fold(spark, documents):
    """The Arrow bit-vote tier must produce bit-identical fingerprints
    to the Catalyst fold definition — the vote is exact integer math,
    so equality is exact, including the sign bit (bit 63)."""
    th = documents.select(
        "doc_id",
        F.transform(F.split(F.col("text"), " "),
                    lambda t: F.xxhash64(t)).alias("th"))
    both = th.select(
        "doc_id",
        D.simhash_from_hashes(F.col("th")).alias("a"),
        D.simhash_from_hashes_arrow()(F.col("th")).alias("b"))
    bad = both.filter(~F.col("a").eqNullSafe(F.col("b"))).count()
    assert bad == 0
    # degenerate strings too (empty -> [''] token; single token)
    deg = spark.createDataFrame([(0, ""), (1, "x"), (2, "a b a")],
                                "doc_id long, text string")
    th2 = deg.select(
        "doc_id",
        F.transform(F.split(F.col("text"), " "),
                    lambda t: F.xxhash64(t)).alias("th"))
    rows = th2.select(
        D.simhash_from_hashes(F.col("th")).alias("a"),
        D.simhash_from_hashes_arrow()(F.col("th")).alias("b")).collect()
    assert all(r.a == r.b for r in rows)
