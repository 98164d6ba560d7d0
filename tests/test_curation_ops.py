"""Invariant tests for the training-data curation queries (q138,
q141, q145): properties the DuckDB hash-compare can't express —
coverage, error bounds, determinism across runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from shredder_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_chunking_covers_every_token(spark):
    """q141: size-8/stride-4 windows — every token position of every
    doc falls inside at least one chunk, no chunk exceeds 8 tokens,
    and starts step by the stride."""
    chunks = Q.registry()["q141_doc_chunking"].run(spark, SF_DIR)
    docs = spark.table("documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    per_doc = (chunks
               .withColumn("c_len", F.size(F.split("chunk", " ")))
               .groupBy("doc_id")
               .agg(F.max("c_len").alias("max_len"),
                    F.min("chunk_start").alias("first_start"),
                    F.max("chunk_start").alias("last_start"),
                    F.count("*").alias("n_chunks"))
               .join(docs, "doc_id"))
    bad = per_doc.filter(
        (F.col("max_len") > 8)
        | (F.col("first_start") != 1)
        # coverage: the last chunk must reach the final token
        | (F.col("last_start") + 8 <= F.col("n_tok"))
        # starts are 1, 5, 9, ... up to greatest(n_tok-4, 1)
        | (F.col("n_chunks")
           != F.floor((F.greatest(F.col("n_tok") - 4, F.lit(1)) - 1) / 4) + 1))
    assert bad.count() == 0


def test_quantization_error_bound(spark):
    """q145: dequantized values sit within half a quantization step
    (scale/127/2, plus fp slack) of the original embedding."""
    q = Q.registry()["q145_embedding_quantization"].run(spark, SF_DIR)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    j = (q.withColumn("qv", F.transform(F.split("q", ","),
                                        lambda s: s.cast("int")))
          .join(emb, "vec_id"))
    # max |orig - q*scale/127| over all dims; scale column is rounded
    # to 4 decimals in the query, so allow that rounding slack too
    err = j.select(
        F.aggregate(
            F.zip_with("v", "qv", lambda x, qi:
                       F.abs(x - qi * F.col("scale") / F.lit(127.0))),
            F.lit(0.0), lambda a, x: F.greatest(a, x)).alias("max_err"),
        (F.col("scale") / 254.0 + F.lit(1e-4)).alias("bound"))
    assert err.filter(F.col("max_err") > F.col("bound")).count() == 0
    # int8 range respected
    rng = j.select(F.array_max("qv").alias("mx"), F.array_min("qv").alias("mn"))
    assert rng.filter((F.col("mx") > 127) | (F.col("mn") < -127)).count() == 0


def test_hash_sample_deterministic_and_stratified(spark):
    """q138: identical row set across runs (no RAND anywhere), and the
    per-lang acceptance thresholds actually bite: the 'en' rate must be
    below the non-en rate."""
    run1 = Q.registry()["q138_hash_stratified_sample"].run(spark, SF_DIR).collect()
    run2 = Q.registry()["q138_hash_stratified_sample"].run(spark, SF_DIR).collect()
    assert run1 == run2
    sampled = {r.doc_id for r in run1}
    docs = spark.table("documents").select("doc_id", "lang").collect()
    by_lang: dict[str, list[int]] = {}
    for r in docs:
        by_lang.setdefault("en" if r.lang == "en" else "rest", []).append(
            r.doc_id in sampled)
    rate_en = sum(by_lang["en"]) / len(by_lang["en"])
    rate_rest = sum(by_lang["rest"]) / len(by_lang["rest"])
    # thresholds are '4'/16 vs '8'/16 of the hex space
    assert rate_en < rate_rest


def test_dedupe_keepers_no_surviving_pairs(spark):
    """q155's operator: after greedy keep-lowest-id dedup, re-running
    pair detection on the keepers finds nothing (greedy drops every
    pair's j, so it can over-drop chains but never leave a pair)."""
    from shredder_spark.catalog import register_views
    from shredder_spark.operators.dedup import dedupe_keepers, minhash_lsh_pairs

    register_views(spark, SF_DIR)
    docs = spark.table("documents")
    # cap disabled on both sides: with a finite max_bucket_size, a
    # bucket can be over-cap (skipped) on the full corpus yet under-cap
    # after dropping docs, surfacing pairs the first pass never saw —
    # the no-survivor guarantee is modulo the skew cap
    no_cap = dict(threshold=0.8, max_bucket_size=1_000_000_000)
    kept = dedupe_keepers(docs, "doc_id", "text", **no_cap)
    assert kept.count() > 0
    survivors = minhash_lsh_pairs(kept, "doc_id", "text", **no_cap)
    assert survivors.count() == 0
    # keepers are a subset of the corpus
    assert kept.join(docs, "doc_id", "left_anti").count() == 0


def test_curation_pipeline_stage_invariants(spark):
    """q160's operator: every chunk comes from a doc that (a) scores
    >= the quality floor, (b) survived dedup, (c) passed the sample
    predicate; and chunk coverage holds on the final output."""
    import pyspark.sql.functions as F

    from shredder_spark.catalog import register_views
    from shredder_spark.functions.text import with_quality_score
    from shredder_spark.operators.curation import curate_corpus, sample_predicate

    register_views(spark, SF_DIR)
    docs = spark.table("documents")
    chunks = curate_corpus(docs, sample_rate_hex={"en": "4"})
    out_docs = chunks.select("doc_id").distinct()
    assert out_docs.count() > 0

    # (a) quality floor
    scored = with_quality_score(docs)
    low_q = scored.filter(F.col("q") < 0.5).select("doc_id")
    assert out_docs.join(low_q, "doc_id", "left_semi").count() == 0
    # (c) sample predicate is deterministic, so re-evaluating it on the
    # output docs must accept all of them
    rejected = (docs.join(out_docs, "doc_id", "left_semi")
                .filter(~sample_predicate("doc_id", {"en": "4"}, "lang")))
    assert rejected.count() == 0
    # coverage on the final chunks (q141 invariant, re-checked here on
    # the composed pipeline)
    per_doc = (chunks.groupBy("doc_id")
               .agg(F.max("chunk_start").alias("last_start"))
               .join(docs.select("doc_id",
                                 F.size(F.split("text", " ")).alias("n_tok")),
                     "doc_id"))
    assert per_doc.filter(F.col("last_start") + 8 <= F.col("n_tok")).count() == 0


def test_connected_components_matches_union_find(spark):
    """Min-label propagation must produce exactly the components a
    pure-Python union-find computes on the same edge list."""
    from shredder_spark.catalog import register_views
    from shredder_spark.operators.dedup import (
        connected_components, minhash_lsh_pairs)

    register_views(spark, SF_DIR)
    docs = spark.table("documents")
    pairs = [(r.i, r.j) for r in
             minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()]
    assert pairs  # the synthetic corpus has near-dups

    parent: dict[int, int] = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for i, j in pairs:
        union(i, j)
    expected = {x: find(x) for x in parent}

    got = {r.id: r.cluster for r in connected_components(
        spark.createDataFrame(pairs, "i long, j long")).collect()}
    assert got == expected


def test_clustered_keepers_one_per_component(spark):
    from shredder_spark.catalog import register_views
    from shredder_spark.operators.dedup import (
        connected_components, dedupe_keepers_clustered, minhash_lsh_pairs)

    register_views(spark, SF_DIR)
    docs = spark.table("documents")
    kept = dedupe_keepers_clustered(docs, "doc_id", "text", threshold=0.8)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    cc = connected_components(pairs.select("i", "j"))
    n_components = cc.select("cluster").distinct().count()
    n_clustered_docs = cc.count()
    # keepers = all docs minus non-representative members
    assert kept.count() == docs.count() - (n_clustered_docs - n_components)


def test_dataframe_stat_tier(spark):
    """df.stat surface: crosstab matches groupBy counts, freqItems
    contains every true heavy hitter, sampleBy respects strata
    fractions, approxQuantile brackets the exact quantile, and
    cov/corr match the SQL aggregate forms."""
    from shredder_spark.catalog import register_views
    register_views(spark, SF_DIR)
    docs = spark.table("documents")
    orders = spark.table("orders")

    # crosstab(lang, source) == pivoted groupBy().count()
    ct = {(r["lang_source"], c): int(r[c])
          for r in docs.stat.crosstab("lang", "source").collect()
          for c in r.asDict() if c != "lang_source"}
    exact = {(r.lang, r.source): r["count"]
             for r in docs.groupBy("lang", "source").count().collect()}
    for (lang, src), n in exact.items():
        assert ct[(lang, src)] == n
    assert sum(ct.values()) == docs.count()

    # freqItems at support 0.1 must include any value with true
    # frequency above that support
    freq = docs.stat.freqItems(["lang"], 0.1).collect()[0][0]
    n_docs = docs.count()
    true_heavy = [r.lang for r in docs.groupBy("lang").count()
                  .where(F.col("count") > 0.1 * n_docs).collect()]
    assert set(true_heavy) <= set(freq)

    # sampleBy: only requested strata appear; per-stratum size within
    # loose binomial bounds of the requested fraction
    fracs = {"en": 0.5, "de": 0.2}
    sample = docs.stat.sampleBy("lang", fracs, seed=7)
    got = {r.lang: r["count"]
           for r in sample.groupBy("lang").count().collect()}
    assert set(got) <= set(fracs)
    full = {r.lang: r["count"]
            for r in docs.groupBy("lang").count().collect()}
    for lang, frac in fracs.items():
        assert 0.3 * frac * full[lang] <= got.get(lang, 0) \
            <= 2.0 * frac * full[lang]

    # approxQuantile with rel.err 0.01 brackets the exact median
    lo, med, hi = orders.stat.approxQuantile(
        "o_totalprice", [0.25, 0.5, 0.75], 0.01)
    exact_med = orders.selectExpr(
        "percentile(o_totalprice, 0.5) AS m").collect()[0].m
    n = orders.count()
    rank_lo = orders.where(F.col("o_totalprice") <= med).count()
    assert 0.49 * n - 0.01 * n <= rank_lo  # within rel-err of the rank
    assert lo <= med <= hi and abs(med - exact_med) / exact_med < 0.1

    # cov/corr match the SQL aggregates
    cov = orders.stat.cov("o_totalprice", "o_custkey")
    corr = orders.stat.corr("o_totalprice", "o_custkey")
    row = orders.selectExpr(
        "covar_samp(o_totalprice, o_custkey) AS cv",
        "corr(o_totalprice, o_custkey) AS cr").collect()[0]
    assert abs(cov - row.cv) < 1e-6 * max(1.0, abs(row.cv))
    assert abs(corr - row.cr) < 1e-9
