"""Text-analysis functions for training-data pipelines (B74/B75 +
north-star extensions): language ID, quality scoring, token counting,
fingerprinting. All pure Catalyst expressions — deterministic,
SQL-oracle-reproducible, zero Python in the row path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
# Deliberately small + frozen: the declared oracle reproduces the exact
# same lists, so lang_id is hash-verifiable (unlike a model-based LID).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es": ("el", "la", "los", "y", "es", "una", "que", "no"),
}


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def stopword_hits(text: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens(text), words))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, 'und'
    (undetermined) when no list scores ≥1. Ties break by language code
    order (deterministic)."""
    scores = [(lang, stopword_hits(text, lang)) for lang in sorted(LANG_STOPWORDS)]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, score in reversed(scores):
        out = F.when((score == best_score) & (best_score >= 1), F.lit(lang)).otherwise(out)
    return out


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (the Q51 convention)."""
    return F.size(F.split(text, r"\s+")).cast("bigint")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: word-piece regex (letter runs, digit runs,
    single punctuation) — a deterministic stand-in for a real tokenizer
    with the same plumbing shape."""
    return F.size(F.regexp_extract_all(
        F.lower(text), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), F.lit(1))).cast("bigint")


def punct_ratio(text: Column) -> Column:
    total = F.length(text).cast("double")
    punct = (F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))).cast("double")
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    words = F.array(*[F.lit(w) for w in all_stop])
    toks = tokens(text)
    return F.when(F.size(toks) > 0,
                  F.size(F.filter(toks, lambda t: F.array_contains(words, t)))
                  / F.size(toks).cast("double")).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    return F.when(F.size(toks) > 0,
                  F.aggregate(toks, F.lit(0).cast("long"),
                              lambda acc, t: acc + F.length(t)) / F.size(toks).cast("double")
                  ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + sane mean word
    length + low punctuation + nonzero stopword ratio. A deterministic
    mirror of the Gopher/C4-style rule filters (PAPERS.md), expressible
    in portable SQL for oracle verification."""
    n = F.length(text).cast("double")
    len_ok = F.when((n >= 50) & (n <= 20000), F.lit(0.25)).otherwise(F.lit(0.0))
    mwl = mean_word_len(text)
    mwl_ok = F.when((mwl >= 3) & (mwl <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    return len_ok + mwl_ok + punct_ok + stop_ok


def _spread(df):
    """Local-parallelism guard (guide §2.5 "input skew: one huge
    unsplittable file … repartition immediately after the read"): the
    local parquet fixtures are single-row-group files, so the scan is
    ONE split and every per-doc metric projection would run in a
    single task. Spread the rows across the session's cores before the
    heavy projection; on a real cluster the scan already has thousands
    of splits and this is a no-op (same pattern as
    ``operators.dedup.minhash_lsh_pairs``)."""
    from shredder_spark.partitioning import spread_small_input
    return spread_small_input(df)


def _stage_suffix(cols, names) -> str:
    """Staging-name suffix that avoids colliding with input columns
    (an input already carrying e.g. ``_qs_n`` would otherwise make the
    staged projection ambiguous)."""
    sfx, k = "", 0
    while {f"{n}{sfx}" for n in names} & set(cols):
        k += 1
        sfx = str(k)
    return sfx


def _qs_stage_sql(c: str, sfx: str = "") -> list[str]:
    """SQL-text twins of the four staged quality metrics (r12, guide
    §1.2 "per-task work" applied to the DRIVER, same pattern as
    ``dedup._minhash_sql``: composing these expression trees as Column
    objects costs ~0.35 s of py4j round-trips per call; one parse of
    the identical expressions is ~20 ms). Bit-equality vs the scalar
    :func:`quality_score` is pinned in
    tests/test_llm_ops.py::test_with_quality_score_matches_scalar."""
    toks_w = f"split(trim({c}), '\\\\s+')"
    toks_l = f"split(lower({c}), '\\\\s+')"
    stop = "array(" + ", ".join(
        f"'{w}'" for w in sorted({w for ws in LANG_STOPWORDS.values()
                                  for w in ws})) + ")"
    return [
        f"cast(length({c}) as double) AS _qs_n{sfx}",
        f"CASE WHEN size({toks_w}) > 0 THEN "
        f"aggregate({toks_w}, cast(0 as bigint), (acc, t) -> acc + length(t))"
        f" / cast(size({toks_w}) as double) ELSE 0.0D END AS _qs_mwl{sfx}",
        f"CASE WHEN cast(length({c}) as double) > 0 THEN "
        f"cast(length({c}) - length(regexp_replace({c}, '[^\\\\w\\\\s]', ''))"
        f" as double) / cast(length({c}) as double) ELSE 0.0D END AS _qs_pr{sfx}",
        f"CASE WHEN size({toks_l}) > 0 THEN "
        f"cast(size(filter({toks_l}, t -> array_contains({stop}, t))) as "
        f"double) / cast(size({toks_l}) as double) ELSE 0.0D END AS _qs_sr{sfx}",
    ]


def _qs_score_sql(sfx: str = "") -> str:
    return (
        f"CASE WHEN _qs_n{sfx} >= 50 AND _qs_n{sfx} <= 20000 THEN 0.25D ELSE 0.0D END"
        f" + CASE WHEN _qs_mwl{sfx} >= 3 AND _qs_mwl{sfx} <= 12 THEN 0.25D ELSE 0.0D END"
        f" + CASE WHEN _qs_pr{sfx} <= 0.2D THEN 0.25D ELSE 0.0D END"
        f" + CASE WHEN _qs_sr{sfx} >= 0.05D THEN 0.25D ELSE 0.0D END")


_QS_SCORE_SQL = _qs_score_sql()


def with_quality_score(df, text_col: str = "text", out_col: str = "q"):
    """DataFrame-level quality score: same arithmetic as
    :func:`quality_score`, ~5× faster. The column version references
    each metric inside ``when`` conditions, and Catalyst's
    CollapseProject would duplicate those expensive subtrees if they
    were inlined — staging them as intermediate columns (expensive +
    multiply-referenced → the optimizer keeps the projection split)
    computes each split/regexp pass exactly once per row. Expressions
    are built as parsed SQL text (see :func:`_qs_stage_sql`)."""
    df = _spread(df)
    sfx = _stage_suffix(df.columns, ("_qs_n", "_qs_mwl", "_qs_pr", "_qs_sr"))
    staged = df.selectExpr("*", *_qs_stage_sql(text_col, sfx))
    # one projection for score+drop (each DataFrame op re-runs the
    # analyzer eagerly; fewer ops = less driver latency per call).
    # ``withColumn`` replacement semantics: an existing out_col is
    # replaced in place, never duplicated (ADVICE r12).
    score = f"({_qs_score_sql(sfx)}) AS {out_col}"
    cols = [score if c == out_col else c for c in df.columns]
    if out_col not in df.columns:
        cols.append(score)
    return staged.selectExpr(*cols)


def doc_fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 content fingerprint (md5 exists in
    Spark and DuckDB → hash-verifiable; see dedup.content_fingerprint)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def register_tokenize_udtf(spark) -> None:
    """Python UDTF surface (B50): a table function emitting (tok, pos)
    per whitespace token. UDTFs run Arrow-batched on executors in
    Spark 4; use for fan-out transforms that need full Python (real
    subword tokenizers slot in here — the built-in posexplode(split())
    path, Q70, stays the JVM fast path for plain splitting)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split()):
                yield t, i

    spark.udtf.register("tokenize_py", Tokenize)


def with_lang_id(df, text_col: str = "text", out_col: str = "lid"):
    """DataFrame-level language ID: same decision rule as
    :func:`lang_id`, with the token split and the four stopword scores
    staged as intermediate columns so the split/lower pass runs once
    per row instead of once per score reference (same Catalyst
    non-CSE rationale as :func:`with_quality_score`). Expressions are
    built as parsed SQL text (r12, same driver-latency rationale as
    :func:`_qs_stage_sql`; decision-rule equality vs :func:`lang_id`
    pinned in tests/test_llm_ops.py::test_with_lang_id_matches_scalar)."""
    langs = sorted(LANG_STOPWORDS)
    df = _spread(df)
    sfx = _stage_suffix(
        df.columns, ["_lid_toks", "_lid_best"] + [f"_lid_{L}" for L in langs])
    toks = f"split(lower({text_col}), '\\\\s+')"
    score_exprs = [
        f"size(array_intersect(_lid_toks{sfx}, array("
        + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        + f"))) AS _lid_{lang}{sfx}"
        for lang in langs]
    best = "greatest(" + ", ".join(f"_lid_{lang}{sfx}" for lang in langs) + ")"
    case = ("CASE " + " ".join(
        f"WHEN _lid_{lang}{sfx} = _lid_best{sfx} AND _lid_best{sfx} >= 1 "
        f"THEN '{lang}'"
        for lang in langs) + " ELSE 'und' END")
    staged = (df
              .selectExpr("*", f"{toks} AS _lid_toks{sfx}")
              .selectExpr("*", *score_exprs)
              .selectExpr("*", f"{best} AS _lid_best{sfx}"))
    return (staged.withColumn(out_col, F.expr(case))
            .drop(f"_lid_toks{sfx}", f"_lid_best{sfx}",
                  *[f"_lid_{lang}{sfx}" for lang in langs]))
