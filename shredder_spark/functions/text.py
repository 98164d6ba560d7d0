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


def with_quality_score(df, text_col: str = "text", out_col: str = "q"):
    """DataFrame-level quality score: same arithmetic as
    :func:`quality_score`, ~5× faster. The column version references
    each metric inside ``when`` conditions, and Catalyst's
    CollapseProject would duplicate those expensive subtrees if they
    were inlined — staging them as intermediate columns (expensive +
    multiply-referenced → the optimizer keeps the projection split)
    computes each split/regexp pass exactly once per row."""
    c = F.col(text_col)
    staged = (
        df.withColumn("_qs_n", F.length(c).cast("double"))
        .withColumn("_qs_mwl", mean_word_len(c))
        .withColumn("_qs_pr", punct_ratio(c))
        .withColumn("_qs_sr", stopword_ratio(c))
    )
    score = (
        F.when((F.col("_qs_n") >= 50) & (F.col("_qs_n") <= 20000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((F.col("_qs_mwl") >= 3) & (F.col("_qs_mwl") <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("_qs_pr") <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("_qs_sr") >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return (staged.withColumn(out_col, score)
            .drop("_qs_n", "_qs_mwl", "_qs_pr", "_qs_sr"))


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
    non-CSE rationale as :func:`with_quality_score`)."""
    langs = sorted(LANG_STOPWORDS)
    staged = df.withColumn("_lid_toks", tokens(F.col(text_col)))
    for lang in langs:
        words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        staged = staged.withColumn(
            f"_lid_{lang}", F.size(F.array_intersect(F.col("_lid_toks"), words)))
    staged = staged.withColumn(
        "_lid_best", F.greatest(*[F.col(f"_lid_{lang}") for lang in langs]))
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when((F.col(f"_lid_{lang}") == F.col("_lid_best"))
                     & (F.col("_lid_best") >= 1), F.lit(lang)).otherwise(out)
    return (staged.withColumn(out_col, out)
            .drop("_lid_toks", "_lid_best", *[f"_lid_{lang}" for lang in langs]))
