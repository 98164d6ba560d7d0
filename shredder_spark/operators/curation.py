"""End-to-end training-data curation pipeline (north-star capstone):

    quality filter -> near-dup dedup -> deterministic sample -> chunk

Composed from the individually-verified operators as ONE lazy DataFrame
plan — no materialization barriers, no collect. Every stage is a
Catalyst transformation, so at 100 TB the whole pipeline is:
scan -> per-row scoring (codegen) -> LSH keyed shuffles -> anti join ->
scan-filter sample -> per-row chunk explode. Reference parity: this is
the query-surface generalization of the reference's single fixed
scan->transform->sink pipeline (CLI.go:30-63).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from shredder_spark.functions.text import with_quality_score
from shredder_spark.operators.dedup import dedupe_keepers


def sample_predicate(id_col: str, rate_hex: dict[str, str],
                     strata_col: str, default_hex: str = "8"):
    """Deterministic MD5-threshold sample predicate (engine-independent,
    reproducible — the q138 pattern). ``rate_hex`` maps stratum value ->
    first-hex-digit threshold ('4' ~ 25%, '8' ~ 50%)."""
    first = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    thresh = F.lit(default_hex)
    for k, v in sorted(rate_hex.items()):
        thresh = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(thresh)
    return first < thresh


def chunk_tokens(df: DataFrame, text_col: str = "text",
                 size: int = 8, stride: int = 4) -> DataFrame:
    """Overlapping token-window chunking (the q141 semantics: the start
    sequence runs to n_tok-(stride), so trailing tokens are never
    dropped; the final chunk may be shorter than ``size``)."""
    tk = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(tk) - (size - stride), F.lit(1)),
        F.lit(stride))
    return (df.withColumn("_tk", tk)
              .withColumn("chunk_start", F.explode(starts))
              .withColumn("chunk", F.array_join(
                  F.slice("_tk", F.col("chunk_start"), size), " "))
              .drop("_tk"))


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_quality: float = 0.5,
    dedup_threshold: float = 0.8,
    sample_rate_hex: dict[str, str] | None = None,
    chunk_size: int = 8,
    chunk_stride: int = 4,
) -> DataFrame:
    """The full pipeline; returns the chunked corpus with provenance
    columns (id, lang, quality score, chunk_start, chunk)."""
    scored = with_quality_score(docs, text_col=text_col, out_col="q")
    kept = scored.filter(F.col("q") >= min_quality)
    deduped = dedupe_keepers(kept, id_col, text_col,
                             threshold=dedup_threshold)
    if sample_rate_hex:
        deduped = deduped.filter(
            sample_predicate(id_col, sample_rate_hex, lang_col))
    return chunk_tokens(deduped, text_col=text_col,
                        size=chunk_size, stride=chunk_stride) \
        .select(id_col, lang_col, "q", "chunk_start", "chunk")
