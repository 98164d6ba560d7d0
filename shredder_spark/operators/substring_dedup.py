"""Exact cross-document substring dedup (ExactSubstr tier).

Implements the public method of Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499): find
every substring of length >= ``min_len`` characters that occurs
verbatim in two different documents, so the duplicated character
ranges can be removed or down-weighted. The paper builds one giant
suffix array over the concatenated corpus — a single-machine design.
The Spark-native shape replaces the global suffix array with
positioned winnowing anchors (Schleimer et al. 2003), whose guarantee
is exactly what a duplicate detector needs:

  any substring shared verbatim by two documents with length
  >= k + w - 1 selects at least one identical, content-aligned
  (k-gram hash, offset) anchor in BOTH documents.

With ``w = min_len - k + 1`` the guarantee length equals ``min_len``,
so candidate generation misses nothing; an exact bidirectional
extension pass then recovers the *maximal* matching span around each
anchor and discards hash collisions, making the final output exact —
identical to what the suffix-array formulation reports (golden-tested
against a pure-Python suffix-array/DP reference in
``tests/test_substring_dedup.py``).

Plan shape (the 100 TB posture):
  1. anchors per doc — one vectorized pandas UDF (numpy rolling
     hashes, no per-char Python), emitted as (id, pos, hash) ONLY;
  2. one equi-join shuffle on the anchor hash groups bucket members;
     pairs are generated in-array from a single groupBy (same shape
     as the MinHash tier, ``dedup.minhash_lsh_pairs``), with a
     ``max_bucket_size`` skew cap for degenerate anchors;
  3. document text is re-joined only for the (much smaller) candidate
     set; extension is an Arrow-batched pandas UDF bounded by the
     span length. No n² stage anywhere, no collect.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

_BASE = 1_000_003
_MOD = (1 << 61) - 1


def positioned_anchors(text_col: str = "text", k: int = 16, w: int = 45) -> Column:
    """Winnowing-selected k-gram anchors WITH character offsets, as
    array<struct<pos:int, h:bigint>> over the RAW text (no case or
    whitespace folding — spans must map back to exact character
    ranges). Positions are character (not byte) offsets: the text is
    viewed as a uint32 codepoint array via UTF-32."""

    @F.pandas_udf("array<struct<pos:int, h:bigint>>")
    def _anchors(texts: pd.Series) -> pd.Series:
        import numpy as np

        weights = np.array(
            [pow(_BASE, k - 1 - j, _MOD) for j in range(k)], dtype=np.int64)

        def one(text):
            s = text or ""
            if len(s) < k:
                return []
            c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            grams = np.lib.stride_tricks.sliding_window_view(c, k)
            hashes = (grams % _MOD) @ weights % _MOD
            n_win = max(len(hashes) - w + 1, 1)
            wins = np.lib.stride_tricks.sliding_window_view(
                hashes, min(w, len(hashes)))[:n_win]
            # rightmost minimum per window — content-deterministic, so
            # both copies of a shared substring pick aligned anchors
            rev_arg = wins.shape[1] - 1 - np.argmin(wins[:, ::-1], axis=1)
            pos = np.arange(n_win) + rev_arg
            hs = wins[np.arange(n_win), rev_arg]
            seen: dict = {}
            for p, h in zip(pos.tolist(), hs.tolist()):
                seen.setdefault((p, h))
            return [{"pos": p, "h": h} for p, h in seen]

        return texts.map(one)

    return _anchors(F.col(text_col))


def duplicate_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_len: int = 60,
    k: int = 16,
    max_bucket_size: int = 64,
) -> DataFrame:
    """All maximal cross-document duplicated spans of length >=
    ``min_len`` characters. Columns: i, j (doc ids, i < j), i_start,
    j_start (character offsets), length. Exact modulo only the
    ``max_bucket_size`` skew cap (anchors whose hash bucket exceeds
    the cap are skipped; a span is still found if any of its other
    anchors survives — same caveat as the MinHash tier)."""
    assert min_len >= k, "min_len must be >= the k-gram size"
    w = min_len - k + 1

    from shredder_spark.partitioning import spread_small_input
    src = spread_small_input(
        df.select(F.col(id_col).alias("_id"),
                  F.col(text_col).alias("_text")), "_id")

    # (id, pos, h) only — the anchor shuffle never ships text
    anch = (src.select("_id", F.explode(
                positioned_anchors("_text", k, w)).alias("a"))
               .select("_id", F.col("a.pos").alias("_pos"), F.col("a.h").alias("_h")))

    # one shuffle: bucket members per anchor hash, pairs in-array
    buckets = (anch.groupBy("_h")
               .agg(F.sort_array(F.collect_list(F.struct("_id", "_pos"))).alias("_m"))
               .filter((F.size("_m") >= 2) & (F.size("_m") <= max_bucket_size)))
    pairs = (buckets.select(F.explode(F.expr(
        "flatten(transform(_m, (x, ix) -> "
        "transform(filter(slice(_m, ix + 2, size(_m)), y -> y._id != x._id), "
        "y -> struct(x._id as i, x._pos as pi, y._id as j, y._pos as pj))))"
    )).alias("p")).select("p.*").distinct())

    # text re-joined for the candidate set only
    ti = src.select(F.col("_id").alias("i"), F.col("_text").alias("_ti"))
    tj = src.select(F.col("_id").alias("j"), F.col("_text").alias("_tj"))
    cand = pairs.join(ti, "i").join(tj, "j")

    # extension runs as mapInPandas, not a pandas UDF expression: the
    # length filter lives INSIDE the pass, so Catalyst cannot push a
    # filter through the projection and evaluate the UDF twice (the
    # expression form measurably produced two ArrowEvalPython nodes —
    # one for the filter, one for the output projection)
    def _extend(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {"i": [], "j": [], "i_start": [], "j_start": [],
                    "length": []}
            for i_, j_, ti_, tj_, pi, pj in zip(
                    pdf["i"], pdf["j"], pdf["_ti"], pdf["_tj"],
                    pdf["pi"], pdf["pj"]):
                pi, pj = int(pi), int(pj)
                if ti_[pi:pi + k] != tj_[pj:pj + k]:  # hash collision
                    continue
                a, b = pi, pj
                while a > 0 and b > 0 and ti_[a - 1] == tj_[b - 1]:
                    a -= 1; b -= 1
                ea, eb, n, m = pi + k, pj + k, len(ti_), len(tj_)
                while ea < n and eb < m and ti_[ea] == tj_[eb]:
                    ea += 1; eb += 1
                if ea - a < min_len:
                    continue
                rows["i"].append(i_); rows["j"].append(j_)
                rows["i_start"].append(a); rows["j_start"].append(b)
                rows["length"].append(ea - a)
            if rows["i"]:
                yield pd.DataFrame(rows)

    spans = (cand.mapInPandas(
                 _extend,
                 "i long, j long, i_start int, j_start int, length int")
             .distinct())
    return spans.orderBy("i", "j", "i_start", "j_start")


def duplicated_char_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_len: int = 60,
    k: int = 16,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Per-document duplicated-character accounting, the ExactSubstr
    removal driver: union the [start, start+length) ranges of every
    cross-doc duplicated span a document participates in, merge
    overlaps (gaps-and-islands, windowed per doc — never global), and
    report (doc_id, dup_chars, n_spans). Docs with no duplicated span
    are absent (left-join + zero-fill at the call site if needed)."""
    spans = duplicate_substring_spans(
        df, id_col, text_col, min_len=min_len, k=k,
        max_bucket_size=max_bucket_size)
    side_i = spans.select(F.col("i").alias("doc_id"),
                          F.col("i_start").alias("s"),
                          (F.col("i_start") + F.col("length")).alias("e"))
    side_j = spans.select(F.col("j").alias("doc_id"),
                          F.col("j_start").alias("s"),
                          (F.col("j_start") + F.col("length")).alias("e"))
    iv = side_i.unionByName(side_j).distinct()
    prev = (Window.partitionBy("doc_id").orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, -1))
    iv = iv.withColumn(
        "_new", F.when(F.col("s") > F.coalesce(F.max("e").over(prev),
                                               F.lit(-1)), 1).otherwise(0))
    isl = (Window.partitionBy("doc_id").orderBy("s", "e")
           .rowsBetween(Window.unboundedPreceding, 0))
    iv = iv.withColumn("_isl", F.sum("_new").over(isl))
    merged = (iv.groupBy("doc_id", "_isl")
              .agg(F.min("s").alias("ms"), F.max("e").alias("me")))
    return (merged.groupBy("doc_id")
            .agg(F.sum(F.col("me") - F.col("ms")).cast("long").alias("dup_chars"),
                 F.count("*").cast("long").alias("n_spans"))
            .orderBy("doc_id"))
