"""Iterative graph algorithms on DataFrames (extension surface beyond
the reference, companion to ``dedup.connected_components``).

Same scale discipline as CC (SURVEY B188): every iteration is keyed
shuffles only (join + aggregate), each round's state is eagerly
``localCheckpoint``-ed to truncate lineage (a real cluster should use
``checkpoint()`` with a checkpoint dir for fault tolerance), and the
edge list is checkpointed once up front. GraphX/GraphFrames are
deliberately avoided — plain DataFrame ops keep Catalyst/AQE in play.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank by a fixed number of power iterations (deterministic —
    no convergence probe, so results are reproducible bit-for-bit and
    numpy-verifiable; pick ``iters`` ≥ graph diameter for stability).

    Dangling nodes (no out-edges) redistribute their mass uniformly,
    the standard stochastic-matrix completion; that term costs one
    small driver-side action per iteration.

    Returns (id, rank); ranks sum to 1.
    """
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .filter(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(out_deg, "src")
            .select(F.col("dst").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("c"))
        )
        summed = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        dangling = (
            ranks.join(out_deg, ranks["id"] == out_deg["src"], "left_anti")
            .agg(F.sum("rank")).first()[0]
        ) or 0.0
        ranks = (
            nodes.join(summed, "id", "left")
            .select(
                "id",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping)
                 * (F.coalesce(F.col("s"), F.lit(0.0))
                    + F.lit(dangling / n))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def token_adjacency_edges(documents: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Directed token-adjacency graph: an edge (w1 -> w2) for every
    distinct consecutive token pair in the corpus (bigram support)."""
    # TOTAL expression, not a filter guard: Spark's sequence(1, 0) is
    # the DESCENDING [1, 0], and a WHERE-style size guard does not
    # protect the transform — InferFiltersFromGenerate derives
    # size(transform(...)) > 0 from the explode and merges it into
    # the SAME Filter node, so the lambda still evaluates on
    # guarded-out rows (try_element_at(t, 0) throws
    # INVALID_INDEX_OF_ZERO on the descending sequence). when()
    # short-circuits per row, making the column safe on any doc.
    toks = documents.select(F.split(F.col(text_col), " ").alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("src"),
                F.element_at("t", i + 1).alias("dst"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<src:string,dst:string>>"))
    pairs = toks.select(F.explode(bigrams).alias("p"))
    return pairs.select("p.src", "p.dst").distinct()
