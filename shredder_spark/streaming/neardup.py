"""Incremental near-duplicate dedup over arriving document batches.

The batch tier (``operators/dedup.py``: ``minhash_lsh_pairs`` /
``dedupe_keepers``) answers "dedup this corpus at rest"; ingestion
pipelines instead watch documents ARRIVE and must decide admit/drop
per micro-batch against everything seen before. This module keeps the
LSH index as parquet state (object-store friendly, restart-safe — a
new instance over the same ``state_dir`` resumes exactly) and applies
the same banding + exact-verify semantics as the batch tier:

- ``state/bands``:  (band, bh, id)  — the seen-corpus LSH index
- ``state/hashes``: (id, tok, n)    — xxhash64 token sets for verify

A new doc is DROPPED iff it has a verified near-dup pair
(jaccard ≥ threshold on distinct token hashes) with any EARLIER-SEEN
doc — earlier batch, or lower id within the same batch. That is the
batch ``dedupe_keepers`` drop-higher-id policy with arrival order as
the total order, so replaying a corpus in id order through ANY batch
partitioning reproduces the batch keeper set exactly (pinned in
``tests/test_incremental_neardup.py``). Two caveats, documented not
hidden: ids must be globally unique, and the batch tier's
``max_bucket_size`` skew cap cannot be computed online (final bucket
sizes are unknown mid-stream) — by default the state join is uncapped
(which can only DROP more, never admit a near-dup); for EXACT
equality with a capped batch run, pass ``exclude_buckets=`` the
(band, bh) blocklist from ``operators.dedup.oversized_lsh_buckets``
built at the same cap, which restricts both tiers to the same pair
universe (pinned capped at sf0.001 in the tests and swept at sf1 in
``tools/scale_sweep.py``).

Scale shape: each batch runs one (batch-bands × state-bands)
equi-join on (band, bh) — ids only, token arrays never ride the
banding shuffle — and verification joins only the candidate ids.
State is append-only parquet; compact/sort it by ``bh`` with the
layout operators when small files accumulate. Dropped docs' bands
stay in state ON PURPOSE: the drop policy is "near-dup of anything
seen", matching the batch tier (see test for the A~B, B~C, A≁C
chain: B and C both drop).

Restart/replay safety: foreachBatch is at-least-once, so an epoch can
be re-run after its state append succeeded but before its output
write did. State is therefore written per-epoch (``epoch_<id>``
subdirectory, overwrite mode — idempotent under replay) and the
CURRENT epoch's subdirectory is excluded from the state read, so a
replayed batch sees exactly the pre-epoch state instead of matching
itself (which would jaccard-1.0-drop every replayed doc). State
existence is probed through the Hadoop FileSystem API for the
configured scheme — not ``os.path`` — so ``hdfs://``/object-store
state dirs behave the same as local paths.
"""

from __future__ import annotations

import os
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from shredder_spark.operators.dedup import (
    minhash_from_hashes,
    token_hashes,
    tokens_col,
)

_BANDS_SCHEMA = "band int, bh bigint, id bigint"
_HASHES_SCHEMA = "id bigint, tok array<bigint>, n int"


class IncrementalNearDup:
    """Parquet-state incremental MinHash-LSH dedup (see module doc)."""

    def __init__(self, spark: SparkSession, state_dir: str, *,
                 num_perm: int = 64, bands: int = 16,
                 threshold: float = 0.8, seed: int = 1,
                 exclude_buckets: Optional[DataFrame] = None) -> None:
        """``exclude_buckets``: optional (band, bh) skew blocklist —
        see ``operators.dedup.oversized_lsh_buckets``. Bands in it are
        dropped from candidate generation AND state, reproducing the
        batch tier's ``max_bucket_size`` cap (which cannot be computed
        online) as an explicit input; with the blocklist built at the
        batch tier's cap, capped-batch == blocklisted-incremental."""
        assert num_perm % bands == 0
        self.spark = spark
        self.state_dir = state_dir
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.threshold = threshold
        self.seed = seed
        self.exclude_buckets = exclude_buckets
        self._bands_path = os.path.join(state_dir, "bands")
        self._hashes_path = os.path.join(state_dir, "hashes")

    # -- state ----------------------------------------------------------
    def _state_parts(self, path: str, exclude_epoch) -> list:
        """List state pieces under ``path`` via the Hadoop FileSystem
        for the path's OWN scheme (s3a://, hdfs://, file:// all work —
        no driver-local ``os.path`` probe). Returns epoch subdirs
        (minus the excluded one) plus any legacy flat parquet files
        appended by pre-epoch versions of this module."""
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(hconf)
        if not fs.exists(p):
            return []
        skip = None if exclude_epoch is None else f"epoch_{exclude_epoch}"
        parts = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory():
                if name != skip:
                    parts.append(str(st.getPath()))
            elif name.endswith(".parquet"):
                parts.append(str(st.getPath()))
        return parts

    def _read(self, path: str, schema: str, exclude_epoch) -> DataFrame:
        parts = self._state_parts(path, exclude_epoch)
        if not parts:
            return self.spark.createDataFrame([], schema)
        return (self.spark.read.schema(schema)
                .option("recursiveFileLookup", "true").parquet(*parts))

    def state_bands(self, exclude_epoch=None) -> DataFrame:
        return self._read(self._bands_path, _BANDS_SCHEMA, exclude_epoch)

    def state_hashes(self, exclude_epoch=None) -> DataFrame:
        return self._read(self._hashes_path, _HASHES_SCHEMA,
                          exclude_epoch)

    def compact_state(self) -> None:
        """Fold accumulated epoch subdirectories (and legacy flat
        files) into one ``compact_<n>`` layout, sorted and partitioned
        by ``bh`` so the per-batch state scans read clustered,
        well-sized files instead of one small file per epoch.

        Crash safety without atomic rename (object stores): the
        compacted copy is written FIRST, old parts are deleted after.
        A crash in between leaves duplicate state rows, which are
        harmless to the drop decision (candidates are de-duplicated,
        and a doc matching a duplicated state row still matches) and
        are folded away by the next compaction."""
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        for path, schema, n_parts in (
                (self._bands_path, _BANDS_SCHEMA, 32),
                (self._hashes_path, _HASHES_SCHEMA, 32)):
            parts = self._state_parts(path, None)
            if len(parts) <= 1:
                continue
            gen = sum(1 for p in parts
                      if os.path.basename(p).startswith("compact_")) + 1
            df = (self.spark.read.schema(schema)
                  .option("recursiveFileLookup", "true").parquet(*parts))
            sort_keys = (["band", "bh"] if path == self._bands_path
                         else ["id"])
            (df.repartition(n_parts, *sort_keys[:1])
               .sortWithinPartitions(*sort_keys)
               .write.mode("overwrite")
               .parquet(os.path.join(path, f"compact_{gen}")))
            fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
            for p in parts:
                fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)

    # -- per-batch ------------------------------------------------------
    def _banded(self, sig: DataFrame) -> DataFrame:
        return sig.select(
            "id",
            F.explode(F.array(*[
                F.struct(
                    F.lit(i).cast("int").alias("band"),
                    F.xxhash64(F.slice("_sig", i * self.rows + 1,
                                       self.rows)).alias("bh"))
                for i in range(self.bands)
            ])).alias("b"),
        ).select("b.band", "b.bh", "id")

    def _verified(self, cand: DataFrame, left_hashes: DataFrame,
                  right_hashes: DataFrame) -> DataFrame:
        """cand (i, j) → verified pairs at ≥ threshold. i comes from
        ``left_hashes``, j from ``right_hashes`` (may be the same).
        ``right_hashes`` may be STATE-sized: it is first semi-join-
        reduced by the broadcast candidate-j id set — a scan of state
        in place, no shuffle of it — so the pair join then runs over
        two batch-bounded relations (ids broadcast, token arrays
        never)."""
        right_small = right_hashes.join(
            F.broadcast(cand.select(F.col("j").alias("id")).distinct()),
            "id", "left_semi")
        c = (cand
             .join(left_hashes.select(F.col("id").alias("i"),
                                      F.col("tok").alias("ti"),
                                      F.col("n").alias("ni")), "i")
             .join(right_small.select(F.col("id").alias("j"),
                                      F.col("tok").alias("tj"),
                                      F.col("n").alias("nj")), "j"))
        inter = F.size(F.array_intersect("ti", "tj"))
        union = (F.col("ni") + F.col("nj") - inter).cast("double")
        return (c.select("i", "j", (inter / union).alias("jaccard"))
                .filter(F.col("jaccard") >= self.threshold))

    def process_batch(self, batch: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      epoch_id: Optional[int] = None) -> DataFrame:
        """Admit/drop one micro-batch; returns the admitted rows of
        ``batch`` (all original columns). Appends the WHOLE batch to
        state afterwards (drop policy is vs seen, not vs admitted).

        With ``epoch_id`` set (the streaming path), the state write is
        an idempotent overwrite of ``epoch_<id>/`` and the state read
        excludes that subdir, so at-least-once replays of the same
        epoch see the pre-epoch state and admit the same docs. Without
        it (direct batch use), state is appended flat as before."""
        src = batch.select(F.col(id_col).cast("long").alias("id"),
                           F.col(text_col).alias("_text"))
        hashes = src.select(
            "id",
            F.transform(tokens_col(F.col("_text")),
                        lambda x: F.xxhash64(x)).alias("tok"),
        ).select("id", "tok", F.size("tok").cast("int").alias("n"))
        sig = (src.select("id", token_hashes(F.col("_text")).alias("_hs"))
               .select("id", minhash_from_hashes(
                   F.col("_hs"), self.num_perm, self.seed).alias("_sig")))
        new_bands = self._banded(sig)
        if self.exclude_buckets is not None:
            new_bands = new_bands.join(self.exclude_buckets,
                                       ["band", "bh"], "left_anti")
        new_bands = new_bands.localCheckpoint(eager=True)
        hashes = hashes.localCheckpoint(eager=True)

        # 1) vs the seen corpus: equi-join on (band, bh), ids only.
        # The id filter is belt-and-braces vs self-match (ids are
        # globally unique, and epoch exclusion already keeps a
        # replayed batch out of its own state view).
        # Broadcast the BATCH side: its size is bounded by the trigger,
        # while state grows with everything seen — broadcasting the
        # batch bands means state is scanned in place every batch,
        # never shuffled (the shuffle would re-partition the whole
        # corpus index per micro-batch at scale).
        st_bands = self.state_bands(exclude_epoch=epoch_id)
        vs_state = (F.broadcast(new_bands).alias("n")
                    .join(st_bands.alias("s"), ["band", "bh"])
                    .filter(F.col("n.id") != F.col("s.id"))
                    .select(F.col("n.id").alias("i"),
                            F.col("s.id").alias("j"))
                    .dropDuplicates(["i", "j"]))
        dropped_state = (self._verified(
            vs_state, hashes, self.state_hashes(exclude_epoch=epoch_id))
                         .select(F.col("i").alias("id")))

        # 2) within the batch: lower id wins, same bucket pairing as
        # the batch tier (sorted member array → i<j pairs in-array).
        buckets = (new_bands.groupBy("band", "bh")
                   .agg(F.sort_array(F.collect_list("id")).alias("_ids"))
                   .filter(F.size("_ids") >= 2))
        pair_expr = F.expr(
            "flatten(transform(_ids, (x, i) -> "
            "transform(slice(_ids, i + 2, size(_ids)), "
            "y -> named_struct('i', x, 'j', y))))")
        in_batch = (buckets.select(F.explode(pair_expr).alias("p"))
                    .select("p.i", "p.j").dropDuplicates(["i", "j"]))
        dropped_batch = (self._verified(in_batch, hashes, hashes)
                         .select(F.col("j").alias("id")))

        drop = dropped_state.union(dropped_batch).distinct()
        admitted = (src.select("id").join(drop, "id", "left_anti")
                    .withColumnRenamed("id", id_col))

        # 3) persist the whole batch to state (restart-safe parquet).
        # Epoch-keyed overwrite = idempotent under foreachBatch replay;
        # flat append only for the direct (non-streaming) batch path.
        if epoch_id is not None:
            sub = f"epoch_{epoch_id}"
            (new_bands.write.mode("overwrite")
             .parquet(os.path.join(self._bands_path, sub)))
            (hashes.write.mode("overwrite")
             .parquet(os.path.join(self._hashes_path, sub)))
        else:
            new_bands.write.mode("append").parquet(self._bands_path)
            hashes.write.mode("append").parquet(self._hashes_path)
        return batch.join(admitted.select(F.col(id_col).cast("long")
                                          .alias(id_col)),
                          id_col, "left_semi")


def near_dup_dedup_stream(stream: DataFrame, state_dir: str,
                          output_dir: str, *,
                          id_col: str = "doc_id", text_col: str = "text",
                          checkpoint_dir: Optional[str] = None,
                          num_perm: int = 64, bands: int = 16,
                          threshold: float = 0.8, seed: int = 1):
    """Structured-Streaming wrapper: admitted docs land in
    ``output_dir`` parquet via foreachBatch (micro-batches are
    processed serially by the engine, which is exactly the ordering
    the state contract needs). The output write is epoch-keyed
    overwrite — the same idempotence trick as the state writes — so
    an at-least-once replay rewrites its own subdirectory instead of
    appending duplicate admitted rows: effectively-exactly-once
    output. Read the result with
    ``spark.read.option("recursiveFileLookup", "true")
    .parquet(output_dir)``. Returns the started query."""
    state = {}

    def _sink(bdf: DataFrame, epoch_id: int) -> None:
        if "op" not in state:
            state["op"] = IncrementalNearDup(
                bdf.sparkSession, state_dir, num_perm=num_perm,
                bands=bands, threshold=threshold, seed=seed)
        admitted = state["op"].process_batch(bdf, id_col, text_col,
                                             epoch_id=epoch_id)
        (admitted.write.mode("overwrite")
         .parquet(os.path.join(output_dir, f"epoch_{epoch_id}")))

    writer = stream.writeStream.foreachBatch(_sink).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
