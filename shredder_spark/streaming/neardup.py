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

State layout (round 6): one partitioned parquet dataset per state
kind, ``<root>/epoch=<id>/pb=<k>/part-*.parquet``, where ``pb`` is a
bucket of the join key (``pmod(bh, NB)`` for bands, ``pmod(id, NB)``
for hashes). The per-batch candidate join carries ``pb`` as a leading
key, so the state scan can prune partitions (dynamic partition
pruning against the broadcast batch side) and skip row groups
(compaction sorts by the join key within each ``pb``), instead of
reading every epoch's files in full. Epoch is a partition VALUE, so
idempotent replay is a dynamic-partition overwrite of ``epoch=<id>``
and exclusion of the in-flight epoch is a path-level filter — no
row-level work. Legacy layouts (flat ``*.parquet`` appends,
``epoch_<id>`` subdirs from earlier versions of this module) are
still read and are folded into the new layout by the next
compaction.

Scale shape: each batch runs one (batch-bands × state-bands)
equi-join on (pb, band, bh) — ids only, token arrays never ride the
banding shuffle — and verification joins only the candidate ids.
Dropped docs' bands stay in state ON PURPOSE: the drop policy is
"near-dup of anything seen", matching the batch tier (see test for
the A~B, B~C, A≁C chain: B and C both drop).

Restart/replay safety: foreachBatch is at-least-once, so an epoch can
be re-run after its state append succeeded but before its output
write did. State is therefore written per-epoch (dynamic-partition
overwrite of ``epoch=<id>`` — idempotent under replay) and the
CURRENT epoch's partition is excluded from the state read, so a
replayed batch sees exactly the pre-epoch state instead of matching
itself (which would jaccard-1.0-drop every replayed doc). State
existence is probed through the Hadoop FileSystem API for the
configured scheme — not ``os.path`` — so ``hdfs://``/object-store
state dirs behave the same as local paths. Compaction NEVER folds
the newest epoch (micro-batches commit serially, so only the newest
epoch can be replayed); everything older is folded into a
``epoch=-<generation>`` compact partition set, which keeps the
per-batch file-listing cost bounded no matter how many batches have
run (``compact_every`` auto-triggers it).
"""

from __future__ import annotations

import os
import re
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
_NB = 16                      # pb (prune-bucket) partitions per epoch

_EPOCH_DIR = re.compile(r"^epoch=(-?\d+)$")      # new layout
_LEGACY_DIR = re.compile(r"^epoch_(\d+)$")       # pre-round-6 layout
_LEGACY_COMPACT = re.compile(r"^compact_(\d+)$")  # pre-round-6 compactions


def _pb_of(col: str):
    """Prune-bucket partition value: stable bucket of the join key."""
    return F.pmod(F.col(col), F.lit(_NB)).cast("int")


class IncrementalNearDup:
    """Parquet-state incremental MinHash-LSH dedup (see module doc)."""

    def __init__(self, spark: SparkSession, state_dir: str, *,
                 num_perm: int = 64, bands: int = 16,
                 threshold: float = 0.8, seed: int = 1,
                 exclude_buckets: Optional[DataFrame] = None,
                 compact_every: Optional[int] = 8) -> None:
        """``exclude_buckets``: optional (band, bh) skew blocklist —
        see ``operators.dedup.oversized_lsh_buckets``. Bands in it are
        dropped from candidate generation AND state, reproducing the
        batch tier's ``max_bucket_size`` cap (which cannot be computed
        online) as an explicit input; with the blocklist built at the
        batch tier's cap, capped-batch == blocklisted-incremental.

        ``compact_every``: auto-run :meth:`compact_state` at the start
        of a batch once that many foldable epoch parts have
        accumulated (None disables). Keeps per-batch state-listing and
        scan cost bounded for arbitrarily long streams."""
        assert num_perm % bands == 0
        self.spark = spark
        self.state_dir = state_dir
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.threshold = threshold
        self.seed = seed
        self.exclude_buckets = exclude_buckets
        self.compact_every = compact_every
        self._bands_path = os.path.join(state_dir, "bands")
        self._hashes_path = os.path.join(state_dir, "hashes")

    # -- state ----------------------------------------------------------
    def _fs(self, path: str):
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()), p

    def _list_state(self, path: str):
        """Classify state pieces under ``path`` via the Hadoop
        FileSystem for the path's OWN scheme (s3a://, hdfs://, file://
        all work — no driver-local ``os.path`` probe).

        → (new_epochs: {epoch_id: dir}, legacy_epochs: {epoch_id: dir},
           legacy_flat: [file | dir]). Negative new-epoch ids are
        compact generations. Pre-round-6 ``compact_<n>`` directories
        (the old compaction layout) land in legacy_flat: they are read
        recursively like flat appends, are always foldable (they have
        no epoch id a replay could need to exclude), and are deleted
        once the next compaction folds them into an ``epoch=-<gen>``
        partition set."""
        fs, p = self._fs(path)
        new_eps: dict[int, str] = {}
        leg_eps: dict[int, str] = {}
        flat: list[str] = []
        if not fs.exists(p):
            return new_eps, leg_eps, flat
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory():
                m = _EPOCH_DIR.match(name)
                if m:
                    new_eps[int(m.group(1))] = str(st.getPath())
                    continue
                m = _LEGACY_DIR.match(name)
                if m:
                    leg_eps[int(m.group(1))] = str(st.getPath())
                    continue
                if _LEGACY_COMPACT.match(name):
                    flat.append(str(st.getPath()))
            elif name.endswith(".parquet"):
                flat.append(str(st.getPath()))
        return new_eps, leg_eps, flat

    def _read(self, path: str, schema: str, exclude_epoch,
              pb_key: str) -> DataFrame:
        cols = [c.strip().split()[0] for c in schema.split(",")]
        new_eps, leg_eps, flat = self._list_state(path)
        ex = None if exclude_epoch is None else int(exclude_epoch)
        reads = []
        new_paths = [d for k, d in new_eps.items() if k != ex]
        if new_paths:
            reads.append(
                self.spark.read.option("basePath", path)
                .schema(schema + ", epoch int, pb int")
                .parquet(*new_paths).select(*cols, "pb"))
        leg_paths = [d for k, d in leg_eps.items() if k != ex] + flat
        if leg_paths:
            reads.append(
                self.spark.read.schema(schema)
                .option("recursiveFileLookup", "true").parquet(*leg_paths)
                .withColumn("pb", _pb_of(pb_key)))
        if not reads:
            return self.spark.createDataFrame([], schema + ", pb int")
        out = reads[0]
        for r in reads[1:]:
            out = out.unionByName(r)
        return out

    def state_bands(self, exclude_epoch=None) -> DataFrame:
        return self._read(self._bands_path, _BANDS_SCHEMA, exclude_epoch,
                          "bh")

    def state_hashes(self, exclude_epoch=None) -> DataFrame:
        return self._read(self._hashes_path, _HASHES_SCHEMA,
                          exclude_epoch, "id")

    def _write_epoch(self, df: DataFrame, path: str, epoch: int,
                     sort_key: str, n_files: int = 1) -> None:
        """One epoch's rows → ``path/epoch=<id>/pb=<k>/``. Overwrite is
        DYNAMIC (only this epoch's partitions are replaced), which is
        the idempotence contract under foreachBatch replay."""
        (df.withColumn("epoch", F.lit(int(epoch)))
         .repartition(_NB * max(n_files, 1), "pb")
         .sortWithinPartitions(sort_key)
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch", "pb").parquet(path))

    def _next_epoch(self, path: str) -> int:
        new_eps, leg_eps, _flat = self._list_state(path)
        known = [k for k in new_eps if k >= 0] + list(leg_eps)
        return max(known, default=-1) + 1

    def _foldable(self, path: str):
        """Parts compaction may fold: everything EXCEPT the newest
        non-negative epoch. Micro-batches commit serially, so only the
        newest epoch can be replayed after a crash — it must stay
        excludable by id, hence never folded (round-5 ADVICE fix).
        → (foldable_new: {id: dir}, foldable_leg: {id: dir},
           flat: [file], newest: int | None)."""
        new_eps, leg_eps, flat = self._list_state(path)
        completed = [k for k in new_eps if k >= 0] + list(leg_eps)
        newest = max(completed, default=None)
        fold_new = {k: d for k, d in new_eps.items() if k != newest}
        fold_leg = {k: d for k, d in leg_eps.items() if k != newest}
        return fold_new, fold_leg, flat, newest

    def compact_state(self) -> None:
        """Fold accumulated epoch partitions (and legacy flat files /
        ``epoch_<id>`` subdirs) into one ``epoch=-<generation>``
        compact partition set, sorted by the join key within each
        ``pb`` so per-batch state scans read clustered, well-sized
        files instead of one small file per epoch.

        The NEWEST completed epoch is never folded: it is the only
        epoch an at-least-once foreachBatch replay can re-run, and the
        replay must still be able to exclude it from the state read by
        id. Compacting it would merge it into a partition the replay
        cannot name, so the replayed batch would match its own rows in
        state and admit a different set (round-5 ADVICE, medium).

        Crash safety without atomic rename (object stores): the
        compacted copy is written FIRST, old parts are deleted after.
        A crash in between leaves duplicate state rows, which are
        harmless to the drop decision (candidates are de-duplicated,
        and a doc matching a duplicated state row still matches) and
        are folded away by the next compaction."""
        jvm = self.spark._jvm
        for path, schema, pb_key in (
                (self._bands_path, _BANDS_SCHEMA, "bh"),
                (self._hashes_path, _HASHES_SCHEMA, "id")):
            fold_new, fold_leg, flat, _newest = self._foldable(path)
            n_parts = len(fold_new) + len(fold_leg) + len(flat)
            if n_parts == 0:
                continue
            if (n_parts == 1 and not fold_leg and not flat
                    and next(iter(fold_new)) < 0):
                continue  # already compact: nothing to fold
            gen = 1 + max((-k for k in fold_new if k < 0), default=0)
            cols = [c.strip().split()[0] for c in schema.split(",")]
            reads = []
            if fold_new:
                reads.append(
                    self.spark.read.option("basePath", path)
                    .schema(schema + ", epoch int, pb int")
                    .parquet(*fold_new.values()).select(*cols, "pb"))
            leg_paths = list(fold_leg.values()) + flat
            if leg_paths:
                reads.append(
                    self.spark.read.schema(schema)
                    .option("recursiveFileLookup", "true")
                    .parquet(*leg_paths).withColumn("pb", _pb_of(pb_key)))
            df = reads[0]
            for r in reads[1:]:
                df = df.unionByName(r)
            self._write_epoch(df, path, -gen, pb_key, n_files=2)
            fs, _ = self._fs(path)
            for d in list(fold_new.values()) + leg_paths:
                fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)

    def _maybe_autocompact(self) -> None:
        if self.compact_every is None:
            return
        fold_new, fold_leg, flat, _ = self._foldable(self._bands_path)
        if len(fold_new) + len(fold_leg) + len(flat) >= self.compact_every:
            self.compact_state()

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
        in place, no shuffle of it — with ``pb`` as the leading key so
        a partitioned state read can prune ``pb=`` subdirs too."""
        cand_js = (cand.select(F.col("j").alias("id")).distinct()
                   .withColumn("pb", _pb_of("id")))
        right_small = right_hashes.join(F.broadcast(cand_js),
                                        ["pb", "id"], "left_semi")
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
        an idempotent dynamic-partition overwrite of ``epoch=<id>``
        and the state read excludes that partition, so at-least-once
        replays of the same epoch see the pre-epoch state and admit
        the same docs. Without it (direct batch use), the next free
        epoch id is auto-assigned (same layout, no replay concern).

        SINGLE WRITER REQUIRED on the direct batch path: the
        auto-assigned epoch is list-then-write, so two concurrent
        writers against the same state_dir can pick the same id and
        dynamic-overwrite each other's ``pb`` partitions (silently
        losing one writer's state rows). This mirrors Structured
        Streaming's own contract — one query per checkpoint/state
        dir; micro-batches within a query commit serially. Concurrent
        ingest belongs in ONE stream (union the sources upstream), not
        in parallel writers sharing a state dir."""
        self._maybe_autocompact()
        src = batch.select(F.col(id_col).cast("long").alias("id"),
                           F.col(text_col).alias("_text"))
        hashes = src.select(
            "id",
            F.transform(tokens_col(F.col("_text")),
                        lambda x: F.xxhash64(x)).alias("tok"),
        ).select("id", "tok", F.size("tok").cast("int").alias("n"),
                 _pb_of("id").alias("pb"))
        sig = (src.select("id", token_hashes(F.col("_text")).alias("_hs"))
               .select("id", minhash_from_hashes(
                   F.col("_hs"), self.num_perm, self.seed).alias("_sig")))
        new_bands = self._banded(sig)
        if self.exclude_buckets is not None:
            new_bands = new_bands.join(self.exclude_buckets,
                                       ["band", "bh"], "left_anti")
        new_bands = new_bands.withColumn("pb", _pb_of("bh"))
        new_bands = new_bands.localCheckpoint(eager=True)
        hashes = hashes.localCheckpoint(eager=True)

        # 1) vs the seen corpus: equi-join on (pb, band, bh), ids only.
        # The id filter is belt-and-braces vs self-match (ids are
        # globally unique, and epoch exclusion already keeps a
        # replayed batch out of its own state view).
        # Broadcast the BATCH side: its size is bounded by the trigger,
        # while state grows with everything seen — broadcasting the
        # batch bands means state is scanned in place every batch,
        # never shuffled (the shuffle would re-partition the whole
        # corpus index per micro-batch at scale). pb leads the join
        # keys so the partitioned state scan can prune pb= subdirs
        # (dynamic partition pruning against the broadcast side).
        st_bands = self.state_bands(exclude_epoch=epoch_id)
        vs_state = (F.broadcast(new_bands).alias("n")
                    .join(st_bands.alias("s"), ["pb", "band", "bh"])
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
        # Epoch-keyed dynamic overwrite = idempotent under foreachBatch
        # replay; the direct batch path auto-assigns the next epoch.
        ep = epoch_id if epoch_id is not None \
            else self._next_epoch(self._bands_path)
        self._write_epoch(new_bands, self._bands_path, ep, "bh")
        self._write_epoch(hashes, self._hashes_path, ep, "id")
        return batch.join(admitted.select(F.col(id_col).cast("long")
                                          .alias(id_col)),
                          id_col, "left_semi")


def near_dup_dedup_stream(stream: DataFrame, state_dir: str,
                          output_dir: str, *,
                          id_col: str = "doc_id", text_col: str = "text",
                          checkpoint_dir: Optional[str] = None,
                          num_perm: int = 64, bands: int = 16,
                          threshold: float = 0.8, seed: int = 1,
                          compact_every: Optional[int] = 8):
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
                bands=bands, threshold=threshold, seed=seed,
                compact_every=compact_every)
        admitted = state["op"].process_batch(bdf, id_col, text_col,
                                             epoch_id=epoch_id)
        (admitted.write.mode("overwrite")
         .parquet(os.path.join(output_dir, f"epoch_{epoch_id}")))

    writer = stream.writeStream.foreachBatch(_sink).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
