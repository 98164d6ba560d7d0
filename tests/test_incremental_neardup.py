"""Incremental near-dup dedup (streaming/neardup.py).

Pins:
1. BATCH EQUIVALENCE — replaying a corpus in id order through any
   batch partitioning reproduces `dedupe_keepers`' keeper set exactly
   (same LSH params, uncapped buckets).
2. CHAIN SEMANTICS — A~B, B~C, A~̸C drops both B and C (drop-vs-seen,
   the batch tier's policy), not the greedy-vs-admitted variant.
3. RESTART SAFETY — a fresh operator instance over the same state dir
   continues where the old one stopped.
4. STREAMING INVARIANT — after a foreachBatch run over a file stream
   (arbitrary file order), no verified near-dup pair survives among
   the admitted set.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from shredder_spark.operators.dedup import dedupe_keepers, minhash_lsh_pairs
from shredder_spark.streaming.neardup import (
    IncrementalNearDup,
    near_dup_dedup_stream,
)

SF_DIR = os.environ.get("SHREDDER_TEST_SF_DIR", "/root/testdata/sf0.001")

LSH = dict(num_perm=64, bands=16, threshold=0.5, seed=1)


@pytest.fixture()
def docs(spark):
    return (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text").filter(F.col("doc_id") < 200))


def _batches(df, n):
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    cuts = [ids[len(ids) * k // n] for k in range(1, n)] + [ids[-1] + 1]
    lo = min(ids)
    out = []
    for hi in cuts:
        out.append(df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)))
        lo = hi
    return out


def test_batch_equivalence(spark, docs, tmp_path):
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    op = IncrementalNearDup(spark, str(tmp_path / "state"), **LSH)
    admitted = set()
    for b in _batches(docs, 4):
        admitted |= {r.doc_id for r in op.process_batch(b).collect()}
    assert admitted == keepers
    assert len(admitted) < 200  # fixture really contains near-dups


def test_chain_semantics(spark, tmp_path):
    # sliding 8-token windows over a 12-token stream:
    # j(A,B) = j(B,C) = 6/10 = 0.6, j(A,C) = 4/12 = 0.33
    toks = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
            "eta", "theta", "iota", "kappa", "lambda", "mu"]
    rows = [
        (1, " ".join(toks[0:8])),   # A
        (2, " ".join(toks[2:10])),  # B ~ A
        (3, " ".join(toks[4:12])),  # C ~ B, not ~ A
    ]
    lsh = dict(LSH, threshold=0.45)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text", **lsh)
    got = {(r.i, r.j) for r in pairs.collect()}
    assert (1, 2) in got and (2, 3) in got and (1, 3) not in got
    op = IncrementalNearDup(spark, str(tmp_path / "state"), **lsh)
    admitted = []
    for b in _batches(df, 3):
        admitted += [r.doc_id for r in op.process_batch(b).collect()]
    assert admitted == [1]  # B drops vs A; C drops vs seen B


def test_restart_resumes_state(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    b1, b2 = _batches(docs, 2)
    a1 = {r.doc_id for r in IncrementalNearDup(spark, state, **LSH)
          .process_batch(b1).collect()}
    # fresh instance — only parquet state carries over
    a2 = {r.doc_id for r in IncrementalNearDup(spark, state, **LSH)
          .process_batch(b2).collect()}
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    assert (a1 | a2) == keepers


def test_mid_epoch_replay_idempotent(spark, docs, tmp_path):
    """foreachBatch is at-least-once: an epoch can re-run after its
    state write landed but before its output write. The replayed
    batch must admit the SAME docs (not match itself in state and
    drop everything), and state must not double-count."""
    state = str(tmp_path / "state")
    b1, b2 = _batches(docs, 2)
    op = IncrementalNearDup(spark, state, **LSH)
    a1 = {r.doc_id for r in op.process_batch(b1, epoch_id=0).collect()}
    first = {r.doc_id for r in op.process_batch(b2, epoch_id=1).collect()}
    # simulate the replay: fresh operator (post-crash), same epoch id
    op2 = IncrementalNearDup(spark, state, **LSH)
    replay = {r.doc_id for r in op2.process_batch(b2, epoch_id=1).collect()}
    assert replay == first
    # state holds each doc's bands exactly once (overwrite, not append)
    n_ids = op2.state_bands().select("id").distinct().count()
    assert op2.state_bands().count() == n_ids * LSH["bands"]
    # and the combined admitted set still equals the batch-tier keepers
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    assert (a1 | replay) == keepers


def test_capped_equality_via_blocklist(spark, docs, tmp_path):
    """Capped contract (the sf1 production shape): batch with
    max_bucket_size=K equals the incremental fed the K-blocklist —
    both decide over the same pair universe. K is chosen small enough
    that the blocklist is non-empty (the cap really bites here)."""
    from shredder_spark.operators.dedup import oversized_lsh_buckets

    cap = 3
    src = docs.select("doc_id", "text")
    blocklist = oversized_lsh_buckets(
        src, "doc_id", "text", max_bucket_size=cap,
        num_perm=LSH["num_perm"], bands=LSH["bands"], seed=LSH["seed"])
    assert blocklist.count() > 0  # the cap must actually exclude work
    keepers = {r.doc_id for r in
               dedupe_keepers(src, "doc_id", "text",
                              max_bucket_size=cap, **LSH).collect()}
    op = IncrementalNearDup(spark, str(tmp_path / "state"),
                            exclude_buckets=blocklist, **LSH)
    admitted = set()
    for b in _batches(src, 3):
        admitted |= {r.doc_id for r in op.process_batch(b).collect()}
    assert admitted == keepers
    # and the cap changes the answer vs uncapped (the contract is not
    # vacuous at this K)
    uncapped = {r.doc_id for r in
                dedupe_keepers(src, "doc_id", "text",
                               max_bucket_size=10**9, **LSH).collect()}
    assert keepers != uncapped


def test_compact_state_preserves_decisions(spark, docs, tmp_path):
    """Compaction folds per-epoch state subdirs into one sorted layout
    without changing any admit/drop decision, and repeated compaction
    is stable."""
    state = str(tmp_path / "state")
    b1, b2, b3 = _batches(docs, 3)
    op = IncrementalNearDup(spark, state, **LSH)
    a1 = {r.doc_id for r in op.process_batch(b1, epoch_id=0).collect()}
    a2 = {r.doc_id for r in op.process_batch(b2, epoch_id=1).collect()}
    before_bands = op.state_bands().count()
    before_hashes = op.state_hashes().count()
    op.compact_state()
    assert op.state_bands().count() == before_bands
    assert op.state_hashes().count() == before_hashes
    op.compact_state()  # idempotent on an already-compact layout
    assert op.state_bands().count() == before_bands
    a3 = {r.doc_id for r in op.process_batch(b3, epoch_id=2).collect()}
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    assert (a1 | a2 | a3) == keepers


def test_state_joins_broadcast_batch_side(spark, docs, tmp_path):
    """Scale shape: state (the whole seen corpus) must be scanned, not
    shuffled, each batch — the bands join broadcasts the batch side
    and the verify path semi-join-reduces state hashes by broadcast
    candidate ids. Asserted on the physical plan with a state big
    enough that it exists on disk."""
    state = str(tmp_path / "state")
    b1, b2 = _batches(docs, 2)
    op = IncrementalNearDup(spark, state, **LSH)
    op.process_batch(b1).collect()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable size-based auto-broadcast: only explicit hints remain
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        src = b2.select(F.col("doc_id").cast("long").alias("id"),
                        F.col("text").alias("_text"))
        from shredder_spark.operators.dedup import (
            minhash_from_hashes, token_hashes, tokens_col)
        sig = (src.select("id", token_hashes(F.col("_text")).alias("_hs"))
               .select("id", minhash_from_hashes(
                   F.col("_hs"), LSH["num_perm"], 1).alias("_sig")))
        new_bands = op._banded(sig)
        vs_state = (F.broadcast(new_bands).alias("n")
                    .join(op.state_bands().alias("s"), ["band", "bh"])
                    .select(F.col("n.id").alias("i"),
                            F.col("s.id").alias("j")))
        plan = vs_state._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:1500]
        batch_hashes = (src.select(
            "id",
            F.transform(tokens_col(F.col("_text")),
                        lambda x: F.xxhash64(x)).alias("tok"))
            .select("id", "tok", F.size("tok").cast("int").alias("n")))
        verified = op._verified(vs_state.dropDuplicates(["i", "j"]),
                                batch_hashes, op.state_hashes())
        vplan = verified._jdf.queryExecution().executedPlan().toString()
        # the state-hashes side is reduced through a broadcast semi join
        assert "BroadcastHashJoin" in vplan and "LeftSemi" in vplan, \
            vplan[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_no_surviving_pairs(spark, docs, tmp_path):
    root = tempfile.mkdtemp(prefix="neardup_stream_")
    try:
        src = os.path.join(root, "src")
        docs.repartition(5).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = near_dup_dedup_stream(
            stream, os.path.join(root, "state"),
            os.path.join(root, "out"),
            checkpoint_dir=os.path.join(root, "ckpt"), **LSH)
        q.awaitTermination(120)
        out = (spark.read.schema(docs.schema)
               .option("recursiveFileLookup", "true")
               .parquet(os.path.join(root, "out")))
        n_admitted = out.count()
        assert 0 < n_admitted < 200
        surviving = minhash_lsh_pairs(out, "doc_id", "text", **LSH)
        assert surviving.count() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_replay_after_compaction_idempotent(spark, docs, tmp_path):
    """Round-5 ADVICE (medium): compaction must never fold the newest
    epoch. Sequence: epoch 0, epoch 1 state lands, COMPACT runs, then
    epoch 1 is replayed (crash between state write and output write).
    The replay must still exclude epoch 1 from its state view and
    admit exactly the original set."""
    state = str(tmp_path / "state")
    b1, b2 = _batches(docs, 2)
    op = IncrementalNearDup(spark, state, **LSH)
    a1 = {r.doc_id for r in op.process_batch(b1, epoch_id=0).collect()}
    first = {r.doc_id for r in op.process_batch(b2, epoch_id=1).collect()}
    op.compact_state()          # folds epoch 0 only; epoch 1 kept
    bands_root = os.path.join(state, "bands")
    names = set(os.listdir(bands_root))
    assert "epoch=1" in names, names          # newest never folded
    assert "epoch=0" not in names, names      # older one folded away
    assert any(n.startswith("epoch=-") for n in names), names
    # replay epoch 1 post-compaction with a fresh operator
    op2 = IncrementalNearDup(spark, state, **LSH)
    replay = {r.doc_id for r in op2.process_batch(b2, epoch_id=1).collect()}
    assert replay == first
    # state still holds each doc's bands exactly once
    n_ids = op2.state_bands().select("id").distinct().count()
    assert op2.state_bands().count() == n_ids * LSH["bands"]
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    assert (a1 | replay) == keepers


def test_autocompaction_bounds_state_parts(spark, docs, tmp_path):
    """With compact_every=3, the number of epoch parts under the state
    roots stays bounded as batches accumulate — the flat-per-batch-
    cost property at stream length (round-5 verdict item 4) — and the
    admitted set still equals the batch-tier keepers."""
    state = str(tmp_path / "state")
    op = IncrementalNearDup(spark, state, compact_every=3, **LSH)
    admitted = set()
    for i, b in enumerate(_batches(docs, 8)):
        admitted |= {r.doc_id for r in
                     op.process_batch(b, epoch_id=i).collect()}
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    assert admitted == keepers
    for root in ("bands", "hashes"):
        names = [n for n in os.listdir(os.path.join(state, root))
                 if n.startswith("epoch")]
        # ≤ compact_every-1 uncompacted epochs + 1 compact partition +
        # the in-flight newest: bounded, nowhere near 8
        assert len(names) <= 5, names


def test_legacy_state_layout_still_readable(spark, docs, tmp_path):
    """State written by the pre-round-6 layout (flat appends and
    epoch_<id> subdirs) is read transparently and folded into the
    partitioned layout by compaction."""
    state = str(tmp_path / "state")
    b1, b2, b3 = _batches(docs, 3)
    op = IncrementalNearDup(spark, state, **LSH)
    # simulate the legacy layout for batch 1: flat parquet appends
    src = b1.select(F.col("doc_id").cast("long").alias("id"),
                    F.col("text").alias("_text"))
    from shredder_spark.operators.dedup import (
        minhash_from_hashes, token_hashes, tokens_col)
    hashes = (src.select(
        "id", F.transform(tokens_col(F.col("_text")),
                          lambda x: F.xxhash64(x)).alias("tok"))
        .select("id", "tok", F.size("tok").cast("int").alias("n")))
    sig = (src.select("id", token_hashes(F.col("_text")).alias("_hs"))
           .select("id", minhash_from_hashes(
               F.col("_hs"), LSH["num_perm"], LSH["seed"]).alias("_sig")))
    op._banded(sig).write.mode("append").parquet(
        os.path.join(state, "bands"))
    hashes.write.mode("append").parquet(os.path.join(state, "hashes"))
    seen_b1 = {r.id for r in src.select("id").collect()}
    assert {r.id for r in op.state_bands().select("id").distinct()
            .collect()} == seen_b1
    a2 = {r.doc_id for r in op.process_batch(b2, epoch_id=1).collect()}
    op.compact_state()
    # legacy flat files folded away
    flat = [n for n in os.listdir(os.path.join(state, "bands"))
            if n.endswith(".parquet")]
    assert not flat
    a3 = {r.doc_id for r in op.process_batch(b3, epoch_id=2).collect()}
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    # batch-1 docs were all force-admitted into state via the legacy
    # write; batches 2-3 decided against it — their admit set must be
    # the keepers minus what b1 already occupied
    assert (seen_b1 | a2 | a3) >= keepers
    assert (a2 | a3) == {k for k in keepers if k not in seen_b1}


def test_legacy_compact_dir_still_readable(spark, docs, tmp_path):
    """State compacted by the PRE-round-6 compact_state (plain-parquet
    ``compact_<n>`` subdirs, no epoch/pb partitioning) is read, used
    for dedup decisions, and folded + deleted by the next compaction
    (round-6 ADVICE: _list_state silently dropped these dirs, so
    upgrading an old compacted state dir lost all its dedup state)."""
    state = str(tmp_path / "state")
    b1, b2, b3 = _batches(docs, 3)
    op = IncrementalNearDup(spark, state, **LSH)
    # simulate the old compaction output for batch 1: one plain
    # parquet dir named compact_1 under each state root
    src = b1.select(F.col("doc_id").cast("long").alias("id"),
                    F.col("text").alias("_text"))
    from shredder_spark.operators.dedup import (
        minhash_from_hashes, token_hashes, tokens_col)
    hashes = (src.select(
        "id", F.transform(tokens_col(F.col("_text")),
                          lambda x: F.xxhash64(x)).alias("tok"))
        .select("id", "tok", F.size("tok").cast("int").alias("n")))
    sig = (src.select("id", token_hashes(F.col("_text")).alias("_hs"))
           .select("id", minhash_from_hashes(
               F.col("_hs"), LSH["num_perm"], LSH["seed"]).alias("_sig")))
    op._banded(sig).write.parquet(os.path.join(state, "bands", "compact_1"))
    hashes.write.parquet(os.path.join(state, "hashes", "compact_1"))
    seen_b1 = {r.id for r in src.select("id").collect()}
    # the old compact generation is visible to state reads
    assert {r.id for r in op.state_bands().select("id").distinct()
            .collect()} == seen_b1
    a2 = {r.doc_id for r in op.process_batch(b2, epoch_id=1).collect()}
    op.compact_state()
    # the legacy compact_<n> dirs are folded away...
    for root in ("bands", "hashes"):
        leftover = [n for n in os.listdir(os.path.join(state, root))
                    if n.startswith("compact_")]
        assert not leftover, leftover
    # ...and their rows survive the fold
    assert {r.id for r in op.state_bands().select("id").distinct()
            .collect()} >= seen_b1
    a3 = {r.doc_id for r in op.process_batch(b3, epoch_id=2).collect()}
    keepers = {r.doc_id for r in
               dedupe_keepers(docs, "doc_id", "text",
                              max_bucket_size=10**6, **LSH).collect()}
    assert (a2 | a3) == {k for k in keepers if k not in seen_b1}
