"""Derive a deterministic sf1 (10x sf0.1) dataset for scale sweeps.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB claims need at
least one measured decade of scaling. This tool derives sf1 from
sf0.1 (never touching /root/testdata) into $SHREDDER_SF1_DIR, default
/tmp/shredder_sf1 — BENCH-ONLY data: correctness oracles stay on the
driver-generated tables.

Derivation (seeded, reproducible):
- relational tables: 10 replicas with per-replica key offsets that
  preserve FK structure inside each replica (o_custkey offsets with
  customer, l_orderkey with orders, ...); dimension tables
  region/nation copied as-is (25/5 rows at every sf, as in TPC-H);
- documents: replica 0 verbatim; replicas 1-9 drop a per-replica 40%
  of each doc's DISTINCT tokens (drop decision = crc32(r:token), the
  same for every doc in a replica) — within-replica near-dup
  structure is preserved (both members of an organic near-dup pair
  lose the SAME tokens, token-set Jaccard barely moves) while
  cross-replica Jaccard falls to ~0.43 << the 0.8 near-dup threshold,
  so the q110 dup-pair population scales linearly with corpus size
  instead of degenerating into 10-wide exact-dup cliques;
- embeddings: replica 0 verbatim; replicas 1-9 multiply by a seeded
  per-replica +-1 sign vector per dimension — norms and within-replica
  angles are exactly preserved (replica geometry = original), across
  replicas neighborhoods decorrelate.
"""

from __future__ import annotations

import os
import sys
import zlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SHREDDER_SF1_DIR", "/tmp/shredder_sf1")
# 10 replicas of sf0.1 = sf1 (the default). SHREDDER_SF_REPLICAS=100
# with SHREDDER_SF1_DIR=/tmp/shredder_sf10 derives sf10 by the SAME
# construction (round-8 second-decade probe) — replica structure,
# near-dup density, and FK offsets all generalize; only the replica
# count changes.
REPLICAS = int(os.environ.get("SHREDDER_SF_REPLICAS", "10"))

OFFSETS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
}


def relational(con: duckdb.DuckDBPyConnection) -> None:
    for t in ["region", "nation"]:
        con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                    f"TO '{DST}/{t}.parquet' (FORMAT parquet)")
    for t, offs in OFFSETS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {offs[c]} AS {c}" if c in offs else c for c in cols)
        # stream one replica per row group instead of one global
        # ORDER BY: the per-replica key offsets are the base table's
        # cardinality, so replica key ranges are disjoint and
        # increasing — replica-major emission with a within-replica
        # key sort IS global key order, without the external sort that
        # spilled ~60 GB deriving sf100's 600 M-row lineitem
        schema = con.execute(
            f"SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT 0 AS r) r LIMIT 0").fetch_record_batch().schema
        with pq.ParquetWriter(f"{DST}/{t}.parquet", schema) as writer:
            for lo in range(0, REPLICAS, 20):
                hi = min(lo + 20, REPLICAS)
                reader = con.execute(
                    f"SELECT {sel} "
                    f"FROM read_parquet('{SRC}/{t}.parquet'), "
                    f"(SELECT UNNEST(GENERATE_SERIES({lo}, {hi - 1}))"
                    f" AS r) r ORDER BY {cols[0]}"
                ).fetch_record_batch(1 << 20)
                for batch in reader:
                    writer.write_batch(batch)


def documents() -> None:
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = tbl["doc_id"].to_pylist()
    text = tbl["text"].to_pylist()
    lang = tbl["lang"].to_pylist()
    source = tbl["source"].to_pylist()
    n_docs = 5_000
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64())])
    # stream one row-group per replica: at REPLICAS=1000 (sf100) the
    # whole output is several GB of text — never hold it all in Python
    with pq.ParquetWriter(f"{DST}/documents.parquet", schema) as writer:
        for r in range(REPLICAS):
            cache: dict = {}

            def dropped(tok: str) -> bool:
                if r == 0:
                    return False
                hit = cache.get(tok)
                if hit is None:
                    hit = zlib.crc32(f"{r}:{tok}".encode()) % 100 < 40
                    cache[tok] = hit
                return hit
            out = {"doc_id": [], "text": [], "lang": [], "source": [],
                   "n_chars": []}
            for d, t, lg, src_ in zip(doc_id, text, lang, source):
                toks = [w for w in t.split(" ") if not dropped(w)]
                nt = " ".join(toks)
                out["doc_id"].append(d + r * n_docs)
                out["text"].append(nt)
                out["lang"].append(lg)
                out["source"].append(src_)
                out["n_chars"].append(len(nt))
            writer.write_table(pa.table(out, schema=schema))


def embeddings() -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32)
    label = np.asarray(tbl["label"].to_pylist(), dtype=np.int32)
    n, dim = emb.shape
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    with pq.ParquetWriter(f"{DST}/embeddings.parquet", schema) as writer:
        for r in range(REPLICAS):
            sign = (np.random.default_rng(1_000 + r).integers(0, 2, dim) * 2
                    - 1 if r else np.ones(dim, dtype=np.int64))
            vecs = emb * sign.astype(np.float32)
            writer.write_table(pa.table({
                "vec_id": pa.array(vec_id + r * 2_000),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
                "label": pa.array(label, type=pa.int32()),
            }, schema=schema))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # REPLICAS=1000 (sf100) sorts a 600 M-row lineitem: bound the
    # in-memory footprint and give the external sort a spill dir
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='48GB'")
    relational(con)
    documents()
    embeddings()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}", file=sys.stderr)
    print(DST)


if __name__ == "__main__":
    main()
