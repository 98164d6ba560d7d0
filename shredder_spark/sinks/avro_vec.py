"""Vectorized Avro binary encoder: Arrow batch → Avro records, columnar.

The per-row codec (``avro_codec.RecordCodec``) encodes field-by-field
in Python — fine for Kafka framing (one record per message), but the
OCF sink hot loop is O(rows × fields) interpreter work. This module
encodes a whole Arrow batch with numpy, padded-matrix style (r12 —
the r8 form scattered every field's bytes into the output with fancy
int64 indices, and those gather/scatters were ~90% of encode time):

1. per field, compute the encoded byte LENGTH of every row (varint
   widths via threshold sums, string lengths straight from the Arrow
   offsets buffer);
2. allocate a padded (rows × Σ field-slot-widths) byte matrix plus a
   same-shape validity mask, where each field owns a fixed column
   block sized to its batch-max width (varint max ≤ 10, string block
   = header max + longest value). Every write is then a STRIDED
   column or block store — no fancy indexing; uniform-width string
   payloads (the fixed-width-feed shape) land as one reshaped-view
   block copy, and their constant-width varint headers collapse to
   memsets;
3. one boolean-mask compress of the raveled matrix emits the exact
   row-major Avro byte stream (row lengths → cumsum gives per-row
   offsets for the OCF/Kafka framings).

Exactness: ``encode_batch(rc, batch)`` equals
``b"".join(rc.encode(row) for row in rows)`` byte-for-byte (pinned in
tests/test_avro_vec.py), so every existing OCF reader — ours and any
spec-conforming one — consumes the output unchanged.

Type surface: the engine's wire form (SURVEY.md §1.3) — boolean, int,
long, float, double, bytes, string, and the temporal logicals as
pre-converted epoch ints — with optional ``["null", T]`` unions.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterable, Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from shredder_spark.sinks.avro_codec import (
    MAGIC, RecordCodec, compress_block, write_bytes, write_long)

_VARINT_MAX = 10
_U64_ONE = np.uint64(1)
_ENC_ROWS = 16384  # encode sub-slice: padded matrix + mask stay cache-resident

_INT_TYPES = frozenset({
    "int", "long", "date", "timestamp-millis", "timestamp-micros",
    "time-millis", "time-micros"})


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def _varint_len(z: np.ndarray) -> np.ndarray:
    """Encoded byte count per value: 1 + (# of 7-bit thresholds ≤ z).
    The threshold loop stops at the column's max — small-int columns
    (the common shape) pay 2-3 compares instead of 9."""
    n = np.ones(len(z), dtype=np.int64)
    if len(z) == 0:
        return n
    zm = int(z.max())
    for k in range(1, _VARINT_MAX):
        t = 1 << (7 * k)
        if zm < t:
            break
        n += (z >= np.uint64(t))
    return n


_SHIFTS = np.arange(_VARINT_MAX, dtype=np.uint64) * np.uint64(7)


def _fill_varint(pb: np.ndarray, pm: np.ndarray, off: int,
                 z: np.ndarray, nb: np.ndarray, vmax: int,
                 valid: np.ndarray | None) -> None:
    """Varint planes into the padded matrix. Computed as one
    contiguous (n, vmax) block and stored with a single block write —
    per-plane column stores hit a different cache line per row (the
    padded row stride) and were ~3× slower. Dead rows carry garbage
    bytes, masked off."""
    if vmax == 1:
        # single-byte fast path (no continuation bit possible)
        pb[:, off] = (z & np.uint64(0x7F)).astype(np.uint8)
        pm[:, off] = True if valid is None else valid
        return
    planes = ((z[:, None] >> _SHIFTS[:vmax]) & np.uint64(0x7F)) \
        .astype(np.uint8)
    live = nb[:, None] > np.arange(vmax, dtype=np.int64)
    planes |= (nb[:, None] > np.arange(1, vmax + 1)).view(np.uint8) \
        << np.uint8(7)
    pb[:, off:off + vmax] = planes
    pm[:, off:off + vmax] = live if valid is None \
        else (live & valid[:, None])


class _Prep:
    __slots__ = ("length", "slots", "fill")

    def __init__(self, length, slots, fill):
        self.length = length   # exact encoded bytes per row (int64)
        self.slots = slots     # padded columns owned by this field
        self.fill = fill       # fill(pb, pm, off) -> None


def _prep_field(fname: str, tname: str, null_index: int,
                col: pa.Array) -> _Prep:
    if isinstance(col, pa.ChunkedArray):  # pragma: no cover
        col = col.combine_chunks()
    n = len(col)
    nullable = null_index >= 0
    has_nulls = col.null_count > 0
    if has_nulls and not nullable:
        raise ValueError(f"null in non-nullable field {fname}")
    valid = None
    if has_nulls:
        valid = ~col.is_null().to_numpy(zero_copy_only=False)

    if tname == "boolean":
        fc = pc.fill_null(col, False) if has_nulls else col
        vals = fc.to_numpy(zero_copy_only=False).astype(np.uint8)
        vlen = np.ones(n, dtype=np.int64)
        vslots = 1

        def fill_val(pb, pm, off):
            pb[:, off] = vals
            pm[:, off] = True if valid is None else valid

    elif tname in _INT_TYPES:
        iv = pc.fill_null(col, 0) if has_nulls else col
        if not pa.types.is_integer(iv.type):
            iv = iv.cast(pa.int64())  # temporal logicals → epoch ints
        v = iv.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        z = _zigzag(v)
        vlen = _varint_len(z)
        vslots = int(vlen.max()) if n else 1

        def fill_val(pb, pm, off):
            _fill_varint(pb, pm, off, z, vlen, vslots, valid)

    elif tname in ("float", "double"):
        width = 4 if tname == "float" else 8
        fc = pc.fill_null(col, 0.0) if has_nulls else col
        v = fc.to_numpy(zero_copy_only=False) \
            .astype(f"<f{width}", copy=False)
        planes = np.ascontiguousarray(v).view(np.uint8).reshape(n, width)
        vlen = np.full(n, width, dtype=np.int64)
        vslots = width

        def fill_val(pb, pm, off):
            pb[:, off:off + width] = planes
            pm[:, off:off + width] = (True if valid is None
                                      else valid[:, None])

    elif tname in ("string", "bytes"):
        fc = (pc.fill_null(col, "" if tname == "string" else b"")
              if has_nulls else col)
        big = pa.types.is_large_string(fc.type) \
            or pa.types.is_large_binary(fc.type)
        odt, osz = (np.int64, 8) if big else (np.int32, 4)
        offs = np.frombuffer(fc.buffers()[1], dtype=odt, count=n + 1,
                             offset=fc.offset * osz).astype(np.int64)
        dbuf = fc.buffers()[2]
        data = (np.frombuffer(dbuf, dtype=np.uint8)
                if dbuf is not None else np.empty(0, dtype=np.uint8))
        src = offs[:-1]
        lens = offs[1:] - src
        zl = _zigzag(lens)
        hlen = _varint_len(zl)
        vlen = hlen + lens
        hmax = int(hlen.max()) if n else 1
        wmax = int(lens.max()) if n else 0
        # uniform width + no nulls (the fixed-width-feed shape): the
        # Arrow payload buffer IS an (n, wmax) matrix — block copy it
        uniform = (n > 0 and wmax > 0 and valid is None
                   and bool((lens == wmax).all()))
        vslots = hmax + wmax

        def fill_val(pb, pm, off):
            _fill_varint(pb, pm, off, zl, hlen, hmax, valid)
            poff = off + hmax
            if wmax == 0:
                return
            if uniform:
                start = int(src[0])
                pb[:, poff:poff + wmax] = \
                    data[start:start + n * wmax].reshape(n, wmax)
                pm[:, poff:poff + wmax] = True
                return
            cols = np.arange(wmax, dtype=np.int64)
            live = lens[:, None] > cols
            pm[:, poff:poff + wmax] = \
                live if valid is None else (live & valid[:, None])
            if len(data):
                idx = np.minimum(src[:, None] + cols, len(data) - 1)
                pb[:, poff:poff + wmax] = data[idx]

    else:  # pragma: no cover
        raise ValueError(f"unsupported avro type {tname!r}")

    if not nullable:
        return _Prep(vlen, vslots, fill_val)

    # union branch indexes are 0/1 → their zigzag varints are the
    # single bytes 0x00/0x02
    null_byte = np.uint8(null_index << 1)
    val_byte = np.uint8((1 - null_index) << 1)
    if valid is None:
        length = 1 + vlen

        def fill(pb, pm, off):
            pb[:, off] = val_byte
            pm[:, off] = True
            fill_val(pb, pm, off + 1)
    else:
        length = 1 + np.where(valid, vlen, 0)
        union_bytes = np.where(valid, val_byte, null_byte)

        def fill(pb, pm, off):
            pb[:, off] = union_bytes
            pm[:, off] = True
            fill_val(pb, pm, off + 1)

    return _Prep(length, vslots + 1, fill)


def _encode_core(rc: RecordCodec, batch: pa.RecordBatch):
    """Encode every record; returns (byte array, row starts, row
    lengths) so callers can take the concatenation (OCF blocks) or
    per-row slices (Kafka framing) without re-encoding."""
    n = batch.num_rows
    if batch.num_columns != len(rc.fields):
        raise ValueError(
            f"batch has {batch.num_columns} columns, schema has "
            f"{len(rc.fields)} fields")
    preps = []
    total = np.zeros(n, dtype=np.int64)
    width = 0
    for (fname, tname, null_index), col in zip(rc.fields, batch.columns):
        p = _prep_field(fname, tname, null_index, col)
        preps.append(p)
        total = total + p.length
        width += p.slots
    # padded layout: every fill below is a strided column/block store;
    # both matrices are fully written (each field covers all its slot
    # columns, live or masked), so np.empty is safe
    pb = np.empty((n, width), dtype=np.uint8)
    pm = np.empty((n, width), dtype=bool)
    off = 0
    for p in preps:
        p.fill(pb, pm, off)
        off += p.slots
    out = pb.reshape(-1)[pm.reshape(-1)]
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(total[:-1], out=starts[1:])
    return out, starts, total


def encode_batch(rc: RecordCodec, batch: pa.RecordBatch) -> bytes:
    """Avro binary of every record in ``batch``, concatenated —
    byte-identical to the per-row codec's output."""
    if batch.num_rows == 0:
        return b""
    out, _, _ = _encode_core(rc, batch)
    return out.tobytes()


def encode_batch_rows(rc: RecordCodec, batch: pa.RecordBatch) -> list:
    """Per-record Avro bytes (the Kafka message-value shape): one
    vectorized pass + row-offset slicing."""
    if batch.num_rows == 0:
        return []
    out, starts, lens = _encode_core(rc, batch)
    mv = memoryview(out)
    return [bytes(mv[s:s + ln]) for s, ln in
            zip(starts.tolist(), lens.tolist())]


def write_ocf_arrow(
    fh: io.BufferedIOBase,
    rc: RecordCodec,
    batches: Iterable[pa.RecordBatch],
    *,
    codec: str = "snappy",
    sync: bytes | None = None,
    block_rows: int = 65536,
) -> int:
    """Write Arrow batches as an Avro OCF stream (header/blocks/sync
    framing identical to ``avro_codec.write_ocf``); returns row count."""
    if sync is None:
        sync = (zlib.crc32(rc.schema_json.encode())
                & 0xFFFFFFFF).to_bytes(4, "big") * 4
    fh.write(MAGIC)
    meta = io.BytesIO()
    write_long(meta, 2)
    write_bytes(meta, b"avro.schema")
    write_bytes(meta, rc.schema_json.encode("utf-8"))
    write_bytes(meta, b"avro.codec")
    write_bytes(meta, codec.encode())
    write_long(meta, 0)
    fh.write(meta.getvalue())
    fh.write(sync)

    n_total = 0
    for batch in batches:
        for s in range(0, batch.num_rows, block_rows):
            chunk = batch.slice(s, min(block_rows, batch.num_rows - s))
            if chunk.num_rows == 0:
                continue
            if chunk.num_rows > _ENC_ROWS:
                # encode in cache-sized sub-slices (the padded matrix
                # of a 64 Ki-row chunk spills L2; ~25% faster at 16 Ki
                # — r12 ingest-bar sweep) and concatenate: the block
                # payload is a plain record concatenation, so the
                # bytes are identical to one-shot encoding
                payload = b"".join(
                    encode_batch(rc, chunk.slice(t, _ENC_ROWS))
                    for t in range(0, chunk.num_rows, _ENC_ROWS))
            else:
                payload = encode_batch(rc, chunk)
            comp = compress_block(codec, payload)
            head = io.BytesIO()
            write_long(head, chunk.num_rows)
            write_long(head, len(comp))
            fh.write(head.getvalue())
            fh.write(comp)
            fh.write(sync)
            n_total += chunk.num_rows
    return n_total


def wire_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    """Temporal columns → epoch ints (timestamp[us/ms]→long,
    date32→int), the codec wire form — columnar equivalent of
    ``sinks.avro._to_wire``."""
    cols, changed = [], False
    for col in batch.columns:
        if pa.types.is_timestamp(col.type):
            cols.append(col.cast(pa.int64()))
            changed = True
        elif pa.types.is_date32(col.type):
            cols.append(col.cast(pa.int32()))
            changed = True
        else:
            cols.append(col)
    if not changed:
        return batch
    return pa.RecordBatch.from_arrays(cols, names=batch.schema.names)


def fixed_width_to_avro_fused(
    spark,
    path: str,
    schema,
    out_dir: str,
    *,
    tasks: int = 32,
    codec: str = "snappy",
    prefix: str = "part-",
    batch_rows: int = 65536,
) -> int:
    """Reference-shaped single-stage ingest: each task reads its byte
    range, numpy-parses the fixed-width matrix, vector-encodes Avro and
    writes one OCF file — data never materializes as Spark rows and
    never crosses into the JVM (cf. the reference's chunked
    parse→serialize pipeline, `fixed2avro/Exporters.go:105-138`). The
    per-partition imperative body is exactly what RDD.mapPartitions is
    for; everything upstream/downstream of ingest stays DataFrame.

    Returns total rows written. Output files match
    ``write_avro_ocf``'s schema (nullable unions) and naming.
    """
    import os

    from shredder_spark.avro_schema import FixedSchema, \
        parse_avro_fixed_schema
    from shredder_spark.sinks.avro import spark_schema_to_avro
    from shredder_spark.sources.fixedwidth_arrow import (
        FixedWidthArrowReader, _Range, _parse_batch)
    from shredder_spark.utils import ensure_package_on_executors

    fs = schema if isinstance(schema, FixedSchema) \
        else parse_avro_fixed_schema(schema)
    avro_schema = spark_schema_to_avro(fs.to_struct_type())

    ensure_package_on_executors(spark)
    os.makedirs(out_dir, exist_ok=True)
    planner = FixedWidthArrowReader(
        {"path": path, "cores": str(tasks)}, fs)
    ranges = [(i, p.path, p.start, p.end)
              for i, p in enumerate(planner.partitions())]

    def run(it) -> Iterator[tuple]:
        for i, fpath, s, e in it:
            rdr = FixedWidthArrowReader({"path": fpath, "cores": "1"}, fs)
            mat = rdr._matrix(rdr._range_bytes(_Range(fpath, s, e)))
            rc = RecordCodec(avro_schema)
            out_path = os.path.join(out_dir, f"{prefix}{i:05d}.avro")

            def gen() -> Iterator[pa.RecordBatch]:
                for j in range(0, mat.shape[0], batch_rows):
                    yield wire_batch(_parse_batch(mat[j:j + batch_rows], fs))

            with open(out_path, "wb") as fh:
                n = write_ocf_arrow(fh, rc, gen(), codec=codec)
            if n == 0:
                os.remove(out_path)
            yield (i, n)

    # Pack ranges into exactly ``tasks`` partitions (r12: the planner
    # emits one range per FILE when total/cores exceeds a file's size,
    # so parallelize(ranges, len(ranges)) ran one task per file — 32
    # concurrent tasks on the 32-file bench fixture regardless of the
    # requested shape, which is what inflated every "per-core at the
    # 4-task shape" figure carried since r8). mapPartitions iterates
    # the slice's ranges sequentially inside one task.
    counts = (spark.sparkContext
              .parallelize(ranges, max(min(tasks, len(ranges)), 1))
              .mapPartitions(run).collect())
    return int(sum(n for _, n in counts))
