"""Arrow-vectorized fixed-width parse tier (``engine="arrow"``).

The expression tier (`fixedwidth.read_fixed_width`) parses ~51 MB/s
per core at the reference's 4-task shape — the per-column
`try_cast(substring(...))` chain dominates end-to-end →Avro cost
(measured: end-to-end = harmonic(parse, serializer), see
SCALE.md round-8 ingest notes). This tier replaces the JVM cast chain
with one ``mapInArrow`` pass whose body is pure numpy over the Arrow
string buffer:

- ``spark.read.text`` still does the distributed split (HDFS-style
  byte ranges + line fixup — the part that must scale), so the tier
  inherits the expression path's 100 TB scan shape;
- within a batch, all rows of a fixed-width feed have one width, so
  the Arrow string column's data buffer IS an ``n × width`` byte
  matrix — ``np.frombuffer(...).reshape`` with zero copies, column
  slices are views, and numeric parsing is C-speed ``astype``
  (~200 MB/s/core full-row, 4× the expression tier);
- the custom ``yyyy-MM-dd-HH.mm.ss[.ffffff]`` timestamps are composed
  from sliced digit fields with the days-from-civil formula — no
  per-row formatter.

Semantics: identical to the expression tier on clean single-byte
feeds (equality-tested in tests/test_fixedwidth_arrow.py). This is
the declared-ASCII fast path: like ``encoding="ascii"`` it slices
bytes, and a malformed numeric field falls back to a per-element
parse that yields NULL (same null-on-failure contract as try_cast).
Feeds needing rune-correct slicing or quarantine stay on the
expression tier.

Reference parity: same A6-A21 surface as sources/fixedwidth.py
(`fixed2avro/ColumnBuilder.go:98-227` field loop, reimplemented as
columnar batch ops).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from shredder_spark.avro_schema import FixedSchema, parse_avro_fixed_schema
from shredder_spark.sources.fixedwidth import FOOTER_PREFIX

_SPARK_TYPES = {
    "boolean": "boolean",
    "bytes": "binary",
    "Bytes": "binary",
    "float": "float",
    "double": "double",
    "int": "int",
    "long": "long",
    "string": "string",
    "date": "date",
    "timestamp-millis": "timestamp",
    "timestamp-micros": "timestamp",
}


def _ddl(fs: FixedSchema) -> str:
    return ", ".join(f"{f.name} {_SPARK_TYPES[f.type_name]}"
                     for f in fs.fields)


def _string_array(mat: np.ndarray, start: int, length: int) -> pa.Array:
    """Zero-copy fixed-width string column: one contiguous byte blob
    + arithmetic offsets (pa.py_buffer wraps the numpy memory — no
    tobytes round trip)."""
    blob = np.ascontiguousarray(mat[:, start:start + length]).reshape(-1)
    n = mat.shape[0]
    offsets = np.arange(0, (n + 1) * length, length, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets), pa.py_buffer(blob))


def _num_fallback(raw: np.ndarray, dtype):
    """Per-element tolerant parse for a batch where vectorized astype
    failed: bad field → null (the try_cast contract)."""
    out = np.zeros(len(raw), dtype=dtype)
    mask = np.zeros(len(raw), dtype=bool)
    py = int if np.issubdtype(dtype, np.integer) else float
    for i, b in enumerate(raw):
        try:
            out[i] = py(b)
        except ValueError:
            mask[i] = True
    return out, mask


def _num_array(mat: np.ndarray, start: int, length: int, dtype,
               pa_type) -> pa.Array:
    # fast path (r12, the parse leg of the ingest bar): zero-copy
    # string view → Arrow C++ ascii-trim + cast kernels — ~4× numpy's
    # per-element astype strtol on clean right-aligned feeds. Any row
    # Arrow won't parse (junk bytes, overflow, all-space) raises and
    # drops to the numpy path, whose semantics stay authoritative
    # (vectorized astype, then per-element null-on-failure).
    try:
        return pc.cast(
            pc.ascii_trim_whitespace(_string_array(mat, start, length)),
            pa_type)
    except pa.ArrowInvalid:
        pass
    raw = np.ascontiguousarray(mat[:, start:start + length]) \
        .view(f"S{length}").ravel()
    try:
        vals = raw.astype(dtype)
        return pa.array(vals, type=pa_type)
    except ValueError:
        vals, mask = _num_fallback(raw, dtype)
        return pa.array(vals, type=pa_type, mask=mask)


def _days_from_civil(y: np.ndarray, m: np.ndarray,
                     d: np.ndarray) -> np.ndarray:
    """Vectorized Howard Hinnant days-from-civil (public algorithm):
    days since 1970-01-01 for proleptic-Gregorian y/m/d."""
    y = y - (m <= 2)
    era = np.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + np.where(m > 2, -3, 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


# `yyyy-MM-dd-HH.mm.ss` component digit positions (relative to field
# start) and one (19 × 6) weight matrix: components = digits @ _TS_M —
# a single BLAS matvec replaces six per-component `_digits` loops
# (r12, the parse leg of the ingest bar; ~4× on this stage).
_TS_WINDOWS = ((0, 4), (5, 7), (8, 10), (11, 13), (14, 16), (17, 19))
_TS_DIGIT_POS = np.array(
    [j for lo, hi in _TS_WINDOWS for j in range(lo, hi)])
# float32 is exact here: every weighted digit sum is an integer
# ≤ 9999 (components) or ≤ 999999 (fraction), far under 2^24
_TS_M = np.zeros((19, 6), dtype=np.float32)
for _c, (_lo, _hi) in enumerate(_TS_WINDOWS):
    for _j in range(_lo, _hi):
        _TS_M[_j, _c] = 10.0 ** (_hi - 1 - _j)


def _ts_micros(mat: np.ndarray, start: int, length: int) -> pa.Array:
    """`yyyy-MM-dd-HH.mm.ss[.ffffff]` → timestamp (epoch micros).
    Mirrors fixedwidth._ts_micros_expr: components sliced at fixed
    offsets (separators not re-validated, reference parity), fraction
    right-padded to micros, any bad digit → null."""
    n = mat.shape[0]
    sl = mat[:, start:start + 19].view(np.uint8)
    if sl.shape[1] < 19:  # truncated field → all rows bad, not a crash
        sl = np.concatenate(
            [sl, np.full((n, 19 - sl.shape[1]), ord(" "),
                         dtype=np.uint8)], axis=1)
    is_digit = (sl >= ord("0")) & (sl <= ord("9"))
    digit_ok = is_digit[:, _TS_DIGIT_POS].all(axis=1)
    # (byte-48) wraps for non-digits; ×is_digit zeroes them — all in
    # uint8, then one float32 sgemm extracts every component at once
    dv = ((sl - np.uint8(48)) * is_digit).astype(np.float32)
    comps = (dv @ _TS_M).astype(np.int64)  # y mo d hh mi ss
    y, mo, d = comps[:, 0], comps[:, 1], comps[:, 2]
    hh, mi, ss = comps[:, 3], comps[:, 4], comps[:, 5]
    # fraction: a DIGIT PREFIX right-padded to micros, then field pad
    # spaces (the expression tier trims the value before rpad'ing the
    # fraction with zeros — '.5    ' means 500000 µs). Digits after a
    # space, or any other char, → bad (nulls the timestamp, same as
    # try_cast on the padded fraction). Weight of fraction digit i is
    # 10^(5-i) regardless of how many digits follow — algebraically
    # identical to the old prefix-value × 10^(6-nd) form.
    frac = np.zeros(n, dtype=np.int64)
    fbad = np.zeros(n, dtype=bool)
    fw = min(6, max(0, length - 20))
    if fw > 0:
        fsl = mat[:, start + 20:start + 20 + fw].view(np.uint8)
        digit = (fsl >= ord("0")) & (fsl <= ord("9"))
        space = fsl == ord(" ")
        pref = np.logical_and.accumulate(digit, axis=1)
        fbad = ~(pref | space).all(axis=1)
        fd = ((fsl - np.uint8(48)) * pref).astype(np.float32)
        frac = (fd @ (10.0 ** np.arange(5, 5 - fw, -1,
                                        dtype=np.float32))) \
            .astype(np.int64)
    bad = ~digit_ok | (mo < 1) | (mo > 12) | (d < 1) | (d > 31) | fbad
    safe = lambda a, lo: np.where(bad, lo, a)  # noqa: E731
    days = _days_from_civil(safe(y, 1970), safe(mo, 1), safe(d, 1))
    micros = (((days * 24 + safe(hh, 0)) * 60 + safe(mi, 0)) * 60
              + safe(ss, 0)) * 1_000_000 + frac
    return pa.array(micros, type=pa.timestamp("us"), mask=bad)


def _bool_array(mat: np.ndarray, start: int, length: int) -> pa.Array:
    """First non-space char: J/Y → true, N → false, else null
    (fixedwidth._cast_expr boolean parity; fields are 1-char in
    practice, ltrim handled by taking the first non-space)."""
    sl = mat[:, start:start + length].view(np.uint8)
    first = sl[:, 0].copy()
    for i in range(1, sl.shape[1]):  # ltrim across the (tiny) width
        is_space = first == ord(" ")
        first = np.where(is_space, sl[:, i], first)
    up = np.where((first >= ord("a")) & (first <= ord("z")),
                  first - 32, first)
    t = (up == ord("J")) | (up == ord("Y"))
    f = up == ord("N")
    return pa.array(t, type=pa.bool_(), mask=~(t | f))


def _parse_batch(mat: np.ndarray, fs: FixedSchema) -> pa.RecordBatch:
    cols, pos = [], 0
    for f in fs.fields:
        t = f.type_name
        if t == "string":
            cols.append(_string_array(mat, pos, f.length))
        elif t in ("bytes", "Bytes"):
            blob = np.ascontiguousarray(mat[:, pos:pos + f.length])
            n = mat.shape[0]
            offsets = np.arange(0, (n + 1) * f.length, f.length,
                                dtype=np.int32)
            cols.append(pa.BinaryArray.from_buffers(
                pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()),
                                 pa.py_buffer(blob.tobytes())]))
        elif t in ("int",):
            cols.append(_num_array(mat, pos, f.length, np.int32,
                                   pa.int32()))
        elif t == "long":
            cols.append(_num_array(mat, pos, f.length, np.int64,
                                   pa.int64()))
        elif t == "float":
            cols.append(_num_array(mat, pos, f.length, np.float32,
                                   pa.float32()))
        elif t == "double":
            cols.append(_num_array(mat, pos, f.length, np.float64,
                                   pa.float64()))
        elif t == "boolean":
            cols.append(_bool_array(mat, pos, f.length))
        elif t in ("timestamp-millis", "timestamp-micros"):
            cols.append(_ts_micros(mat, pos, f.length))
        elif t == "date":
            ts = _ts_micros(mat, pos, f.length)
            days = pa.compute.cast(
                pa.compute.floor(pa.compute.divide(
                    pa.compute.cast(ts, pa.int64()), 86_400_000_000)),
                pa.int32())
            cols.append(days.cast(pa.date32()))
        else:  # pragma: no cover
            raise ValueError(f"unsupported type {t!r}")
        pos += f.length
    names = [f.name for f in fs.fields]
    return pa.RecordBatch.from_arrays(cols, names=names)


def read_fixed_width_arrow(
    spark: SparkSession,
    path: str,
    schema: str | dict | FixedSchema,
    *,
    line_sep: str = "\r\n",
    footer_prefix: str = FOOTER_PREFIX,
) -> DataFrame:
    """Arrow-tier fixed-width read: same result as
    ``read_fixed_width(..., encoding="ascii")`` on single-byte feeds,
    parsed in numpy batches instead of per-column JVM casts."""
    fs = schema if isinstance(schema, FixedSchema) \
        else parse_avro_fixed_schema(schema)
    width = fs.row_width

    lines = spark.read.text(path, lineSep=line_sep)
    if footer_prefix:
        lines = lines.filter(~F.col("value").startswith(footer_prefix))
    lines = lines.filter(F.length("value") > 0)

    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            col = batch.column(0)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            n = len(col)
            if n == 0:
                continue
            buf = None
            if col.null_count == 0:
                offs_buf = col.buffers()[1]
                offsets = np.frombuffer(
                    offs_buf, dtype=(np.int64 if pa.types.is_large_string(
                        col.type) else np.int32), count=n + 1,
                    offset=col.offset * (8 if pa.types.is_large_string(
                        col.type) else 4))
                if offsets[-1] - offsets[0] == n * width and \
                        (np.diff(offsets) == width).all():
                    data = np.frombuffer(col.buffers()[2], dtype="S1")
                    buf = data[offsets[0]:offsets[-1]].reshape(n, width)
            if buf is None:
                # ragged batch (shouldn't happen on a well-formed
                # feed): pad/truncate each row to the declared width
                rows = [v.encode("utf-8", "replace")[:width]
                        .ljust(width, b" ") if v is not None
                        else b" " * width for v in col.to_pylist()]
                buf = np.frombuffer(b"".join(rows), dtype="S1") \
                    .reshape(len(rows), width)
            yield _parse_batch(buf, fs)

    return lines.mapInArrow(parse, _ddl(fs))


# ---------------------------------------------------------------------
# DataSource-API variant: the mapInArrow tier above still ships the raw
# line strings JVM→Python before parsing (spark.read.text does the
# scan), i.e. the bytes cross the Arrow socket twice. This variant
# reads the file byte-range DIRECTLY in the executor's Python worker
# (same split convention as sources/fixedwidth_datasource.py — each
# partition owns every line that STARTS inside its range) and yields
# TYPED Arrow batches, so data crosses the boundary once.

from pyspark.sql.datasource import (  # noqa: E402
    DataSource, DataSourceReader, InputPartition)
from pyspark.sql.types import StructType  # noqa: E402

_ARROW_BATCH_ROWS = 65536


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path, self.start, self.end = path, start, end


class FixedWidthArrowDataSource(DataSource):
    """``format("fixedwidth_arrow")`` — vectorized fixed-width reader.

    Options: ``path``, ``fixed_schema`` (Avro+len JSON), ``cores``
    (input partitions, default 8), ``footer_prefix``, ``batch_rows``
    (rows per Arrow batch crossing to the JVM, default 65536).
    """

    @classmethod
    def name(cls) -> str:
        return "fixedwidth_arrow"

    def _fixed(self) -> FixedSchema:
        return parse_avro_fixed_schema(self.options["fixed_schema"])

    def schema(self) -> StructType:
        return self._fixed().to_struct_type()

    def reader(self, schema: StructType) -> "FixedWidthArrowReader":
        return FixedWidthArrowReader(dict(self.options), self._fixed())


class FixedWidthArrowReader(DataSourceReader):
    def __init__(self, options: dict, fixed: FixedSchema):
        import glob
        import os

        path = options["path"]
        self.fixed = fixed
        self.cores = int(options.get("cores", "8"))
        self.batch_rows = int(options.get("batch_rows",
                                          str(_ARROW_BATCH_ROWS)))
        self.footer_prefix = options.get(
            "footer_prefix", FOOTER_PREFIX).encode()
        if os.path.isdir(path):
            # Spark text-source directory convention: every data file
            # (skip _SUCCESS/_manifest dotfiles)
            self.files = sorted(
                f for f in glob.glob(os.path.join(path, "*"))
                if os.path.isfile(f)
                and not os.path.basename(f).startswith(("_", ".")))
        else:
            self.files = [path]
        self.sizes = {f: os.path.getsize(f) for f in self.files}

    def partitions(self):
        import math

        total = sum(self.sizes.values())
        if total == 0:
            return [_Range(self.files[0] if self.files else "", 0, 0)]
        chunk = max(1, math.ceil(total / self.cores))
        parts = []
        for f in self.files:
            size = self.sizes[f]
            for s in range(0, size, chunk):
                parts.append(_Range(f, s, min(s + chunk, size)))
        return parts

    def _range_bytes(self, part: _Range) -> bytes:
        with open(part.path, "rb") as fh:
            if part.start > 0:
                fh.seek(part.start - 1)
                fh.readline()  # owner of the boundary line finishes it
            a = fh.tell()
            if a >= part.end:
                return b""
            data = fh.read(part.end - a)
            if not data.endswith(b"\n"):
                data += fh.readline()  # finish our final line
        return data

    def _matrix(self, data: bytes) -> np.ndarray:
        """bytes → n×width matrix. Fast path: uniform width+CRLF rows
        reshape in place; otherwise line-split with space padding
        (clean-feed tier: width deviations are data errors that the
        null-on-failure casts surface)."""
        w = self.fixed.row_width
        w2 = w + 2
        if data and len(data) % w2 == 0:
            mat = np.frombuffer(data, dtype="S1").reshape(-1, w2)
            if (mat[:, w] == b"\r").all() and (mat[:, w + 1] == b"\n").all():
                mat = mat[:, :w]
                fp = self.footer_prefix
                if fp and len(fp) <= w:
                    is_footer = (
                        mat[:, :len(fp)].view(np.uint8)
                        == np.frombuffer(fp, np.uint8)).all(axis=1)
                    if is_footer.any():
                        mat = mat[:int(np.argmax(is_footer))]
                return mat
        rows = []
        for line in data.split(b"\n"):
            line = line.rstrip(b"\r")
            if not line:
                continue
            if self.footer_prefix and line.startswith(self.footer_prefix):
                break
            rows.append(line[:w].ljust(w, b" "))
        if not rows:
            return np.empty((0, w), dtype="S1")
        return np.frombuffer(b"".join(rows), dtype="S1").reshape(-1, w)

    def read(self, part: _Range):
        mat = self._matrix(self._range_bytes(part))
        for i in range(0, max(1, mat.shape[0]), self.batch_rows):
            chunk = mat[i:i + self.batch_rows]
            if chunk.shape[0] or i == 0:
                yield _parse_batch(chunk, self.fixed)


def register_fixedwidth_arrow_source(spark: SparkSession) -> None:
    spark.dataSource.register(FixedWidthArrowDataSource)


def read_fixed_width_arrow_ds(
    spark: SparkSession,
    path: str,
    schema: str | dict | FixedSchema,
    *,
    cores: int | None = None,
    batch_rows: int | None = None,
) -> DataFrame:
    """Vectorized DataSource tier: one Arrow crossing, executor-side
    byte-range reads."""
    import json as _json

    register_fixedwidth_arrow_source(spark)
    fs_json = schema if isinstance(schema, str) else _json.dumps(
        schema if isinstance(schema, dict) else None)
    if fs_json is None or fs_json == "null":
        raise ValueError("pass the schema as JSON text/dict for the "
                         "DataSource tier")
    reader = (spark.read.format("fixedwidth_arrow")
              .option("fixed_schema", fs_json))
    if cores is not None:
        reader = reader.option("cores", str(cores))
    if batch_rows is not None:
        reader = reader.option("batch_rows", str(batch_rows))
    return reader.load(path)
