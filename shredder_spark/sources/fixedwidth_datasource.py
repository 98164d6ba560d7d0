"""Fixed-width files as a first-class Spark format via the Python Data
Source API (Spark 4): ``spark.read.format("fixedwidth")``.

This is the SURVEY.md §4.2 "optionally a Python Data Source later"
tier: the expression tier (`sources/fixedwidth.py`, ``spark.read.text``
+ substring/cast) remains the throughput path because it stays entirely
in whole-stage codegen; this tier exists for format parity — a real
``format()`` name, self-describing partition planning, and Arrow-batch
output — and mirrors the reference's chunked scan semantics directly:

- ``cores`` partitions of ~equal byte size (`ColumnBuilder.go:136-141`,
  one chunk per core);
- chunks align on line boundaries: a partition that starts mid-line
  skips forward past the next ``\\n`` and the previous partition
  finishes that line — the streaming equivalent of the reference's
  backward CRLF scan (`common/fixed.go:150-164`), without ever holding
  the file in RAM (deliberately NOT porting the whole-file buffer at
  `ColumnBuilder.go:132`);
- a line starting with twelve ``*`` terminates that partition's scan
  (`ColumnBuilder.go:211-214`);
- fields are sliced at cumulative RUNE offsets (Python str slicing ==
  rune slicing; parity with `fixed2avro/Util.go:45-65`).

The source emits raw per-field strings in Arrow batches; typed casts
are applied JVM-side by composing with the expression layer's
``_cast_expr`` (ANSI-safe try_cast semantics, SURVEY.md §1.4), so the
Python boundary ships columnar strings once and everything after is
codegen.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition, SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

from shredder_spark.avro_schema import FixedSchema, parse_avro_fixed_schema
from shredder_spark.sources.fixedwidth import FOOTER_PREFIX, _cast_expr

_BATCH_ROWS = 4096


@dataclass
class _ByteRange(InputPartition):
    start: int
    end: int  # exclusive


class FixedWidthDataSource(DataSource):
    """``format("fixedwidth")`` — options:

    - ``path`` (set by ``.load(path)``): local/posix path of one file;
    - ``fixed_schema``: the Avro+len JSON schema text (reference
      schema dialect, `common/fixed.go:86-148` semantics);
    - ``cores`` (default 8): number of input partitions, reference
      chunk parity;
    - ``footer_prefix`` (default twelve ``*``): early-stop marker.
    """

    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def _fixed(self) -> FixedSchema:
        return parse_avro_fixed_schema(self.options["fixed_schema"])

    def schema(self) -> StructType:
        return StructType(
            [StructField(f.name, StringType()) for f in self._fixed().fields]
        )

    def reader(self, schema: StructType) -> "FixedWidthReader":
        return FixedWidthReader(dict(self.options), self._fixed())

    def simpleStreamReader(self, schema: StructType) -> "FixedWidthStreamReader":
        return FixedWidthStreamReader(dict(self.options), self._fixed())


class FixedWidthReader(DataSourceReader):
    def __init__(self, options: dict, fixed: FixedSchema):
        self.path = options["path"]
        self.fixed = fixed
        self.cores = int(options.get("cores", "8"))
        self.footer_prefix = options.get("footer_prefix", FOOTER_PREFIX)
        self.size = os.path.getsize(self.path)

    def partitions(self):
        if self.size == 0:
            return [_ByteRange(0, 0)]
        chunk = max(1, math.ceil(self.size / self.cores))
        return [
            _ByteRange(start, min(start + chunk, self.size))
            for start in range(0, self.size, chunk)
        ]

    def read(self, partition: _ByteRange):
        import pyarrow as pa

        offsets = [
            (start - 1, start - 1 + f.length)
            for f, start in self.fixed.field_offsets()
        ]
        names = [f.name for f in self.fixed.fields]
        columns: list[list[str]] = [[] for _ in names]
        n_buffered = 0

        with open(self.path, "rb") as fh:
            # HDFS split convention: this partition owns every line that
            # STARTS in [start, end). Seeking to start-1 and discarding
            # the line containing that byte handles both cases — a
            # boundary mid-line (previous partition finishes it) and a
            # boundary exactly at a line start (that line is ours).
            if partition.start > 0:
                fh.seek(partition.start - 1)
                fh.readline()
            else:
                fh.seek(0)
            while fh.tell() < partition.end:
                raw = fh.readline()
                if not raw:
                    break
                line = raw.decode("utf-8").rstrip("\r\n")
                if not line:
                    continue
                if self.footer_prefix and line.startswith(self.footer_prefix):
                    break  # reference: footer ends the chunk's scan
                for i, (a, b) in enumerate(offsets):
                    columns[i].append(line[a:b])
                n_buffered += 1
                if n_buffered >= _BATCH_ROWS:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(c, type=pa.string()) for c in columns],
                        names=names,
                    )
                    columns = [[] for _ in names]
                    n_buffered = 0
        if n_buffered:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=pa.string()) for c in columns], names=names
            )


class FixedWidthStreamReader(SimpleDataSourceStreamReader):
    """Streaming tier of ``format("fixedwidth")``: tails a landing
    DIRECTORY — each micro-batch picks up files not named in the last
    committed offset (the reference CLI's continuous mode, `CLI.go:30-63`
    run per dropped file, as a Structured Streaming source with
    exactly-once file accounting).

    Offsets are the CUMULATIVE list of ``[name, size]`` pairs already
    committed — a JSON value the checkpoint log owns, so restart/replay
    semantics (``readBetweenOffsets``) are deterministic replays of the
    same file set. Committed names are retained even after the file
    disappears from the directory (a delete-then-redrop under the same
    name is NOT re-ingested — the name stays in the offset). Rune-offset
    slicing and footer handling match the batch reader.

    Drop contract: files must appear ATOMICALLY (write to a dot/underscore
    prefixed temp name in the same directory, then rename) — the listing
    skips ``.``/``_`` prefixes for exactly this protocol. A file written
    in place can be listed mid-write; its name commits on first sight and
    the tail written later is never read. The recorded size is the bytes
    this source observed at commit time, so such torn drops are at least
    diagnosable from the checkpoint log.
    """

    def __init__(self, options: dict, fixed: FixedSchema):
        self.dir = options["path"]
        self.fixed = fixed
        self.footer_prefix = options.get("footer_prefix", FOOTER_PREFIX)
        self._offsets = [
            (start - 1, start - 1 + f.length)
            for f, start in fixed.field_offsets()
        ]

    def initialOffset(self) -> dict:
        return {"files": []}

    def _list(self) -> list[str]:
        return sorted(
            fn for fn in os.listdir(self.dir)
            if not fn.startswith((".", "_"))
            and os.path.isfile(os.path.join(self.dir, fn))
        )

    def _parse_file(self, path: str):
        with open(path, "rb") as fh:
            for raw in fh:
                line = raw.decode("utf-8").rstrip("\r\n")
                if not line:
                    continue
                if self.footer_prefix and line.startswith(self.footer_prefix):
                    break
                yield tuple(line[a:b] for a, b in self._offsets)

    def _rows_for(self, new_files: list[str]):
        # materialized list, not a generator: the simple-reader wrapper
        # caches the returned iterator with copy.copy for replay, which
        # list iterators support and generators don't. The simple API
        # prefetches driver-side by design, so a micro-batch's rows are
        # bounded by that batch's file set either way.
        rows: list[tuple] = []
        for fn in new_files:
            rows.extend(self._parse_file(os.path.join(self.dir, fn)))
        return rows

    @staticmethod
    def _names(offset: dict) -> list[str]:
        # entries are [name, size]; tolerate bare-name entries from
        # pre-size checkpoints
        return [e[0] if isinstance(e, (list, tuple)) else e
                for e in offset.get("files", [])]

    def read(self, start: dict):
        committed = set(self._names(start))
        new = [f for f in self._list() if f not in committed]
        # offset is cumulative: committed entries persist even when the
        # file has left the directory (same-name redrop stays excluded)
        merged = list(start.get("files", [])) + [
            [f, os.path.getsize(os.path.join(self.dir, f))] for f in new
        ]
        return iter(self._rows_for(new)), {"files": merged}

    def readBetweenOffsets(self, start: dict, end: dict):
        committed = set(self._names(start))
        new = [f for f in self._names(end) if f not in committed]
        return iter(self._rows_for(new))


def register_fixedwidth_source(spark: SparkSession) -> None:
    spark.dataSource.register(FixedWidthDataSource)


def read_via_datasource(
    spark: SparkSession,
    path: str,
    schema: str | dict | FixedSchema,
    *,
    cores: int = 8,
) -> DataFrame:
    """Typed fixed-width read through the registered format: raw string
    fields from the Python source, reference casts (A12–A21 intended
    semantics) applied as JVM expressions on top."""
    fs = schema if isinstance(schema, FixedSchema) else parse_avro_fixed_schema(schema)
    register_fixedwidth_source(spark)
    import json as _json

    schema_text = (
        schema if isinstance(schema, str) else _json.dumps(
            {
                "name": fs.name,
                "type": "record",
                "fields": [
                    {"name": f.name, "type": f.type_name, "len": f.length}
                    for f in fs.fields
                ],
            }
        )
    )
    raw = (
        spark.read.format("fixedwidth")
        .option("fixed_schema", schema_text)
        .option("cores", str(cores))
        .load(path)
    )
    from pyspark.sql import functions as F

    return raw.select(
        *[_cast_expr(f, F.col(f.name)).alias(f.name) for f in fs.fields]
    )
