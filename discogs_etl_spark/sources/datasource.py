"""Discogs dumps as a first-class Spark DATA SOURCE (Python DataSource
API, Spark 4+): ``spark.read.format("discogs_xml")``.

SURVEY.md §2.1 S2-S3 notes the reference's byte-buffer plumbing is
"subsumed by Spark's source framework"; this module makes that literal —
the streaming XML kernel (sources/xml_ingest.py: chunked lenient gzip
inflate → incremental decode → repair-with-carry → pull parse, reference
process.py:285-349 semantics) plugs into the framework as a named source,
so every framework feature comes free: schema projection at the scan,
one InputPartition per dump file (gzip is unsplittable — the partition
boundary IS the file boundary, the reference's own constraint), and an
incremental STREAM reader over a landing directory whose offsets are the
set of files seen (the monthly-dump arrival model of SURVEY §1.1, with
exactly-once via offset commit instead of hand-rolled bookkeeping).

Usage::

    spark.dataSource.register(DiscogsXMLDataSource)
    df = (spark.read.format("discogs_xml")
          .option("path", "/landing/discogs_20240101_releases.xml.gz")
          .load())                      # entity type inferred from name
    stream = (spark.readStream.format("discogs_xml")
              .option("path", "/landing").option("type", "release")
              .load())

The batch reader and ``ingest_xml`` produce identical rows (pinned by
test); ``ingest_xml`` remains the default path — this source exists so a
user of the engine can consume dumps through the standard reader/stream
surface without importing engine modules.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _DumpFile(InputPartition):
    """One dump file = one partition (unsplittable gzip)."""

    def __init__(self, path: str, data_type: str):
        self.path = path
        self.data_type = data_type


def _expand(path_opt: str, allow_empty: bool = False) -> list[str]:
    """Option → concrete file list: a file, a glob, or a directory of
    ``*.xml.gz`` dumps, sorted for determinism.  A non-matching glob or
    missing file fails HERE, at planning time — never as a
    FileNotFoundError deep inside an executor task (``allow_empty`` is
    for the STREAM reader, where an empty landing dir just means no
    arrivals yet)."""
    if os.path.isdir(path_opt):
        return sorted(glob.glob(os.path.join(path_opt, "*.xml.gz")))
    if os.path.isfile(path_opt):
        return [path_opt]
    hits = sorted(glob.glob(path_opt))
    if not hits and not allow_empty:
        raise FileNotFoundError(
            f"discogs_xml: no input files match {path_opt!r}"
        )
    return hits


def _dtype_for(options, paths: Sequence[str]) -> str:
    """Entity type from the explicit option, else from the FILENAMES —
    checked across EVERY file: a landing dir mixing dump types would
    otherwise silently parse releases with the artist kernel."""
    from discogs_etl_spark.sources.xml_ingest import detect_data_type

    t = options.get("type")
    if t:
        return t
    if not paths:
        raise ValueError("discogs_xml: no files and no explicit 'type' option")
    types = {detect_data_type(p) for p in paths}
    if len(types) > 1:
        raise ValueError(
            f"discogs_xml: mixed entity types {sorted(types)} in one read — "
            "pass an explicit 'type' option or split the paths"
        )
    return types.pop()


_ARROW_BATCH_ROWS = 1000  # reference chunk size (etl.py:321) — same batching


def _rows_for(path: str, data_type: str, schema: StructType) -> Iterator:
    """Executor-side: stream-parse one dump and emit ARROW RECORD BATCHES
    (the DataSource API's vectorized path — yielding pyarrow batches
    skips per-row pickling entirely; same chunk-of-1000 batching the
    reference feeds its ParquetWriter).  Memory stays bounded by the
    batch size, not the dump."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from discogs_etl_spark.sources.xml_ingest import _iter_records_from_path

    pa_schema = to_arrow_schema(schema)
    buf: list[dict] = []
    for rec in _iter_records_from_path(path, data_type):
        buf.append(rec)
        if len(buf) >= _ARROW_BATCH_ROWS:
            yield pa.RecordBatch.from_pylist(buf, schema=pa_schema)
            buf = []
    if buf:
        yield pa.RecordBatch.from_pylist(buf, schema=pa_schema)


class _BatchReader(DataSourceReader):
    def __init__(self, schema: StructType, paths: list[str], data_type: str):
        self._schema = schema
        self._paths = paths
        self._dtype = data_type

    def partitions(self) -> list[InputPartition]:
        return [_DumpFile(p, self._dtype) for p in self._paths]

    def read(self, partition: _DumpFile) -> Iterator:
        yield from _rows_for(partition.path, partition.data_type, self._schema)


class _StreamReader(DataSourceStreamReader):
    """Incremental landing-directory consumption: an OFFSET is the sorted
    list of dump files seen so far; each micro-batch's partitions are the
    files that appeared since the previous offset.  Exactly-once comes
    from the engine's offset log — re-running after a crash replays only
    uncommitted batches, which is the hand-rolled checkpoint logic of the
    reference's monthly loop (run.py:28-41) for free."""

    def __init__(self, schema: StructType, land_dir: str, data_type: str):
        self._schema = schema
        self._dir = land_dir
        self._dtype = data_type

    def _list(self) -> list[str]:
        return _expand(self._dir, allow_empty=True)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": self._list()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        new = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return [_DumpFile(p, self._dtype) for p in new]

    def read(self, partition: _DumpFile) -> Iterator:
        yield from _rows_for(partition.path, partition.data_type, self._schema)

    def commit(self, end: dict) -> None:
        pass  # the engine's offset log is the source of truth

    def stop(self) -> None:
        pass


class DiscogsXMLDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "discogs_xml"

    def _paths(self) -> list[str]:
        p = self.options.get("path")
        if not p:
            raise ValueError("discogs_xml requires a 'path' option")
        return _expand(p)

    def schema(self) -> StructType:
        from discogs_etl_spark.schemas import SCHEMAS

        return SCHEMAS[_dtype_for(self.options, self._paths())]

    def reader(self, schema: StructType) -> DataSourceReader:
        paths = self._paths()
        return _BatchReader(schema, paths, _dtype_for(self.options, paths))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        p = self.options.get("path")
        if not p:
            raise ValueError("discogs_xml requires a 'path' option")
        return _StreamReader(
            schema, p, _dtype_for(self.options, _expand(p, allow_empty=True))
        )


def register(spark) -> None:
    """Idempotent source registration + package shipping (executor Python
    workers must import discogs_etl_spark to unpickle the reader)."""
    from discogs_etl_spark.shipping import ensure_shipped

    ensure_shipped(spark.sparkContext)
    spark.dataSource.register(DiscogsXMLDataSource)
