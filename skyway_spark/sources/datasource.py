"""Spark 4 Python DataSource wrappers: OSM formats as first-class
``spark.read.format(...)`` sources.

    from skyway_spark.sources.datasource import register_datasources
    register_datasources(spark)
    df = spark.read.format("opl").load("/data/*.opl")
    df = spark.read.format("osmpbf").load("/data/planet.osm.pbf")
    df = spark.read.format("osmjson").load("/data/export.json")

Partitioning is the scale story: OPL/JSON split per FILE (a 100 TB
corpus arrives as many files; each task streams one), PBF splits per
BLOB (the ~8 MB compressed block is the format's natural parallel
unit — the same granularity the reference's rayon pool uses,
src/readers/pbf.rs:129-160). Every reader yields plain tuples in the
canonical elements schema; Spark's DataSource machinery handles the
Arrow transfer.

These wrap the same pure-Python decoders the mapInPandas paths use
(pbf.decode_primitive_block, jsonio._element_from_json,
opl.parse_opl_line_py), so both APIs stay semantically identical —
pinned by differential tests in tests/test_converters.py.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

from skyway_spark.schema import ELEMENTS_SCHEMA


def _deep_nullable(dt: T.DataType) -> T.DataType:
    """ELEMENTS_SCHEMA with every field/element nullable: the Python
    DataSource ENFORCES declared nullability on returned rows (unlike
    Column projections), and malformed/blank lines legitimately yield
    null fields in permissive-style reading."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _deep_nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_deep_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _deep_nullable(dt.keyType), _deep_nullable(dt.valueType), True
        )
    return dt


NULLABLE_ELEMENTS_SCHEMA = _deep_nullable(ELEMENTS_SCHEMA)


def _expand_paths(path: str) -> list[str]:
    """Glob or directory -> sorted FILE list (subdirectories and
    _/.-prefixed entries skipped; deterministic partition order)."""
    if os.path.isdir(path):
        hits = [
            os.path.join(path, f) for f in os.listdir(path)
            if not f.startswith(("_", "."))
        ]
    else:
        hits = glob.glob(path) or [path]
    return sorted(h for h in hits if os.path.isfile(h)) or sorted(hits)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _BlobPartition(InputPartition):
    def __init__(self, path: str, slices: list[tuple[int, int]]):
        self.path = path
        self.slices = slices


class OplDataSource(DataSource):
    """``spark.read.format('opl')`` — one partition per file."""

    @classmethod
    def name(cls):
        return "opl"

    def schema(self):
        return NULLABLE_ELEMENTS_SCHEMA

    def reader(self, schema):
        return _OplReader(self.options)


class _OplReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("opl source needs a path: .load('/data/*.opl')")

    def partitions(self):
        return [_FilePartition(p) for p in _expand_paths(self.path)]

    def read(self, partition):
        from skyway_spark.sources.opl import parse_opl_line_py

        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                # blank lines included: parse_opl_lines emits an
                # all-null row for them, and the two APIs must agree
                yield parse_opl_line_py(line.rstrip("\n"))


class OsmJsonDataSource(DataSource):
    """``spark.read.format('osmjson')`` — OSM/Overpass JSON documents,
    one partition per file; unknown fields (bounds/geometry) ignored
    exactly like the reference's lenient serde structs."""

    @classmethod
    def name(cls):
        return "osmjson"

    def schema(self):
        return NULLABLE_ELEMENTS_SCHEMA

    def reader(self, schema):
        return _OsmJsonReader(self.options)


class _OsmJsonReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmjson source needs a path")

    def partitions(self):
        return [_FilePartition(p) for p in _expand_paths(self.path)]

    def read(self, partition):
        import json

        from skyway_spark.sources.jsonio import _element_from_json

        with open(partition.path, encoding="utf-8") as f:
            doc = json.load(f)
        for e in doc.get("elements", []):
            yield _element_from_json(e)


class OsmPbfDataSource(DataSource):
    """``spark.read.format('osmpbf')`` — one partition per group of
    OSMData blobs (option ``blobs_per_task``, default 4)."""

    @classmethod
    def name(cls):
        return "osmpbf"

    def schema(self):
        return NULLABLE_ELEMENTS_SCHEMA

    def reader(self, schema):
        return _OsmPbfReader(self.options)


class _OsmPbfReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmpbf source needs a path")
        self.blobs_per_task = int(options.get("blobs_per_task", "4"))

    def partitions(self):
        from skyway_spark.sources.pbf import scan_blob_index

        parts = []
        for p in _expand_paths(self.path):
            slices = [
                (off, size)
                for (_path, off, size, btype) in scan_blob_index(p)
                if btype == "OSMData"
            ]
            for i in range(0, len(slices), self.blobs_per_task):
                parts.append(_BlobPartition(p, slices[i : i + self.blobs_per_task]))
        if parts:
            return parts
        # header-only PBF (valid, zero OSMData blobs): one empty
        # partition anchored to a REAL file path, never the raw glob
        return [_BlobPartition(_expand_paths(self.path)[0], [])]

    def read(self, partition):
        from skyway_spark.sources.pbf import _blob_raw, decode_primitive_block

        if not partition.slices:
            return
        order = [f.name for f in ELEMENTS_SCHEMA.fields]
        with open(partition.path, "rb") as f:
            for off, size in partition.slices:
                f.seek(off)
                blob = f.read(size)
                for row in decode_primitive_block(_blob_raw(blob)):
                    yield tuple(row.get(k) for k in order)


class WarcDataSource(DataSource):
    """``spark.read.format('warc')`` — Common-Crawl-style WARC files,
    one partition per file, Content-Length-delimited records (parser
    shared with sources/warc.read_warc). ``path`` is the file column
    here (no synthetic file_id for disk reads)."""

    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        from skyway_spark.sources.warc import WARC_SCHEMA

        return _deep_nullable(
            T.StructType(
                [T.StructField("path", T.StringType())]
                + [f for f in WARC_SCHEMA.fields if f.name != "file_id"]
            )
        )

    def reader(self, schema):
        return _WarcReader(self.options)


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs a path: .load('/data/*.warc')")

    def partitions(self):
        return [_FilePartition(p) for p in _expand_paths(self.path)]

    def read(self, partition):
        from skyway_spark.sources.warc import parse_warc_bytes

        with open(partition.path, "rb") as f:
            data = f.read()
        for tup in parse_warc_bytes(data):
            yield (partition.path,) + tup


def register_datasources(spark) -> None:
    """Idempotent registration of all four formats on a session."""
    for ds in (OplDataSource, OsmJsonDataSource, OsmPbfDataSource, WarcDataSource):
        spark.dataSource.register(ds)
