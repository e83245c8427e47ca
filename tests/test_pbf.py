"""PBF reader: pure-Python protobuf/zlib decode, blob-parallel via
mapInPandas, round-tripped through the local fixture encoder.

Parity: reference src/readers/pbf.rs (dense + plain nodes, ways,
relations); unlike the reference we also decode user/timestamp
(pbf.rs:50,53 leaves them None // TODO).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skyway_spark.schema import ELEMENTS_SCHEMA
from skyway_spark.sources.generate import generate_elements
from skyway_spark.sources.pbf import (
    decode_primitive_block,
    encode_pbf,
    read_pbf,
    read_pbf_metadata,
    scan_blob_index,
)

ELS = [
    {"type": "node", "id": 1, "lat": 51.5, "lon": -0.12,
     "tags": {"amenity": "cafe", "name": "Café \U0001f631"}},
    {"type": "node", "id": 2, "lat": -23.55, "lon": -46.63, "tags": {}},
    {"type": "node", "id": 100, "lat": 35.6762001, "lon": 139.6503002,
     "tags": {"k": "v"}},
    {"type": "way", "id": 10, "nodes": [1, 2, 100],
     "tags": {"highway": "tertiary"}, "version": 3, "changeset": 77,
     "uid": 5, "user": "alice", "visible": True,
     "timestamp_ms": 1700000000000},
    {"type": "relation", "id": 20,
     "members": [{"type": "node", "ref": 1, "role": "outer"},
                 {"type": "way", "ref": 10, "role": ""}],
     "tags": {"type": "route"}},
]


@pytest.fixture(scope="module")
def pbf_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pbf") / "fixture.osm.pbf")
    encode_pbf(p, ELS, dense=True, block_size=2)
    return p


def test_blob_index_and_metadata(pbf_path):
    idx = scan_blob_index(pbf_path)
    types = [t for _, _, _, t in idx]
    assert types[0] == "OSMHeader"
    assert types.count("OSMData") == 3  # block_size=2 over 5 elements
    meta = read_pbf_metadata(pbf_path)
    assert meta["generator"] == "skyway_spark-fixture"
    assert "DenseNodes" in meta["features"]


def test_read_pbf_elements(spark, pbf_path):
    df = read_pbf(spark, pbf_path)
    assert df.schema == ELEMENTS_SCHEMA
    rows = {(r["type"], r["id"]): r for r in df.collect()}
    assert set(rows) == {("node", 1), ("node", 2), ("node", 100),
                         ("way", 10), ("relation", 20)}
    n1 = rows[("node", 1)]
    assert abs(n1["lat"] - 51.5) < 1e-7 and abs(n1["lon"] + 0.12) < 1e-7
    assert n1["tags"] == {"amenity": "cafe", "name": "Café \U0001f631"}
    w = rows[("way", 10)]
    assert w["nodes"] == [1, 2, 100]
    # full info fidelity (reference drops user/timestamp, pbf.rs:50,53)
    assert (w["version"], w["changeset"], w["uid"], w["user"], w["visible"]) == (
        3, 77, 5, "alice", True)
    assert w["timestamp"] == "2023-11-14T22:13:20Z"
    rel = rows[("relation", 20)]
    assert [(m["type"], m["ref"], m["role"]) for m in rel["members"]] == [
        ("node", 1, "outer"), ("way", 10, "")]


def test_dense_and_plain_nodes_agree(spark, tmp_path):
    p_dense = str(tmp_path / "d.osm.pbf")
    p_plain = str(tmp_path / "p.osm.pbf")
    encode_pbf(p_dense, ELS, dense=True)
    encode_pbf(p_plain, ELS, dense=False)
    a = sorted(map(tuple, read_pbf(spark, p_dense)
                   .select("type", "id", "lat", "lon", "tags").collect()))
    b = sorted(map(tuple, read_pbf(spark, p_plain)
                   .select("type", "id", "lat", "lon", "tags").collect()))
    assert a == b


def test_round_trip_generated_elements(spark, tmp_path):
    """300 mixed generated elements -> pbf -> read back: ids, tags,
    refs, members and 1e-7-granularity coords survive."""
    src = generate_elements(spark)
    els = []
    for r in src.collect():
        e = {"type": r["type"], "id": r["id"], "tags": dict(r["tags"])}
        if r["type"] == "node":
            e["lat"], e["lon"] = r["lat"], r["lon"]
        elif r["type"] == "way":
            e["nodes"] = list(r["nodes"])
        else:
            e["members"] = [
                {"type": m["type"] or "node", "ref": m["ref"],
                 "role": m["role"] or ""}
                for m in r["members"]
            ]
        els.append(e)
    p = str(tmp_path / "gen.osm.pbf")
    encode_pbf(p, els, block_size=64)
    back = read_pbf(spark, p, parallelism=4)
    assert back.count() == len(els)
    got = {(r["type"], r["id"]): r for r in back.collect()}
    for e in els:
        r = got[(e["type"], e["id"])]
        assert r["tags"] == e["tags"]
        if e["type"] == "node":
            assert abs(r["lat"] - e["lat"]) < 1e-7
            assert abs(r["lon"] - e["lon"]) < 1e-7
        elif e["type"] == "way":
            assert r["nodes"] == e["nodes"]
        else:
            assert [(m["type"], m["ref"], m["role"]) for m in r["members"]] == [
                (m["type"], m["ref"], m["role"]) for m in e["members"]]


def test_decode_block_direct(pbf_path):
    """decode_primitive_block is usable standalone (no Spark)."""
    import zlib

    from skyway_spark.sources.pbf import _blob_raw

    idx = [e for e in scan_blob_index(pbf_path) if e[3] == "OSMData"]
    rows = []
    with open(pbf_path, "rb") as f:
        for _, off, size, _ in idx:
            f.seek(off)
            rows.extend(decode_primitive_block(_blob_raw(f.read(size))))
    assert len(rows) == len(ELS)
