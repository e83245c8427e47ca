"""Canonical schemas.

``ELEMENTS_SCHEMA`` mirrors the reference's Element union
(src/elements.rs:23-41) flattened into one DataFrame: a ``type``
discriminator plus per-variant nullable payload columns. ``timestamp``
stays a *string* for fidelity — the reference never parses it
(src/elements.rs:37).

``PAGES_SCHEMA`` is the north-rule input table of Common-Crawl-style
web pages (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        # src/elements.rs:15-19 — `t` serialized as "type", `id` as "ref"
        T.StructField("type", T.StringType(), True),
        T.StructField("ref", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

ELEMENTS_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), False),  # node|way|relation
        T.StructField("id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), True),  # node only
        T.StructField("lon", T.DoubleType(), True),  # node only
        T.StructField("nodes", T.ArrayType(T.LongType(), False), True),  # way only
        T.StructField("members", T.ArrayType(MEMBER_SCHEMA, False), True),  # relation
        T.StructField("tags", T.MapType(T.StringType(), T.StringType(), False), False),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("uid", T.IntegerType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("version", T.IntegerType(), True),
        T.StructField("timestamp", T.StringType(), True),  # opaque string
        T.StructField("visible", T.BooleanType(), True),
    ]
)

# Document-level metadata (src/elements.rs:45-51): one dict threaded
# into writer headers; not a distributed table.
METADATA_FIELDS = ("version", "generator", "copyright", "license", "timestamp")

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

POLYGONS_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        # closed ring, lat/lon pairs; ring_role outer|hole
        T.StructField(
            "ring",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lat", T.DoubleType(), False),
                        T.StructField("lon", T.DoubleType(), False),
                    ]
                ),
                False,
            ),
            False,
        ),
        T.StructField("ring_role", T.StringType(), False),
    ]
)


def empty_metadata() -> dict:
    return {k: None for k in METADATA_FIELDS}
