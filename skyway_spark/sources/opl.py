"""OPL reader/writer.

Serialization rules re-derived from the reference:
- writer field order ``[nwr]<id> [v..] [dV|dD] [c..] [t..] [i..]
  [u..] T<tags> (x<lon> y<lat> | N.. | M..)`` with '' T'' ALWAYS
  present even for zero tags (src/writers/opl.rs:62-168, '' T'' at
  :111);
- node coords written lon (``x``) before lat (``y``)
  (src/writers/opl.rs:124-129);
- the Osmium escape set (src/writers/opl.rs:23-34): everything
  outside the allowed code-point ranges is ``%hex%`` (lowercase);
- reader unescape: ``%hex%`` -> chr, invalid hex silently dropped
  (src/readers/opl.rs:67-91).

Spark-first layout: the line is assembled with Column expressions
(concat / when / transform over the nodes array), so the bulk of the
serializer is JVM-side codegen. Python only runs inside three
vectorized Arrow pandas UDFs: string escaping (user/tags/member
roles), float shortest-repr formatting, and their inverses in the
reader. Tag order is canonicalized to sorted-by-key — the reference's
HashMap order is nondeterministic (SURVEY §7.5), so goldens are
canonical.

One divergence by design: canonical ordering + clean errors instead
of panics on malformed lines (src/readers/opl.rs:112,204).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from skyway_spark.schema import MEMBER_SCHEMA

# ---------------------------------------------------------------------------
# escape / unescape (plain-Python core, reused inside the pandas UDFs)
# ---------------------------------------------------------------------------

# allowed (non-escaped) code-point ranges, from src/writers/opl.rs:22-34
_ALLOWED_RANGES = (
    (0x21, 0x24),
    (0x26, 0x2B),
    (0x2D, 0x3C),
    (0x3E, 0x3F),
    (0x41, 0x7E),
    (0xA1, 0xAC),
    (0xAE, 0x5FF),
)


def should_escape_char(c: str) -> bool:
    cp = ord(c)
    return not any(lo <= cp <= hi for lo, hi in _ALLOWED_RANGES)


# regex matching every char that must be escaped (complement of the ranges)
_ESCAPE_RE = re.compile(
    "[^" + "".join(f"\\u{lo:04x}-\\u{hi:04x}" for lo, hi in _ALLOWED_RANGES) + "]"
)
_UNESCAPE_RE = re.compile("%([0-9a-fA-F]*)%")


def escape_opl(s: str) -> str:
    """Escape per the Osmium list: disallowed char -> %<lowercase hex>%."""
    return _ESCAPE_RE.sub(lambda m: f"%{ord(m.group(0)):x}%", s)


def unescape_opl(s: str) -> str:
    """%hex% -> chr; empty/invalid hex silently dropped
    (src/readers/opl.rs:75-85 'if let Ok')."""

    def repl(m: re.Match) -> str:
        h = m.group(1)
        if not h:
            return ""
        cp = int(h, 16)
        try:
            return chr(cp)
        except ValueError:
            return ""

    return _UNESCAPE_RE.sub(repl, s)


# ---------------------------------------------------------------------------
# vectorized Arrow UDFs (the ONLY Python at the Spark boundary)
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def _escape_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: escape_opl(v) if v is not None else None)


@F.pandas_udf(StringType())
def _unescape_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: unescape_opl(v) if v is not None else None)


@F.pandas_udf(StringType())
def _repr_double_udf(s: pd.Series) -> pd.Series:
    # lexical::to_string == shortest round-trip repr == Python repr
    return s.map(lambda v: repr(float(v)) if v is not None and v == v else None)


@F.pandas_udf(StringType())
def _tags_to_opl_udf(entries: pd.Series) -> pd.Series:
    """array<struct<key,value>> (pre-sorted) -> 'k=v,k=v' escaped."""

    def ser(lst):
        if lst is None:
            return ""
        return ",".join(
            f"{escape_opl(e['key'])}={escape_opl(e['value'])}" for e in lst
        )

    return entries.map(ser)


@F.pandas_udf(StringType())
def _members_to_opl_udf(members: pd.Series) -> pd.Series:
    """array<struct<type,ref,role>> -> '[nwr]<id>@<role>,...'.
    Member type None panics in the reference (opl.rs:147) — here it is
    a clean error; role None emits nothing after '@' (opl.rs:158-162 TODO)."""
    tc = {"node": "n", "way": "w", "relation": "r"}

    def ser(lst):
        if lst is None:
            return None
        parts = []
        for m in lst:
            t = tc.get(m["type"])
            if t is None:
                raise ValueError(f"member type missing/unknown: {m['type']!r}")
            role = m["role"]
            parts.append(f"{t}{m['ref']}@{escape_opl(role) if role else ''}")
        return ",".join(parts)

    return members.map(ser)


@F.pandas_udf(MapType(StringType(), StringType(), False))
def _opl_tags_parse_udf(s: pd.Series) -> pd.Series:
    """'k=v,k=v' -> map (split_once('=') per entry, unescaped;
    entries without '=' are skipped — src/readers/opl.rs:128-133)."""

    def parse(v):
        if v is None or v == "":
            return {}
        out = {}
        for entry in v.split(","):
            if "=" not in entry:
                continue
            k, val = entry.split("=", 1)
            out[unescape_opl(k)] = unescape_opl(val)
        return out

    return s.map(parse)


@F.pandas_udf(ArrayType(MEMBER_SCHEMA, False))
def _opl_members_parse_udf(s: pd.Series) -> pd.Series:
    tc = {"n": "node", "w": "way", "r": "relation"}

    def parse(v):
        if v is None:
            return None
        out = []
        for entry in v.split(","):
            if "@" not in entry:
                continue
            ref_part, role = entry.split("@", 1)
            t = tc.get(ref_part[:1])
            if t is None:
                continue  # reference filter_maps unknown types away
            try:
                ref = int(ref_part[1:])
            except ValueError:
                # Non-numeric ref ('Mn@r', 'Mnx@r'): the whole M field is
                # unparseable.  Python UDFs are evaluated eagerly regardless
                # of surrounding F.when guards, so raising here would abort
                # the job even in PERMISSIVE mode — return null instead and
                # let parse_opl_lines' `bad` predicate quarantine the line.
                return None
            out.append({"type": t, "ref": ref, "role": unescape_opl(role)})
        return out

    return s.map(parse)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _opt(prefix: str, col: Column) -> Column:
    """`` <prefix><value>`` when non-null else '' (field optionality,
    src/writers/opl.rs:78-109)."""
    return F.when(col.isNotNull(), F.concat(F.lit(" " + prefix), col.cast("string"))).otherwise(
        F.lit("")
    )


def opl_line(df: DataFrame) -> Column:
    """Column expr producing the full OPL line for an elements row."""
    type_char = (
        F.when(F.col("type") == "node", "n")
        .when(F.col("type") == "way", "w")
        .otherwise("r")
    )
    visible = (
        F.when(F.col("visible") == True, F.lit(" dV"))  # noqa: E712
        .when(F.col("visible") == False, F.lit(" dD"))  # noqa: E712
        .otherwise(F.lit(""))
    )
    # tags sorted by key for canonical output (HashMap order is
    # nondeterministic in the reference — SURVEY §7.5)
    tags_str = F.concat(
        F.lit(" T"), _tags_to_opl_udf(F.array_sort(F.map_entries(F.col("tags"))))
    )
    node_xy = F.concat(
        F.lit(" x"),
        _repr_double_udf(F.col("lon")),
        F.lit(" y"),
        _repr_double_udf(F.col("lat")),
    )
    way_nodes = F.concat(
        F.lit(" N"),
        F.array_join(F.transform(F.col("nodes"), lambda n: F.concat(F.lit("n"), n.cast("string"))), ","),
    )
    rel_members = F.concat(F.lit(" M"), _members_to_opl_udf(F.col("members")))
    payload = (
        F.when(F.col("type") == "node", node_xy)
        .when(F.col("type") == "way", way_nodes)
        .otherwise(rel_members)
    )
    return F.concat(
        type_char,
        F.col("id").cast("string"),
        _opt("v", F.col("version")),
        visible,
        _opt("c", F.col("changeset")),
        _opt("t", F.col("timestamp")),
        _opt("i", F.col("uid")),
        F.when(
            F.col("user").isNotNull(), F.concat(F.lit(" u"), _escape_udf(F.col("user")))
        ).otherwise(F.lit("")),
        tags_str,
        payload,
    )


def _type_rank():
    return F.when(F.col("type") == "node", 0).when(F.col("type") == "way", 1).otherwise(2)


def serialize_opl(df: DataFrame) -> DataFrame:
    """elements df -> single-column 'value' df of OPL lines in
    canonical (type, id) order."""
    return df.orderBy(_type_rank(), F.col("id")).select(opl_line(df).alias("value"))


def write_opl(df: DataFrame, path: str) -> None:
    """Distributed text write (one file per partition; canonical order
    within partitions by range partitioning of the sort)."""
    serialize_opl(df).write.mode("overwrite").text(path)


def serialize_opl_string(df: DataFrame) -> str:
    """Driver-side full document (golden fixtures only)."""
    return "".join(r["value"] + "\n" for r in serialize_opl(df).collect())


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _field(fields: Column, prefix: str) -> Column:
    """Value of the first space-separated token starting with
    ``prefix`` (tokens are unambiguous because values are escaped)."""
    tok = F.get(F.filter(fields, lambda x: x.startswith(prefix)), 0)
    return F.substring(tok, len(prefix) + 1, 1 << 20)


def parse_opl_lines(
    lines: DataFrame, column: str = "value", corrupt_col: str | None = None
) -> DataFrame:
    """DataFrame of raw OPL lines -> elements DataFrame.

    Scalar fields are extracted with pure Column ops over the token
    array; only tags/members/user go through Arrow UDFs for
    unescaping (src/readers/opl.rs:93-207 semantics).

    The reference PANICS on malformed lines (src/readers/opl.rs:112,
    204); we diverge by design (SURVEY §7.5): with ``corrupt_col``
    set, unparseable lines (bad type char / non-numeric id / malformed
    member ref) surface PERMISSIVE-style — null element fields plus
    the raw line in the corrupt column — so one bad row in 100 TB is
    quarantined, not a job abort.  Without ``corrupt_col`` a malformed
    member list yields null ``members`` (never an exception: Python
    UDFs evaluate eagerly, so a raise could not be guarded anyway).
    """
    fields = F.split(F.col(column), " ")
    head = F.element_at(fields, 1)
    tchar = F.substring(head, 1, 1)
    etype = (
        F.when(tchar == "n", "node").when(tchar == "w", "way").when(tchar == "r", "relation")
    )
    d_field = _field(fields, "d")
    nodes_raw = _field(fields, "N")
    cols = [
        ("type", etype),
        ("id", F.substring(head, 2, 1 << 20).try_cast("long")),
        ("lat", _field(fields, "y").try_cast("double")),
        ("lon", _field(fields, "x").try_cast("double")),
        (
            "nodes",
            # empty N field (a way with zero nodes) must read back []:
            # split('', ',') yields [''] whose ref parses to null, so the
            # writer->reader round trip would otherwise invent [null]
            # (r5 serialization fuzz finding)
            F.when(nodes_raw == "", F.array().cast("array<long>")).when(
                nodes_raw.isNotNull(),
                F.transform(
                    F.split(nodes_raw, ","),
                    lambda t: F.substring(t, 2, 1 << 20).try_cast("long"),
                ),
            ),
        ),
        ("members", _opl_members_parse_udf(_field(fields, "M"))),
        (
            "tags",
            F.coalesce(
                _opl_tags_parse_udf(_field(fields, "T")),
                F.from_json(F.lit("{}"), "map<string,string>"),
            ),
        ),
        ("changeset", _field(fields, "c").try_cast("long")),
        ("uid", _field(fields, "i").try_cast("int")),
        ("user", _unescape_udf(_field(fields, "u"))),
        ("version", _field(fields, "v").try_cast("int")),
        ("timestamp", _field(fields, "t")),
        ("visible", F.when(d_field == "V", True).when(d_field == "D", False)),
    ]
    if corrupt_col is None:
        return lines.select(*[c.alias(n) for n, c in cols])
    m_raw = _field(fields, "M")
    # member-parse failure flagged with PURE Column ops (mirrors the
    # udf's return-None condition: an '@' entry with a known type char
    # whose ref is non-numeric) — re-invoking the pandas UDF here would
    # pay a second Arrow round-trip per relation row
    bad_member = F.exists(
        F.split(m_raw, ","),
        lambda e: e.contains("@")
        & F.substring(F.substring_index(e, "@", 1), 1, 1).isin("n", "w", "r")
        & F.substring(F.substring_index(e, "@", 1), 2, 1 << 20)
        .try_cast("long")
        .isNull(),
    )
    bad = (
        etype.isNull()
        | F.substring(head, 2, 1 << 20).try_cast("long").isNull()
        | (m_raw.isNotNull() & bad_member)
    )
    return lines.select(
        *[F.when(~bad, c).alias(n) for n, c in cols],
        F.when(bad, F.col(column)).alias(corrupt_col),
    )


def read_opl(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """OPL file(s) -> (elements df, empty metadata) — OPL carries no
    document metadata (src/readers/opl.rs:215-221)."""
    from skyway_spark.schema import empty_metadata

    lines = spark.read.text(path)
    return parse_opl_lines(lines), empty_metadata()


# ---------------------------------------------------------------------------
# pure-Python line parser (Python DataSource path)
# ---------------------------------------------------------------------------

_TYPE_OF_CHAR = {"n": "node", "w": "way", "r": "relation"}
_MEMBER_TYPE_OF = {"n": "node", "w": "way", "r": "relation"}


def parse_opl_line_py(line: str) -> tuple:
    """One OPL line -> elements-schema tuple, mirroring parse_opl_lines'
    Column semantics field for field (null on unparseable pieces, {} for
    missing tags, member-list None when any ref fails to parse). Used by
    the spark.read.format('opl') Python DataSource, whose worker has no
    Column engine; equality with the Column path is pinned by a
    differential test in tests/test_converters.py."""
    fields = line.split(" ")
    head = fields[0] if fields else ""

    def field(prefix: str) -> str | None:
        for tok in fields:
            if tok.startswith(prefix):
                return tok[len(prefix):]
        return None

    def as_int(v):
        try:
            return int(v) if v is not None else None
        except ValueError:
            return None

    def as_float(v):
        try:
            return float(v) if v is not None else None
        except ValueError:
            return None

    etype = _TYPE_OF_CHAR.get(head[:1])
    eid = as_int(head[1:] or None)
    nodes_raw = field("N")
    nodes = (
        [as_int(t[1:] or None) for t in nodes_raw.split(",")]
        if nodes_raw is not None
        else None
    )
    members_raw = field("M")
    members = None
    if members_raw is not None:
        members = []
        for entry in members_raw.split(","):
            if "@" not in entry:
                continue
            ref_part, role = entry.split("@", 1)
            t = _MEMBER_TYPE_OF.get(ref_part[:1])
            if t is None:
                continue
            ref = as_int(ref_part[1:] or None)
            if ref is None:
                members = None  # whole field unparseable (udf parity)
                break
            members.append((t, ref, unescape_opl(role)))
    tags_raw = field("T")
    tags = {}
    if tags_raw:
        for entry in tags_raw.split(","):
            if "=" not in entry:
                continue
            k, v = entry.split("=", 1)
            tags[unescape_opl(k)] = unescape_opl(v)
    d_field = field("d")
    user = field("u")
    return (
        etype,
        eid,
        as_float(field("y")),
        as_float(field("x")),
        nodes,
        members,
        tags,
        as_int(field("c")),
        as_int(field("i")),
        unescape_opl(user) if user is not None else None,
        as_int(field("v")),
        field("t"),
        True if d_field == "V" else False if d_field == "D" else None,
    )
