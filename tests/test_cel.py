"""CEL subset compiler tests (fixtures from FIXTURES.md §4.3 and
docs/src/cel-filters.md)."""

from __future__ import annotations

import pytest

from skyway_spark.functions.filter import apply_cel, create_filter
from skyway_spark.functions.filter.cel import CelCompileError, compile_cel


@pytest.fixture(scope="module")
def elements(spark):
    rows = [
        # type, id, tags, changeset, uid, user, timestamp, visible
        ("node", 1, {"amenity": "cafe"}, 10, 42, "alice", "2024-01-01T00:00:00Z", True),
        ("node", 2, {"highway": "tertiary"}, 11, 7, "bob", None, True),
        ("way", 1500, {"highway": "tertiary"}, 12, 42, None, None, False),
        ("way", 2000, {}, None, None, None, None, None),
        ("relation", 3000, {"type": "route"}, 13, 9, "carol", None, True),
    ]
    return spark.createDataFrame(
        rows,
        "type string, id long, tags map<string,string>, changeset long, "
        "uid int, user string, timestamp string, visible boolean",
    )


CASES = [
    ('type == "node" && "amenity" in tags', {("node", 1)}),
    ('tags["highway"] == "tertiary" || uid == 42', {("node", 1), ("node", 2), ("way", 1500)}),
    ("visible && id > 1000", {("relation", 3000)}),
    # error path: missing key -> null -> dropped (cel/mod.rs:51-54)
    ('tags["x"] == "1"', set()),
    ('has(tags.amenity)', {("node", 1)}),
    ('type in ["way", "relation"]', {("way", 1500), ("way", 2000), ("relation", 3000)}),
    ('size(tags) == 0', {("way", 2000)}),
    ('user.startsWith("a")', {("node", 1)}),
    ('tags["highway"].contains("tert") && type == "way"', {("way", 1500)}),
    ("!visible", {("way", 1500)}),
    ('type == "node" ? uid == 42 : id >= 3000', {("node", 1), ("relation", 3000)}),
    ("id % 2 == 0 && id > 0", {("node", 2), ("way", 1500), ("way", 2000), ("relation", 3000)}),
    ('timestamp.matches("^2024")', {("node", 1)}),
]


@pytest.mark.parametrize("expr,want", CASES, ids=[c[0][:40] for c in CASES])
def test_cel_cases(spark, elements, expr, want):
    out = apply_cel(elements, expr).select("type", "id").collect()
    assert {(r["type"], r["id"]) for r in out} == want


def test_cel_non_boolean_rejected():
    with pytest.raises(CelCompileError):
        compile_cel('tags["amenity"]')
    with pytest.raises(CelCompileError):
        compile_cel("id + 1")


def test_autodetect(spark, elements):
    osm = create_filter("OSMFilter v0.2.0\n\nTYPE node\n\tCOMMIT\nDROP\n")
    assert osm.apply(elements).count() == 2
    cel = create_filter('type == "node"')
    assert cel.apply(elements).count() == 2
    with pytest.raises(ValueError):
        create_filter("not ]] a filter ((")


CEL_ERROR_SEMANTICS_CASES = [
    # CEL's logical operators are commutative over errors (cel-spec
    # "logical operators" + absorbing elements): <error> || true ==
    # true, <error> && false == false — exactly SQL three-valued
    # logic, so the Column compilation preserves observable behavior.
    ('tags["missing"] == "v" || type == "node"', {("node", 1), ("node", 2)}),
    ('tags["missing"] == "v" && type == "node"', set()),
    # unrecoverable error path: negation of an error is still an
    # error -> element dropped (cel/mod.rs:51-54 drop-with-warning)
    ('!(tags["missing"] == "v")', set()),
    # ternary with error in the untaken branch is fine (lazy)
    ('type == "node" ? id < 10 : tags["missing"].contains("x")',
     {("node", 1), ("node", 2)}),
]


@pytest.mark.parametrize(
    "expr,want", CEL_ERROR_SEMANTICS_CASES,
    ids=[c[0][:40] for c in CEL_ERROR_SEMANTICS_CASES],
)
def test_cel_error_absorption(spark, elements, expr, want):
    got = {(r["type"], r["id"]) for r in apply_cel(elements, expr).collect()}
    assert got == want
