"""OSMFilter parser + compiler vs a tiny reference interpreter.

The interpreter here is a direct Python transcription of the
reference's evaluate() semantics (src/filter/osmfilter/logic.rs) and
serves as the per-row oracle; the compiled Column cascade must agree
on every element for keep/drop AND final mutated tags.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skyway_spark.functions.filter import apply_filters, parse_osmfilter
from skyway_spark.functions.filter.ast import (
    Commit,
    Delete,
    Drop,
    EqualsSelector,
    HasSelector,
    Keep,
    Rename,
    SelectionBlock,
    Set,
    TypeSelector,
)
from skyway_spark.functions.filter.osmfilter_compile import compile_osmfilter
from skyway_spark.functions.filter.osmfilter_parser import OsmFilterParseError

DOC_EXAMPLE = (
    "OSMFilter v0.2.0\n"
    "\n"
    "TYPE way                # selects ways\n"
    '\tHAS "footway"\n'
    '\t\tSET "surface" "concrete"\n'
    "\t\tCOMMIT\n"
    "TYPE relation\n"
    '\tEQUALS "type" "route"\n'
    "\t\tDROP\n"
    "COMMIT\n"
)


# ---------------- oracle: direct transcription of logic.rs ----------------

CONTINUE, OCOMMIT, ODROP = 0, 1, 2


def _test_selector(sel, etype, tags):
    if isinstance(sel, TypeSelector):
        return {"node": sel.node, "way": sel.way, "relation": sel.relation}[etype]
    if isinstance(sel, HasSelector):
        return sel.key in tags
    if isinstance(sel, EqualsSelector):
        return tags.get(sel.key) == sel.value
    raise TypeError


def _eval_stmt(stmt, etype, tags):
    if isinstance(stmt, Commit):
        return OCOMMIT
    if isinstance(stmt, Drop):
        return ODROP
    if isinstance(stmt, Delete):
        for k in stmt.keys:
            tags.pop(k, None)
        return CONTINUE
    if isinstance(stmt, Keep):
        for k in list(tags):
            if k not in stmt.keys:
                del tags[k]
        return CONTINUE
    if isinstance(stmt, Set):
        tags[stmt.key] = stmt.value
        return CONTINUE
    if isinstance(stmt, Rename):
        if stmt.old_key in tags:
            tags[stmt.new_key] = tags.pop(stmt.old_key)
        return CONTINUE
    if isinstance(stmt, SelectionBlock):
        if _test_selector(stmt.selector, etype, tags):
            for sub in stmt.statements:
                r = _eval_stmt(sub, etype, tags)
                if r != CONTINUE:
                    return r
        return CONTINUE
    raise TypeError


def oracle(program, etype, tags):
    tags = dict(tags)
    for stmt in program.statements:
        r = _eval_stmt(stmt, etype, tags)
        if r == OCOMMIT:
            return True, tags
        if r == ODROP:
            return False, tags
    return True, tags


# ---------------- fixture elements ----------------


def make_elements(spark):
    rows = []
    tag_sets = [
        {},
        {"footway": "sidewalk"},
        {"footway": "sidewalk", "surface": "dirt"},
        {"type": "route", "name": "bus 12"},
        {"highway": "tertiary", "name": "Main St"},
        {"amenity": "cafe", "name": "Joe's", "surface": "wood"},
        {"surface": "concrete"},
        {"name": "x", "amenity": "bar", "footway": "crossing"},
    ]
    i = 0
    for etype in ("node", "way", "relation"):
        for tags in tag_sets:
            rows.append((etype, i, dict(tags)))
            i += 1
    df = spark.createDataFrame(rows, "type string, id long, tags map<string,string>")
    return df, rows


PROGRAMS = {
    "doc_example": DOC_EXAMPLE,
    "keep_only": 'OSMFilter v0.2.0\n\nKEEP "name", "amenity"\n',
    "delete": 'OSMFilter v0.2.0\n\nDELETE "surface"\n',
    "rename": 'OSMFilter v0.2.0\n\nRENAME "name" "label"\n',
    "equals_missing_key": 'OSMFilter v0.2.0\n\nEQUALS "nonexistent" "x"\n\tDROP\n',
    "nested_commit": (
        "OSMFilter v0.2.0\n"
        "\n"
        "TYPE way, node\n"
        '\tHAS "footway"\n'
        '\t\tEQUALS "footway" "sidewalk"\n'
        '\t\t\tSET "checked" "yes"\n'
        "\t\t\tCOMMIT\n"
        '\tSET "no_sidewalk" "true"\n'
        "DROP\n"
    ),
    "default_commit": 'OSMFilter v0.2.0\n\nSET "seen" "1"\n',
    "drop_all_relations": 'OSMFilter v0.2.0\n\nTYPE relation\n\tDROP\n',
    "set_then_match": (
        "OSMFilter v0.2.0\n"
        "\n"
        "TYPE node\n"
        '\tSET "promoted" "yes"\n'
        'EQUALS "promoted" "yes"\n'
        '\tSET "matched_after_set" "yes"\n'
    ),
}


@pytest.mark.parametrize("name", list(PROGRAMS))
def test_compiled_matches_oracle(spark, name):
    text = PROGRAMS[name]
    program = parse_osmfilter(text)
    df, rows = make_elements(spark)
    out = compile_osmfilter(program).apply(df).orderBy("id").collect()
    got = {r["id"]: dict(r["tags"]) for r in out}
    for etype, i, tags in rows:
        keep, want_tags = oracle(program, etype, tags)
        if keep:
            assert i in got, f"{name}: id {i} wrongly dropped"
            assert got[i] == want_tags, f"{name}: id {i} tags {got[i]} != {want_tags}"
        else:
            assert i not in got, f"{name}: id {i} wrongly kept"


def test_sequential_chain_sees_mutations(spark):
    """Filter 2 matches a tag SET by filter 1 (src/main.rs:162-171)."""
    df, rows = make_elements(spark)
    f1 = 'OSMFilter v0.2.0\n\nTYPE node\n\tSET "stage1" "done"\n'
    f2 = 'OSMFilter v0.2.0\n\nEQUALS "stage1" "done"\n\tCOMMIT\nDROP\n'
    out = apply_filters(df, [f1, f2]).collect()
    assert all(r["type"] == "node" for r in out)
    assert len(out) == sum(1 for t, _, _ in rows if t == "node")


def test_parse_doc_example_shape():
    p = parse_osmfilter(DOC_EXAMPLE)
    assert len(p.statements) == 3
    b0 = p.statements[0]
    assert isinstance(b0, SelectionBlock) and isinstance(b0.selector, TypeSelector)
    assert b0.selector.way and not b0.selector.node
    inner = b0.statements[0]
    assert isinstance(inner.selector, HasSelector) and inner.selector.key == "footway"
    assert isinstance(inner.statements[0], Set)
    assert isinstance(inner.statements[1], Commit)
    assert isinstance(p.statements[2], Commit)


def test_parse_errors():
    with pytest.raises(OsmFilterParseError):
        parse_osmfilter("no header\n\nCOMMIT\n")
    with pytest.raises(OsmFilterParseError):
        parse_osmfilter("OSMFilter v0.2.0\nCOMMIT\n")  # missing blank line
    with pytest.raises(OsmFilterParseError):
        parse_osmfilter("OSMFilter v0.2.0\n\nTYPE way\n")  # empty block
    with pytest.raises(OsmFilterParseError):
        parse_osmfilter('OSMFilter v0.2.0\n\nFROB "x"\n')


def test_version_mismatch_warns():
    with pytest.warns(UserWarning):
        parse_osmfilter("OSMFilter v9.9.9\n\nCOMMIT\n")


def test_string_escapes():
    p = parse_osmfilter('OSMFilter v0.2.0\n\nSET "a\\"b" "c\\u0041d"\n')
    s = p.statements[0]
    assert s.key == 'a"b'
    assert s.value == "cAd"


def test_random_programs_match_oracle(spark):
    """30 randomized programs (all statement kinds, nesting to depth
    2, arbitrary COMMIT/DROP placement) — compiled cascade must agree
    with the logic.rs transcription on keep/drop AND mutated tags for
    every element."""
    import random

    from skyway_spark.functions.filter.ast import OsmFilterProgram

    rnd = random.Random(20260817)
    KEYS = ["footway", "surface", "name", "amenity", "type"]
    VALS = ["sidewalk", "dirt", "x", "cafe", "route"]

    def rand_selector():
        c = rnd.randrange(3)
        if c == 0:
            flags = [rnd.random() < 0.5 for _ in range(3)]
            if not any(flags):
                flags[rnd.randrange(3)] = True
            return TypeSelector(*flags)
        if c == 1:
            return HasSelector(rnd.choice(KEYS))
        return EqualsSelector(rnd.choice(KEYS), rnd.choice(VALS))

    def rand_statements(depth, n):
        out = []
        for _ in range(n):
            c = rnd.randrange(10)
            if c <= 2 and depth < 2:
                out.append(
                    SelectionBlock(
                        rand_selector(), rand_statements(depth + 1, rnd.randint(1, 3))
                    )
                )
            elif c == 3:
                out.append(Commit())
            elif c == 4:
                out.append(Drop())
            elif c == 5:
                out.append(Delete(tuple(rnd.sample(KEYS, rnd.randint(1, 2)))))
            elif c == 6:
                out.append(Keep(tuple(rnd.sample(KEYS, rnd.randint(1, 2)))))
            elif c == 7:
                out.append(Rename(rnd.choice(KEYS), rnd.choice(KEYS)))
            else:
                out.append(Set(rnd.choice(KEYS), rnd.choice(VALS)))
        return out

    df, rows = make_elements(spark)
    for trial in range(30):
        prog = OsmFilterProgram("0.2.0", rand_statements(0, rnd.randint(1, 5)))
        out = compile_osmfilter(prog).apply(df).collect()
        got = {r["id"]: dict(r["tags"]) for r in out}
        for etype, i, tags in rows:
            keep, want = oracle(prog, etype, tags)
            assert (i in got) == keep, f"trial {trial}: id {i} keep mismatch"
            if keep:
                assert got[i] == want, f"trial {trial}: id {i} tags mismatch"


# ----------------- grammar edge cases (osmfilter.pest parity) -----------------


def test_timestamp_selectors_rejected_like_reference():
    """The pest grammar has NO timestamp/since/before/user/uid/id/version
    selectors — they are a TODO (osmfilter.pest:44). A program using them
    must fail to parse here exactly as it fails in the reference."""
    for selector in (
        'SINCE "2024-01-01"',
        'BEFORE "2024-01-01"',
        'TIMESTAMP "2024-01-01"',
        'USER "alice"',
        'UID "42"',
        'VERSION "3"',
    ):
        with pytest.raises(OsmFilterParseError):
            parse_osmfilter(f"OSMFilter v0.2.0\n\n{selector}\n\tCOMMIT\n")


def test_comment_placement_variants():
    """osmfilter.pest comment rules: '#' runs to end of line; comments may
    trail a selector (before its block), trail a modifier, or stand alone
    as a statement — and '#' INSIDE a quoted string is not a comment."""
    p = parse_osmfilter(
        "OSMFilter v0.2.0\n"
        "\n"
        "# leading standalone comment\n"
        "TYPE node  # trailing selector comment\n"
        "\t# standalone comment inside a block\n"
        '\tSET "note" "a#b"  # hash inside string survives\n'
        "COMMIT # trailing modifier comment\n"
    )
    assert len(p.statements) == 2
    block = p.statements[0]
    assert isinstance(block.selector, TypeSelector) and block.selector.node
    (set_stmt,) = block.statements
    assert isinstance(set_stmt, Set)
    assert set_stmt.value == "a#b"  # not truncated at '#'
    assert isinstance(p.statements[1], Commit)


def test_comment_only_body_rejected():
    """A body with only comments/blank lines has no statements — the pest
    body rule needs at least one statement; match the failure."""
    with pytest.raises(OsmFilterParseError):
        parse_osmfilter("OSMFilter v0.2.0\n\n# nothing else\n")


def test_header_version_optional_v_and_mismatch_warning():
    """header = 'OSMFilter ' ~ 'v'? ~ version ~ NEWLINE{2}: the 'v' is
    optional; a non-current version parses with a warning, never an error
    (parse.rs:123-127)."""
    import warnings as _w

    p = parse_osmfilter("OSMFilter 0.2.0\n\nCOMMIT\n")
    assert isinstance(p.statements[0], Commit)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        parse_osmfilter("OSMFilter v9.9.9\n\nCOMMIT\n")
    assert any("version" in str(r.message).lower() for r in rec)
