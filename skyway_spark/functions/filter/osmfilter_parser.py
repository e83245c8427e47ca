"""Recursive-descent parser for the OSMFilter DSL.

Grammar reimplemented from the reference's pest grammar
(src/filter/osmfilter/osmfilter.pest) and docs (docs/src/osmfilter.md):

  header: ``OSMFilter v?MAJOR.MINOR.PATCH`` followed by >= 2 newlines
  (version mismatch warns, never errors — parse.rs:123-127);
  statements are selectors (TYPE / HAS / EQUALS) each followed by a
  tab-indented block, or modifiers (COMMIT DROP SET RENAME KEEP
  DELETE); ``#`` comments run to end of line; string literals are
  double-quoted with JSON-style escapes (osmfilter.pest:1-9).
"""

from __future__ import annotations

import re
import warnings

from skyway_spark.functions.filter.ast import (
    Commit,
    Delete,
    Drop,
    EqualsSelector,
    HasSelector,
    Keep,
    OsmFilterProgram,
    Rename,
    SelectionBlock,
    Set,
    TypeSelector,
)

ENGINE_FILTER_VERSION = "0.2.0"

_HEADER_RE = re.compile(r"^OSMFilter v?(\d+\.\d+\.\d+)\s*$")
_ESCAPES = {'"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t"}


class OsmFilterParseError(ValueError):
    pass


def _parse_string(line: str, pos: int) -> tuple[str, int]:
    """Parse a double-quoted string starting at line[pos]; returns
    (value, index just past the closing quote)."""
    if pos >= len(line) or line[pos] != '"':
        raise OsmFilterParseError(f"expected string literal at col {pos}: {line!r}")
    out = []
    i = pos + 1
    while i < len(line):
        c = line[i]
        if c == '"':
            return "".join(out), i + 1
        if c == "\\":
            if i + 1 >= len(line):
                raise OsmFilterParseError(f"dangling escape in {line!r}")
            nxt = line[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u":
                hex4 = line[i + 2 : i + 6]
                if len(hex4) != 4 or not re.fullmatch(r"[0-9a-fA-F]{4}", hex4):
                    raise OsmFilterParseError(f"bad \\u escape in {line!r}")
                out.append(chr(int(hex4, 16)))
                i += 6
                continue
            raise OsmFilterParseError(f"bad escape \\{nxt} in {line!r}")
        out.append(c)
        i += 1
    raise OsmFilterParseError(f"unterminated string in {line!r}")


def _parse_string_list(line: str, pos: int) -> tuple[tuple[str, ...], int]:
    """``"a", "b", "c"`` — comma-space separated quoted strings."""
    values = []
    v, pos = _parse_string(line, pos)
    values.append(v)
    while line.startswith(", ", pos):
        v, pos = _parse_string(line, pos + 2)
        values.append(v)
    return tuple(values), pos


def _strip_comment(line: str) -> str:
    """Remove a trailing ``#`` comment (never inside a string literal)."""
    out = []
    in_str = False
    i = 0
    while i < len(line):
        c = line[i]
        if in_str:
            if c == "\\" and i + 1 < len(line):
                out.append(c)
                out.append(line[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
        else:
            if c == '"':
                in_str = True
            elif c == "#":
                break
        out.append(c)
        i += 1
    return "".join(out).rstrip()


def _expect_end(line: str, pos: int) -> None:
    if line[pos:].strip():
        raise OsmFilterParseError(f"unexpected trailing content: {line[pos:]!r}")


_TYPES = ("node", "way", "relation")


def _parse_statement_line(line: str):
    """One statement (modifier or selector head). Selector returns a
    SelectionBlock with empty body to be filled by the block walker."""
    if line == "COMMIT":
        return Commit()
    if line == "DROP":
        return Drop()
    if line.startswith("SET "):
        k, pos = _parse_string(line, 4)
        if not line.startswith(" ", pos):
            raise OsmFilterParseError(f"SET needs two strings: {line!r}")
        v, pos = _parse_string(line, pos + 1)
        _expect_end(line, pos)
        return Set(k, v)
    if line.startswith("RENAME "):
        old, pos = _parse_string(line, 7)
        if not line.startswith(" ", pos):
            raise OsmFilterParseError(f"RENAME needs two strings: {line!r}")
        new, pos = _parse_string(line, pos + 1)
        _expect_end(line, pos)
        return Rename(old, new)
    if line.startswith("KEEP "):
        keys, pos = _parse_string_list(line, 5)
        _expect_end(line, pos)
        return Keep(keys)
    if line.startswith("DELETE "):
        keys, pos = _parse_string_list(line, 7)
        _expect_end(line, pos)
        return Delete(keys)
    if line.startswith("TYPE "):
        names = [t.strip() for t in line[5:].split(",")]
        bad = [t for t in names if t not in _TYPES]
        if bad:
            raise OsmFilterParseError(f"unknown TYPE(s) {bad} in {line!r}")
        return SelectionBlock(
            TypeSelector(
                node="node" in names, way="way" in names, relation="relation" in names
            )
        )
    if line.startswith("HAS "):
        k, pos = _parse_string(line, 4)
        _expect_end(line, pos)
        return SelectionBlock(HasSelector(k))
    if line.startswith("EQUALS "):
        k, pos = _parse_string(line, 7)
        if not line.startswith(" ", pos):
            raise OsmFilterParseError(f"EQUALS needs two strings: {line!r}")
        v, pos = _parse_string(line, pos + 1)
        _expect_end(line, pos)
        return SelectionBlock(EqualsSelector(k, v))
    raise OsmFilterParseError(f"unrecognized statement: {line!r}")


def parse_osmfilter(text: str) -> OsmFilterProgram:
    """Parse a full OSMFilter file into a program AST."""
    raw_lines = text.split("\n")
    if not raw_lines:
        raise OsmFilterParseError("empty filter")
    m = _HEADER_RE.match(raw_lines[0])
    if not m:
        raise OsmFilterParseError(f"missing OSMFilter header: {raw_lines[0]!r}")
    version = m.group(1)
    if version != ENGINE_FILTER_VERSION:
        # reference warns on mismatch, never fails (parse.rs:123-127)
        warnings.warn(
            f"OSMFilter version {version} != engine {ENGINE_FILTER_VERSION}",
            stacklevel=2,
        )
    if len(raw_lines) < 2 or raw_lines[1].strip():
        raise OsmFilterParseError("header must be followed by a blank line")

    # (indent_depth, statement_line) for every non-empty statement line
    items: list[tuple[int, str]] = []
    for raw in raw_lines[2:]:
        line = _strip_comment(raw)
        if not line.strip():
            continue
        depth = len(line) - len(line.lstrip("\t"))
        body = line.lstrip("\t")
        if body.startswith(" "):
            raise OsmFilterParseError(f"indentation must be tabs: {raw!r}")
        items.append((depth, body))

    root: list = []
    # stack of (depth, statement_list) — children of a selector live at
    # exactly parent depth + 1 (osmfilter.pest:46-57 PUSH/PEEK tabs)
    stack: list[tuple[int, list]] = [(0, root)]
    for depth, body in items:
        while stack and depth < stack[-1][0]:
            stack.pop()
        if depth != stack[-1][0]:
            raise OsmFilterParseError(f"bad indentation (depth {depth}): {body!r}")
        stmt = _parse_statement_line(body)
        stack[-1][1].append(stmt)
        if isinstance(stmt, SelectionBlock):
            stack.append((depth + 1, stmt.statements))

    def check_nonempty(stmts, path="<root>"):
        for s in stmts:
            if isinstance(s, SelectionBlock):
                if not s.statements:
                    raise OsmFilterParseError(
                        f"selector at {path} has no indented block (grammar requires >=1 statement)"
                    )
                check_nonempty(s.statements, f"{path}>{s.selector}")

    check_nonempty(root)
    if not root:
        raise OsmFilterParseError("filter has no statements")
    return OsmFilterProgram(version=version, statements=root)
