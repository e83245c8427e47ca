"""Compile an OSMFilter program to pure Catalyst Column expressions.

The reference interprets the statement tree per element with mutable
tags and Continue/Commit/Drop control flow
(src/filter/osmfilter/logic.rs:64-126). We instead linearize the tree
into an ordered fold over (decided, keep, tags) expression state:

- ``decided``: boolean Column — a COMMIT or DROP already fired.
- ``keep``: boolean Column — verdict (default-commit True,
  logic.rs:125).
- ``tags``: map Column — current mutated tags.

Each selector is evaluated against the *tags expression in effect at
block entry*, so mutation visibility matches the interpreter exactly
(a nested HAS sees tags SET by an earlier sibling). A COMMIT/DROP in
a nested block ends the whole filter (StatementResult propagation,
logic.rs:100-103) — captured here because every later update is
guarded by ``~decided``.

The result is one pure, deterministic expression pair — Catalyst can
push it down, fold constants, and whole-stage-codegen it; there is no
per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
from skyway_spark.functions.filter.osmfilter_parser import parse_osmfilter


def _selector_cond(sel, type_col: Column, tags: Column) -> Column:
    """Selector predicate (test_selector, logic.rs:20-37). Null-safe:
    coalesced to False so three-valued logic can't leak nulls into the
    decided/keep fold."""
    if isinstance(sel, TypeSelector):
        wanted = [t for t, on in (("node", sel.node), ("way", sel.way), ("relation", sel.relation)) if on]
        if not wanted:
            return F.lit(False)
        return type_col.isin(wanted)
    if isinstance(sel, HasSelector):
        return F.map_contains_key(tags, F.lit(sel.key))
    if isinstance(sel, EqualsSelector):
        # missing key -> null -> False (logic.rs:32-35: missing = no match)
        return F.coalesce(tags[sel.key] == F.lit(sel.value), F.lit(False))
    raise TypeError(f"unknown selector {sel!r}")


def _map_set(tags: Column, key: str, value: str) -> Column:
    """tags[key] = value (insert or overwrite) — logic.rs:84-87."""
    return F.map_concat(
        F.map_filter(tags, lambda k, _v: k != F.lit(key)),
        F.create_map(F.lit(key), F.lit(value)),
    )


class CompiledOsmFilter:
    """Holds the (keep, tags) output expressions for one filter."""

    def __init__(self, keep: Column, tags: Column):
        self.keep = keep
        self.tags = tags

    def apply(self, df: DataFrame, tags_col: str = "tags") -> DataFrame:
        """filter_elements equivalent (src/filter/mod.rs:52-63):
        retain kept rows with their mutated tags."""
        return (
            df.withColumns({"__sw_keep": self.keep, "__sw_tags": self.tags})
            .where(F.col("__sw_keep"))
            .withColumn(tags_col, F.col("__sw_tags"))
            .drop("__sw_keep", "__sw_tags")
        )


def compile_osmfilter(
    program: OsmFilterProgram | str,
    type_col: Column | str = "type",
    tags_col: Column | str = "tags",
) -> CompiledOsmFilter:
    if isinstance(program, str):
        program = parse_osmfilter(program)
    type_col = F.col(type_col) if isinstance(type_col, str) else type_col
    tags0 = F.col(tags_col) if isinstance(tags_col, str) else tags_col

    decided = F.lit(False)
    keep = F.lit(True)  # default commit if statements exhaust (logic.rs:125)
    tags = tags0

    def guard(cond: Column) -> Column:
        return ~decided & cond

    def walk(statements, path_cond: Column) -> None:
        nonlocal decided, keep, tags
        for stmt in statements:
            if isinstance(stmt, Commit):
                fire = guard(path_cond)
                keep = F.when(fire, F.lit(True)).otherwise(keep)
                decided = decided | fire
            elif isinstance(stmt, Drop):
                fire = guard(path_cond)
                keep = F.when(fire, F.lit(False)).otherwise(keep)
                decided = decided | fire
            elif isinstance(stmt, Delete):
                keys = list(stmt.keys)
                mutated = F.map_filter(tags, lambda k, _v: ~k.isin(keys))
                tags = F.when(guard(path_cond), mutated).otherwise(tags)
            elif isinstance(stmt, Keep):
                keys = list(stmt.keys)
                mutated = F.map_filter(tags, lambda k, _v: k.isin(keys))
                tags = F.when(guard(path_cond), mutated).otherwise(tags)
            elif isinstance(stmt, Set):
                mutated = _map_set(tags, stmt.key, stmt.value)
                tags = F.when(guard(path_cond), mutated).otherwise(tags)
            elif isinstance(stmt, Rename):
                # only if old key present (logic.rs:88-93)
                has_old = F.map_contains_key(tags, F.lit(stmt.old_key))
                renamed = F.map_concat(
                    F.map_filter(
                        tags, lambda k, _v: (k != F.lit(stmt.old_key)) & (k != F.lit(stmt.new_key))
                    ),
                    F.create_map(F.lit(stmt.new_key), tags[stmt.old_key]),
                )
                tags = F.when(guard(path_cond) & has_old, renamed).otherwise(tags)
            elif isinstance(stmt, SelectionBlock):
                # selector tested ONCE at block entry against current tags
                sel = _selector_cond(stmt.selector, type_col, tags)
                walk(stmt.statements, path_cond & sel)
            else:
                raise TypeError(f"unknown statement {stmt!r}")

    walk(program.statements, F.lit(True))
    return CompiledOsmFilter(keep=keep, tags=tags)


def apply_osmfilter(df: DataFrame, filter_text: str) -> DataFrame:
    """Parse + compile + apply one OSMFilter program."""
    return compile_osmfilter(filter_text).apply(df)
