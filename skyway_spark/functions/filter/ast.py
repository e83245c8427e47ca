"""OSMFilter AST — mirrors the reference's Statement/SelectorStatement
enums (src/filter/osmfilter/logic.rs:5-61) as plain dataclasses."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TypeSelector:
    node: bool = False
    way: bool = False
    relation: bool = False


@dataclass(frozen=True)
class HasSelector:
    key: str


@dataclass(frozen=True)
class EqualsSelector:
    key: str
    value: str


Selector = TypeSelector | HasSelector | EqualsSelector


@dataclass(frozen=True)
class Commit:
    pass


@dataclass(frozen=True)
class Drop:
    pass


@dataclass(frozen=True)
class Delete:
    keys: tuple[str, ...]


@dataclass(frozen=True)
class Keep:
    keys: tuple[str, ...]


@dataclass(frozen=True)
class Set:
    key: str
    value: str


@dataclass(frozen=True)
class Rename:
    old_key: str
    new_key: str


@dataclass
class SelectionBlock:
    selector: Selector
    statements: list = field(default_factory=list)


Statement = Commit | Drop | Delete | Keep | Set | Rename | SelectionBlock


@dataclass
class OsmFilterProgram:
    version: str
    statements: list
