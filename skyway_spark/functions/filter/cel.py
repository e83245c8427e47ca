"""CEL (Common Expression Language) subset compiled to Column exprs.

Reference: src/filter/cel/mod.rs — a pure boolean predicate per
element, context variables per docs/src/cel-filters.md:
``tags changeset user uid id timestamp visible type``.

Error semantics: the reference drops an element when evaluation
errors (missing map key etc.) with a warning (cel/mod.rs:51-54). In
Spark, a missing map key yields NULL, which propagates through
comparisons to NULL and is dropped by ``where`` — and CEL's
short-circuit absorption (``true || error == true``,
``false && error == false``) coincides with SQL three-valued logic
(``TRUE OR NULL = TRUE``, ``FALSE AND NULL = FALSE``), so compiling to
Columns preserves the observable keep/drop behavior without any
per-row Python.

Supported subset (covers all documented fixtures): literals
(int/uint/double/string/bool/null, list), identifiers, map index
``tags["k"]`` and field access ``tags.k``, ``in``, comparisons,
``&&  ||  !``, arithmetic ``+ - * / %``, ternary ``?:``,
``has()``, ``size()``, and string methods ``contains / startsWith /
endsWith / matches``. Anything else raises CelCompileError (the
reference panics on compile failure too, cel/mod.rs:59-67).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONTEXT_VARS = ("tags", "changeset", "user", "uid", "id", "timestamp", "visible", "type")


class CelCompileError(ValueError):
    pass


# ------------------------------ lexer ------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+[uU]?)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|[-+*/%!<>?:.,()\[\]])
    """,
    re.VERBOSE,
)

_STR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b", "f": "\f", "0": "\0"}


@dataclass
class Tok:
    kind: str
    text: str


def _unescape(s: str) -> str:
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append(_STR_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _lex(text: str) -> list[Tok]:
    toks = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise CelCompileError(f"lex error at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(Tok(kind, m.group()))
    toks.append(Tok("eof", ""))
    return toks


# ------------------------------ parser ------------------------------
# Typed compile result: (Column, type_tag) where type_tag in
# {"bool","num","str","map","list","null","any"} — used only for the
# "result must be boolean" check (cel/mod.rs:9-14) and to pick
# size()/'+' behavior.


@dataclass
class Typed:
    col: Column
    t: str


_VAR_TYPES = {
    "tags": "map",
    "changeset": "num",
    "user": "str",
    "uid": "num",
    "id": "num",
    "timestamp": "str",
    "visible": "bool",
    "type": "str",
}


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        t = self.next()
        if t.text != text:
            raise CelCompileError(f"expected {text!r}, got {t.text!r}")

    # precedence climbing: ternary < || < && < comparison/in < add < mul < unary < postfix
    def parse(self) -> Typed:
        e = self.ternary()
        if self.peek().kind != "eof":
            raise CelCompileError(f"trailing tokens at {self.peek().text!r}")
        return e

    def ternary(self) -> Typed:
        cond = self.or_()
        if self.peek().text == "?":
            self.next()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            t = a.t if a.t == b.t else "any"
            return Typed(F.when(cond.col, a.col).otherwise(b.col), t)
        return cond

    def or_(self) -> Typed:
        left = self.and_()
        while self.peek().text == "||":
            self.next()
            right = self.and_()
            left = Typed(left.col | right.col, "bool")
        return left

    def and_(self) -> Typed:
        left = self.cmp()
        while self.peek().text == "&&":
            self.next()
            right = self.cmp()
            left = Typed(left.col & right.col, "bool")
        return left

    def cmp(self) -> Typed:
        left = self.add()
        op = self.peek().text
        if op in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.add()
            c = {
                "==": left.col == right.col,
                "!=": left.col != right.col,
                "<": left.col < right.col,
                "<=": left.col <= right.col,
                ">": left.col > right.col,
                ">=": left.col >= right.col,
            }[op]
            return Typed(c, "bool")
        if op == "in":
            self.next()
            right = self.add()
            if right.t == "map":
                return Typed(F.map_contains_key(right.col, left.col), "bool")
            if right.t == "list":
                return Typed(F.array_contains(right.col, left.col), "bool")
            raise CelCompileError("'in' needs a map or list on the right")
        return left

    def add(self) -> Typed:
        left = self.mul()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            right = self.mul()
            if op == "+" and ("str" in (left.t, right.t)):
                left = Typed(F.concat(left.col, right.col), "str")
            else:
                left = Typed(left.col + right.col if op == "+" else left.col - right.col, "num")
        return left

    def mul(self) -> Typed:
        left = self.unary()
        while self.peek().text in ("*", "/", "%"):
            op = self.next().text
            right = self.unary()
            if op == "*":
                c = left.col * right.col
            elif op == "/":
                c = left.col / right.col
            else:
                c = left.col % right.col
            left = Typed(c, "num")
        return left

    def unary(self) -> Typed:
        t = self.peek()
        if t.text == "!":
            self.next()
            e = self.unary()
            return Typed(~e.col, "bool")
        if t.text == "-":
            self.next()
            e = self.unary()
            return Typed(-e.col, "num")
        return self.postfix()

    def postfix(self) -> Typed:
        e = self.primary()
        while True:
            t = self.peek()
            if t.text == "[":
                self.next()
                idx = self.ternary()
                self.expect("]")
                val_t = "str" if e.t == "map" else "any"
                e = Typed(e.col[idx.col], val_t)
            elif t.text == ".":
                self.next()
                name = self.next()
                if name.kind != "ident":
                    raise CelCompileError(f"expected field/method after '.', got {name.text!r}")
                if self.peek().text == "(":
                    self.next()
                    args = []
                    if self.peek().text != ")":
                        args.append(self.ternary())
                        while self.peek().text == ",":
                            self.next()
                            args.append(self.ternary())
                    self.expect(")")
                    e = self._method(e, name.text, args)
                else:
                    if e.t != "map":
                        raise CelCompileError(f"field access .{name.text} only on maps")
                    e = Typed(e.col[F.lit(name.text)], "str")
            else:
                return e

    def _method(self, recv: Typed, name: str, args: list[Typed]) -> Typed:
        if name == "contains" and len(args) == 1:
            return Typed(recv.col.contains(args[0].col), "bool")
        if name == "startsWith" and len(args) == 1:
            return Typed(recv.col.startswith(args[0].col), "bool")
        if name == "endsWith" and len(args) == 1:
            return Typed(recv.col.endswith(args[0].col), "bool")
        if name == "matches" and len(args) == 1:
            return Typed(F.regexp_like(recv.col, args[0].col), "bool")
        raise CelCompileError(f"unsupported method .{name}/{len(args)}")

    def primary(self) -> Typed:
        t = self.next()
        if t.text == "(":
            e = self.ternary()
            self.expect(")")
            return e
        if t.text == "[":
            items = []
            if self.peek().text != "]":
                items.append(self.ternary())
                while self.peek().text == ",":
                    self.next()
                    items.append(self.ternary())
            self.expect("]")
            return Typed(F.array(*[i.col for i in items]), "list")
        if t.kind == "int":
            return Typed(F.lit(int(t.text.rstrip("uU"))), "num")
        if t.kind == "float":
            return Typed(F.lit(float(t.text)), "num")
        if t.kind == "string":
            return Typed(F.lit(_unescape(t.text)), "str")
        if t.kind == "ident":
            if t.text == "true":
                return Typed(F.lit(True), "bool")
            if t.text == "false":
                return Typed(F.lit(False), "bool")
            if t.text == "null":
                return Typed(F.lit(None), "null")
            if t.text == "has":
                # has(tags.key) / has(tags["key"]) macro
                self.expect("(")
                inner = self.ternary()
                self.expect(")")
                return Typed(inner.col.isNotNull(), "bool")
            if t.text == "size":
                self.expect("(")
                inner = self.ternary()
                self.expect(")")
                if inner.t in ("map", "list"):
                    return Typed(F.size(inner.col), "num")
                return Typed(F.length(inner.col), "num")
            if t.text in _VAR_TYPES:
                return Typed(F.col(t.text), _VAR_TYPES[t.text])
            raise CelCompileError(f"unknown identifier {t.text!r}")
        raise CelCompileError(f"unexpected token {t.text!r}")


class CompiledCelFilter:
    def __init__(self, predicate: Column):
        self.predicate = predicate

    def apply(self, df: DataFrame) -> DataFrame:
        # eval "error" (null) -> drop, matching cel/mod.rs:51-54
        return df.where(F.coalesce(self.predicate, F.lit(False)))


def compile_cel(text: str) -> CompiledCelFilter:
    typed = _Parser(_lex(text)).parse()
    if typed.t not in ("bool", "any"):
        # reference panics on non-boolean filter output (cel/mod.rs:9-14)
        raise CelCompileError(f"CEL filter must return a boolean, got {typed.t}")
    return CompiledCelFilter(typed.col)


def apply_cel(df: DataFrame, text: str) -> DataFrame:
    return compile_cel(text).apply(df)
