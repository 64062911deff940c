"""The reference's field-mapper + expression engine, re-expressed as
Catalyst columns.

spider-go builds each outgoing message field-by-field through ``ex()``
(/root/reference/pkg/spider/workflow.go:347-399) with three mapper modes
(storage.go:5-16):

- ``fixed``       → literal value
- ``key``         → copy a context field
- ``expression``  → expr-lang program compiled PER MESSAGE
  (workflow.go:379-385) over a nested map env

Here a :class:`Mapper` compiles ONCE into a ``pyspark.sql.Column`` — the
per-message interpreter becomes a per-plan Catalyst expression inside
whole-stage codegen (SURVEY.md §4.1 row 1).

The expression dialect covers the surface the reference demonstrates
(examples/expression/main.go:30-91, SURVEY.md §2.9): arithmetic ``+ - * /``,
comparisons ``== != < <= > >=``, boolean ``&& || !``, parentheses, single- or
double-quoted string literals, ``+`` as string concat when either operand is
a string, dotted field access ``a.b.c``, array indexing ``arr[0]``, and the
builtins ``len(x)`` and ``string(x)``. Deliberate divergence (SURVEY.md
§1.3): no ``uuidv7()`` — wall-clock identity is unreproducible and the
engine's ids derive from ``(round, rank)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d+|\d+)"
    r"|(?P<str>'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")"
    # '$' allowed as a segment's leading char: the workflow engine aliases
    # the trigger context as "$trigger" (workflow.go:128)
    r"|(?P<ident>[$A-Za-z_][A-Za-z0-9_]*(?:\.[$A-Za-z_][A-Za-z0-9_]*)*)"
    r"|(?P<op>==|!=|<=|>=|&&|\|\||[-+*/<>!()\[\],]))"
)


class ExprError(ValueError):
    pass


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ExprError(f"bad token at {pos!r} in {src!r}")
            break
        pos = m.end()
        for kind in ("num", "str", "ident", "op"):
            if m.group(kind) is not None:
                out.append((kind, m.group(kind)))
                break
    return out


@dataclass
class _Val:
    """Compiled operand + static kind ('str' | 'num' | 'col' | 'bool')."""

    col: Column
    kind: str


class _Parser:
    """Recursive descent over: or → and → cmp → add → mul → unary → postfix
    → atom."""

    def __init__(
        self,
        tokens: list[tuple[str, str]],
        str_cols: set[str],
        functions: dict | None = None,
    ):
        self.toks = tokens
        self.i = 0
        self.str_cols = str_cols  # column names statically known to be strings
        self.functions = functions or {}

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, val: str | None = None) -> tuple[str, str]:
        tok = self.peek()
        if tok is None or (val is not None and tok[1] != val):
            raise ExprError(f"expected {val!r}, got {tok!r}")
        self.i += 1
        return tok

    def parse(self) -> _Val:
        v = self.or_()
        if self.peek() is not None:
            raise ExprError(f"trailing tokens: {self.toks[self.i:]}")
        return v

    def or_(self) -> _Val:
        v = self.and_()
        while (t := self.peek()) and t[1] == "||":
            self.eat()
            v = _Val(v.col | self.and_().col, "bool")
        return v

    def and_(self) -> _Val:
        v = self.cmp()
        while (t := self.peek()) and t[1] == "&&":
            self.eat()
            v = _Val(v.col & self.cmp().col, "bool")
        return v

    def cmp(self) -> _Val:
        v = self.add()
        if (t := self.peek()) and t[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.eat()[1]
            r = self.add()
            ops = {
                "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
            }
            v = _Val(ops[op](v.col, r.col), "bool")
        return v

    def add(self) -> _Val:
        v = self.mul()
        while (t := self.peek()) and t[1] in ("+", "-"):
            op = self.eat()[1]
            r = self.mul()
            if op == "+" and ("str" in (v.kind, r.kind)):
                # expr-lang overloads + as concat (examples/expression
                # main.go:67); statically stringy operand decides
                v = _Val(F.concat(v.col.cast("string"), r.col.cast("string")), "str")
            else:
                v = _Val(v.col + r.col if op == "+" else v.col - r.col, "num")
        return v

    def mul(self) -> _Val:
        v = self.unary()
        while (t := self.peek()) and t[1] in ("*", "/"):
            op = self.eat()[1]
            r = self.unary()
            v = _Val(v.col * r.col if op == "*" else v.col / r.col, "num")
        return v

    def unary(self) -> _Val:
        t = self.peek()
        if t and t[1] == "!":
            self.eat()
            return _Val(~self.unary().col, "bool")
        if t and t[1] == "-":
            self.eat()
            return _Val(-self.unary().col, "num")
        return self.postfix()

    def postfix(self) -> _Val:
        v = self.atom()
        while (t := self.peek()) and t[1] == "[":
            self.eat("[")
            idx = self.eat()
            if idx[0] != "num":
                raise ExprError("array index must be an integer literal")
            self.eat("]")
            # expr-lang indexes 0-based (examples/expression/main.go:71);
            # element_at is 1-based
            v = _Val(F.element_at(v.col, int(idx[1]) + 1), "col")
        return v

    def atom(self) -> _Val:
        t = self.peek()
        if t is None:
            raise ExprError("unexpected end of expression")
        kind, text = t
        if kind == "num":
            self.eat()
            return _Val(F.lit(float(text) if "." in text else int(text)), "num")
        if kind == "str":
            self.eat()
            body = text[1:-1].replace("\\'", "'").replace('\\"', '"')
            return _Val(F.lit(body), "str")
        if kind == "op" and text == "(":
            self.eat("(")
            v = self.or_()
            self.eat(")")
            return v
        if kind == "ident":
            self.eat()
            nxt = self.peek()
            if nxt and nxt[1] == "(":
                return self.call(text)
            k = "str" if text in self.str_cols else "col"
            return _Val(F.col(text), k)
        raise ExprError(f"unexpected token {t!r}")

    def call(self, name: str) -> _Val:
        self.eat("(")
        args: list[_Val] = []
        if self.peek() and self.peek()[1] != ")":
            args.append(self.or_())
            while self.peek() and self.peek()[1] == ",":
                self.eat(",")
                args.append(self.or_())
        self.eat(")")
        if name == "len":
            if len(args) != 1:
                raise ExprError("len() takes one argument")
            # expr-lang len() covers strings and arrays; size() handles
            # arrays/maps, length() strings — pick by static kind
            a = args[0]
            return _Val(F.length(a.col) if a.kind == "str" else F.size(a.col), "num")
        if name == "string":
            if len(args) != 1:
                raise ExprError("string() takes one argument")
            return _Val(args[0].col.cast("string"), "str")
        if name in self.functions or name in _FUNCTION_REGISTRY:
            fn = self.functions.get(name, _FUNCTION_REGISTRY.get(name))
            out = fn(*[a.col for a in args])
            if isinstance(out, tuple):  # (Column, static-kind) form
                return _Val(out[0], out[1])
            return _Val(out, "col")
        known = sorted({"len", "string", *self.functions, *_FUNCTION_REGISTRY})
        raise ExprError(f"unknown function {name!r} (supported: {', '.join(known)})")


# Registered environment functions ≙ expr-lang's custom env functions
# (/root/reference/examples/expression/main.go:53-55 registers
# get_referred_username(id) into the program env). A registered fn takes
# Column args and returns a Column (builtin, pandas UDF, or composition) —
# or a (Column, kind) pair to participate in the static `+`-overload typing.
_FUNCTION_REGISTRY: dict = {}


def register_function(name: str, fn) -> None:
    """Register ``name`` so mapper expressions can call it. ``fn`` maps
    Column args → Column (optionally (Column, kind)). Pandas UDFs and plain
    ``pyspark.sql.functions`` compositions both qualify — the expression
    engine stays declarative either way."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ExprError(f"bad function name {name!r}")
    _FUNCTION_REGISTRY[name] = fn


def unregister_function(name: str) -> None:
    _FUNCTION_REGISTRY.pop(name, None)


def compile_expression(
    src: str,
    str_cols: set[str] | None = None,
    functions: dict | None = None,
) -> Column:
    """Compile one expr-lang-dialect expression to a Column (once per plan —
    vs the reference's per-message expr.Compile, workflow.go:379-385).
    ``functions`` adds per-call env functions on top of the module registry
    (≙ expr.Env custom functions)."""
    return _Parser(_tokenize(src), str_cols or set(), functions).parse().col


@dataclass(frozen=True)
class Mapper:
    """≙ spider-go Mapper (storage.go:5-16): mode ∈ {fixed, key, expression}."""

    mode: str
    value: str

    def to_column(
        self, str_cols: set[str] | None = None, functions: dict | None = None
    ) -> Column:
        if self.mode == "fixed":
            return F.lit(self.value)
        if self.mode == "key":
            return F.col(self.value)
        if self.mode == "expression":
            return compile_expression(self.value, str_cols, functions)
        # empty mode → empty string (workflow.go:361-363)
        if not self.mode:
            return F.lit("")
        raise ExprError(f"unknown mapper mode {self.mode!r}")


def string_paths(schema) -> set[str]:
    """Every dotted path in ``schema`` that resolves to a string — so the
    static ``+``-concat overload and ``len()`` dispatch work on NESTED
    fields too (e.g. the flow interpreter's ``a1.output.value`` context
    accesses), not just top-level columns."""
    from pyspark.sql import types as T

    out: set[str] = set()

    def walk(prefix: str, dtype) -> None:
        if isinstance(dtype, T.StringType) and prefix:
            out.add(prefix)
        elif isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}.{f.name}" if prefix else f.name, f.dataType)

    walk("", schema)
    return out


def apply_mappers(
    df: DataFrame, mappers: dict[str, Mapper], functions: dict | None = None
) -> DataFrame:
    """≙ the ex() projection loop (workflow.go:347-399): build the output
    record field-by-field. String-typed input columns — including nested
    struct paths — are detected from the schema so ``+`` concat/arithmetic
    overloading matches the dynamic semantics."""
    str_cols = string_paths(df.schema)
    return df.select(
        *[m.to_column(str_cols, functions).alias(name) for name, m in mappers.items()]
    )
