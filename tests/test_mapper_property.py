"""Property test: the mapper expression compiler (functions/mapper.py)
agrees with a direct Python evaluation of the same expression tree on
every well-typed expression hypothesis can build.

The generator produces TYPED trees (int / str / bool) mirroring the
dialect's static semantics — including the `+` concat overload when either
operand is statically a string — so every generated expression is legal.
All sampled expressions evaluate in ONE Spark select over a literal row,
keeping the property run fast."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spider_go_spark.functions.mapper import compile_expression

# the fixed evaluation row: two int columns, two string columns
ROW = {"a": 3, "b": 7, "s": "he'l", "t": "wo"}
STR_COLS = {"s", "t"}


# --- typed expression trees: (source_text, python_value, kind) --------------

def _lit_int():
    return st.integers(min_value=0, max_value=9).map(lambda n: (str(n), n, "num"))


def _lit_str():
    alphabet = st.sampled_from(["x", "yz", "", "a b"])
    return alphabet.map(lambda v: ("'" + v + "'", v, "str"))


def _col_int():
    return st.sampled_from(["a", "b"]).map(lambda c: (c, ROW[c], "num"))


def _col_str():
    return st.sampled_from(["s", "t"]).map(lambda c: (c, ROW[c], "str"))


def _num(children):
    binop = st.tuples(st.sampled_from(["+", "-", "*"]), children, children).map(
        lambda t: (
            f"({t[1][0]} {t[0]} {t[2][0]})",
            {"+": lambda x, y: x + y, "-": lambda x, y: x - y,
             "*": lambda x, y: x * y}[t[0]](t[1][1], t[2][1]),
            "num",
        )
    )
    neg = children.map(lambda c: (f"(-{c[0]})", -c[1], "num"))
    return binop | neg


def _strlen(str_exprs):
    return str_exprs.map(lambda c: (f"len({c[0]})", len(c[1]), "num"))


def _concat(children_any, str_exprs):
    # `+` is concat when either side is statically a string; the non-string
    # side is cast to string (ints render identically in both engines)
    return st.tuples(str_exprs, children_any, st.booleans()).map(
        lambda t: (
            (f"({t[1][0]} + {t[0][0]})", f"{t[1][1]}{t[0][1]}", "str")
            if t[2]
            else (f"({t[0][0]} + {t[1][0]})", f"{t[0][1]}{t[1][1]}", "str")
        )
    )


def _cmp(nums, strs):
    ops = {
        "==": lambda x, y: x == y, "!=": lambda x, y: x != y,
        "<": lambda x, y: x < y, "<=": lambda x, y: x <= y,
        ">": lambda x, y: x > y, ">=": lambda x, y: x >= y,
    }
    def mk(pair_strategy):
        return st.tuples(st.sampled_from(sorted(ops)), pair_strategy, pair_strategy).map(
            lambda t: (
                f"({t[1][0]} {t[0]} {t[2][0]})",
                ops[t[0]](t[1][1], t[2][1]),
                "bool",
            )
        )
    return mk(nums) | mk(strs)


def _bool(children):
    binop = st.tuples(st.sampled_from(["&&", "||"]), children, children).map(
        lambda t: (
            f"({t[1][0]} {t[0]} {t[2][0]})",
            (t[1][1] and t[2][1]) if t[0] == "&&" else (t[1][1] or t[2][1]),
            "bool",
        )
    )
    neg = children.map(lambda c: (f"(!{c[0]})", not c[1], "bool"))
    return binop | neg


def typed_exprs():
    base_num = _lit_int() | _col_int()
    base_str = _lit_str() | _col_str()

    def extend(children):
        nums = children.filter(lambda c: c[2] == "num")
        strs = children.filter(lambda c: c[2] == "str")
        bools = children.filter(lambda c: c[2] == "bool")
        return (
            _num(nums)
            | _strlen(strs)
            | _concat(nums | strs, strs)
            | _cmp(nums, strs)
            | _bool(bools | _cmp(nums, strs))
        )

    return st.recursive(base_num | base_str, extend, max_leaves=8)


@pytest.fixture(scope="module")
def row_df(spark):
    return spark.createDataFrame(
        [(ROW["a"], ROW["b"], ROW["s"], ROW["t"])],
        "a long, b long, s string, t string",
    )


@given(samples=st.lists(typed_exprs(), min_size=1, max_size=25, unique_by=lambda c: c[0]))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.filter_too_much,
        HealthCheck.too_slow,
    ],
)
def test_compiled_expressions_match_python(spark, row_df, samples):
    cols = [
        compile_expression(src, STR_COLS).alias(f"e{i}")
        for i, (src, _, _) in enumerate(samples)
    ]
    got = row_df.select(*cols).collect()[0]
    for i, (src, expect, kind) in enumerate(samples):
        actual = got[f"e{i}"]
        if kind == "bool":
            actual = bool(actual)
        assert actual == expect, f"{src!r}: spark={actual!r} python={expect!r}"
