"""Expression-mapper DSL tests, mirroring the reference's demonstrated
surface (examples/expression/main.go:30-91 and the basic example's
'value + _updatedx1' mappers, examples/basic/cmd/workflow/main.go:56-78)."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark.functions.mapper import (
    ExprError,
    Mapper,
    apply_mappers,
    compile_expression,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.0, 3, ["x", "y", "z"], True),
            (2, "beta", 2.5, 7, ["p"], False),
        ],
        ["id", "name", "score", "n", "tags", "flag"],
    )


def ev(df, expr, **kw):
    return [r["v"] for r in df.select(compile_expression(expr, **kw).alias("v")).collect()]


def test_fixed_key_modes(spark, df):
    out = apply_mappers(
        df, {"fx": Mapper("fixed", "hello"), "ky": Mapper("key", "name"), "empty": Mapper("", "")}
    ).collect()
    assert out[0]["fx"] == "hello" and out[0]["ky"] == "alpha" and out[0]["empty"] == ""


def test_string_concat_plus(spark, df):
    # ≙ 'a1.output.value + "_updatedx1"' (basic example)
    out = apply_mappers(df, {"v": Mapper("expression", "name + '_updatedx1'")}).collect()
    assert [r["v"] for r in out] == ["alpha_updatedx1", "beta_updatedx1"]


def test_arithmetic_and_precedence(spark, df):
    assert ev(df, "score + n * 2") == [16.0, 16.5]
    assert ev(df, "(score + n) * 2") == [26.0, 19.0]
    assert ev(df, "10 / 4") == [2.5, 2.5]
    assert ev(df, "-n + 1") == [-2, -6]


def test_comparisons_and_boolean(spark, df):
    assert ev(df, "score > 5 && n < 5") == [True, False]
    assert ev(df, "score > 5 || n > 5") == [True, True]
    assert ev(df, "!(flag)") == [False, True]
    assert ev(df, "name == 'alpha'") == [True, False]


def test_len_and_index(spark, df):
    assert ev(df, "len(tags)") == [3, 1]
    assert ev(df, "len(name)", str_cols={"name"}) == [5, 4]
    assert ev(df, "tags[0]") == ["x", "p"]  # 0-based like expr-lang


def test_string_cast_concat(spark, df):
    # ≙ builtin.string(v) (workflow.go:353-355)
    assert ev(df, "string(n) + '!'") == ["3!", "7!"]


def test_number_plus_string_concats(spark, df):
    assert ev(df, "'v=' + string(score)") == ["v=10.0", "v=2.5"]


def test_errors():
    for bad in ["foo(1)", "1 +", "tags[x]", "@bad"]:
        with pytest.raises(ExprError):
            compile_expression(bad)


def test_compiled_once_stays_jvm(spark, df):
    """Expressions compile to Catalyst (no Python eval per row)."""
    out = apply_mappers(df, {"v": Mapper("expression", "score * 2 + n")})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_custom_function_per_call(spark, df):
    """≙ expr-lang env functions (examples/expression/main.go:53-55:
    get_referred_username(id) registered into the program env)."""
    fns = {"double_it": lambda c: c * 2, "shout": lambda c: (F.upper(c), "str")}
    out = df.select(
        compile_expression("double_it(n) + 1", functions=fns).alias("a"),
        compile_expression("shout(name) + '!'", functions=fns).alias("b"),
    ).collect()
    assert [r["a"] for r in out] == [7, 15]
    assert [r["b"] for r in out] == ["ALPHA!", "BETA!"]


def test_custom_function_registry_and_pandas_udf(spark, df):
    """Module-level registry + a pandas UDF as the env function body —
    the vectorized analogue of the reference's Go callback."""
    from pyspark.sql.functions import pandas_udf

    from spider_go_spark.functions.mapper import register_function, unregister_function

    @pandas_udf("string")
    def referred_username(ids):
        return "user-" + ids.astype("string")

    register_function("get_referred_username", lambda c: (referred_username(c), "str"))
    try:
        out = apply_mappers(
            df, {"u": Mapper("expression", "get_referred_username(id)")}
        ).collect()
        assert [r["u"] for r in out] == ["user-1", "user-2"]
    finally:
        unregister_function("get_referred_username")
    with pytest.raises(ExprError):
        compile_expression("get_referred_username(1)")


def test_custom_function_multi_arg(spark, df):
    fns = {"clamp": lambda c, lo, hi: F.least(F.greatest(c, lo), hi)}
    assert ev(df, "clamp(n, 4, 6)", functions=fns) == [4, 6]
