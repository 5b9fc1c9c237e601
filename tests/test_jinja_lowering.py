"""Unit tests: Jinja peephole lowering + UDF fallback equivalence.

Every lowerable template must render identically via the native path
and the full-Jinja UDF path — the lowering is an optimization, never a
semantics change.
"""

import pytest
from pyspark.sql import functions as F

from earthmover_spark.functions.jinja_compute import (
    jinja_udf_column,
    lower_template,
    template_column,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("alpha", "10", 2.5, "F"), ("Beta Max", "7", 40.0, "O")],
        ["name", "num", "qty", "flag"],
    )


LOWERABLE = [
    "plain text only",
    "{{name}}",
    "{{name}} end",
    "a {{name}} b {{num}} c",
    "{{name|upper}}",
    "{{name|trim|lower}}",
    "{{num|int}}",
    "{{qty|int}}",
    "{{num|int + 1000}}",
    "{{num|int - 3}}",
    "{{num|int * 2}}",
    "{{name[0:4]}}",
    "{{name[2]}}",
    "x={% if qty > 10 %}big{% else %}small{% endif %}",
    "{% if flag == 'F' %}final{% else %}open{% endif %}",
    "{% if qty <= 2.5 %}low{% endif %}",
]

NOT_LOWERABLE = [
    "{{qty|float ~ '-k'}}",  # float segment: Spark renders 1.0E7, Jinja 10000000.0
    "{{unknown_filter|wat}}",
    "{% for x in items %}{{x}}{% endfor %}",
    "{{md5(name)}}",
    "{{__row_data__}}",
    "{% if qty > 1 %}{% if flag == 'F' %}n{% endif %}{% endif %}",
]


@pytest.mark.parametrize("template", LOWERABLE)
def test_lowered_matches_jinja(df, template):
    lowered = lower_template(template, df.columns)
    assert lowered is not None, f"expected lowerable: {template}"
    native = [r.v for r in df.select(lowered.alias("v")).collect()]
    via_jinja = [
        r.v
        for r in df.select(
            jinja_udf_column(template, df.columns).alias("v")
        ).collect()
    ]
    assert native == via_jinja, template


@pytest.mark.parametrize("template", NOT_LOWERABLE)
def test_not_lowerable_falls_back(df, template):
    assert lower_template(template, df.columns) is None


def test_float_concat_renders_python_style(spark):
    """`~` with a float segment must take the UDF path so large doubles
    render 10000000.0 (Python) rather than 1.0E7 (Spark)."""
    from earthmover_spark.functions.jinja_compute import template_column

    sdf = spark.createDataFrame([("10000000",)], ["qty"])
    out = sdf.select(
        template_column("{{qty|float ~ '-k'}}", sdf.columns).alias("v")
    ).collect()
    assert out[0].v == "10000000.0-k"


def test_value_col_in_modify_context(df):
    col = template_column("{{value|upper}}", df.columns, value_col="name")
    out = [r.v for r in df.select(col.alias("v")).collect()]
    assert out == ["ALPHA", "BETA MAX"]


def test_macros_force_fallback(df):
    macros = "{% macro shout(x) %}{{x|upper}}!{% endmacro %}"
    col = template_column("{{shout(name)}}", df.columns, macros=macros)
    out = [r.v for r in df.select(col.alias("v")).collect()]
    assert out == ["ALPHA!", "BETA MAX!"]


def test_row_data_dict(df):
    col = template_column("{{__row_data__['name']}}", df.columns)
    out = [r.v for r in df.select(col.alias("v")).collect()]
    assert out == ["alpha", "Beta Max"]


def test_fromjson_global(spark):
    df = spark.createDataFrame([('{"a": 5}',)], ["j"])
    col = template_column("{{fromjson(j)['a']}}", df.columns)
    assert df.select(col.alias("v")).collect()[0].v == "5"


class TestArgFiltersAndConcat:
    """New lowered surface: replace/default arg-filters and ~ concat.
    Every case asserts (a) it lowers (no UDF) and (b) the lowered result
    equals the full-Jinja render."""

    CASES = [
        ("{{name|replace('a', 'o')}}", ["name"]),
        ("{{name|replace('ann', '')|upper}}", ["name"]),
        ("{{name|default('missing')}}", ["name"]),
        ("{{name ~ '-' ~ kind}}", ["name", "kind"]),
        ("{{name|upper ~ ':' ~ qty}}", ["name", "kind", "qty"]),
        ("pre {{name|replace('n', 'N')}} post", ["name"]),
    ]

    @pytest.mark.parametrize("template,cols", CASES)
    def test_lowered_matches_jinja(self, spark, template, cols):
        from earthmover_spark.functions.jinja_compute import (
            jinja_udf_column,
            lower_template,
        )

        df = spark.createDataFrame(
            [("ann", "cat", "3"), ("bob", "dog", "14"), ("", "", "0")],
            ["name", "kind", "qty"],
        )
        lowered = lower_template(template, df.columns)
        assert lowered is not None, f"should lower: {template}"
        got = df.select(
            lowered.alias("low"),
            jinja_udf_column(template, df.columns).alias("full"),
        ).collect()
        for r in got:
            assert r.low == r.full, template

    def test_unknown_column_still_falls_back(self):
        from earthmover_spark.functions.jinja_compute import lower_template

        # default() on an unknown name must go to full Jinja (undefined)
        assert lower_template("{{nope|default('x')}}", ["name"]) is None
        assert lower_template("{{name|truncate(5)}}", ["name"]) is None


class TestInlineIf:
    CASES = [
        "{{'big' if qty|int > 9 else 'small'}}",
        "{{name if qty|int > 9 else kind}}",
        "{{name|upper if name == 'ann' else name}}",
        "x={{qty|int + 1 if qty|int > 9 else 0}}",
    ]

    @pytest.mark.parametrize("template", CASES)
    def test_inline_if_lowers_and_matches(self, spark, template):
        from earthmover_spark.functions.jinja_compute import (
            jinja_udf_column,
            lower_template,
        )

        df = spark.createDataFrame(
            [("ann", "cat", "12"), ("bob", "dog", "3")], ["name", "kind", "qty"]
        )
        lowered = lower_template(template, df.columns)
        assert lowered is not None, template
        for r in df.select(
            lowered.alias("low"),
            jinja_udf_column(template, df.columns).alias("full"),
        ).collect():
            assert r.low == r.full, template

    def test_literal_containing_if_still_works(self, spark):
        from earthmover_spark.functions.jinja_compute import (
            jinja_udf_column,
            lower_template,
        )

        t = "{{' if '}}"
        df = spark.createDataFrame([("x",)], ["c"])
        lowered = lower_template(t, ["c"])
        assert lowered is not None
        got = df.select(lowered.alias("v")).collect()[0].v
        want = df.select(jinja_udf_column(t, ["c"]).alias("v")).collect()[0].v
        assert got == want == " if "
