"""Lowering-coverage ratchet over the reference's own golden suite.

The plan lint in test_driver_contract covers the 220+ registry
queries, but the YAML/golden path had no guard: a template silently
dropping from the native peephole to the Arrow UDF would still render
correct bytes, just 10-100x slower. This test runs the full reference
golden project with spies on the two compile chokepoints and pins
EXACTLY which templates lower and which fall back — a regression in
either direction (a lowered template regressing to Python, or a
fallback silently changing semantics by lowering) fails loudly.

Also unit-pins ``macros_allow_lowering``: the r11 gate fix that stops
a merely-DECLARED project macro (the reference suite defines test/
test2 but never calls them row-side) from forcing every template in
the project onto the UDF path.
"""

import os

import pytest

REF_TESTS = "/root/reference/earthmover/tests"

#: templates the golden suite must compile NATIVELY (whole-stage
#: codegen, zero Python) — the ratchet floor. Any of these falling
#: back to the UDF is a silent 10-100x regression. The dotted
#: nested-struct renders and the 12-month arithmetic templates joined
#: this set in r11 (schema-aware dotted lowering + the precedence
#: arithmetic parser) — see _dotted_lowered() below.
_STATIC_LOWERED = {
    "0.0",
    "1_{{value}}",
    "2_{{value}}",
    "3_{{value}}",
    "4_{{value}}",
    '{ "entity": "{{entity}}", "name": "{{name}}", '
    '"{{count_column}}": {{count|int}} }',
    '{ "family": "{{family}}", "all_lifespans": {{all_lifespans}}, '
    '"all_lifespans_quoted": {{all_lifespans_quoted}} }',
    '{ "id": "{{id}}", "name": "{{name}}", "family": "{{family}}", '
    '"genus": "{{genus}}", "species": "{{species}}", '
    '"avg_lifespan_yrs": {{avg_lifespan_yrs}}, '
    '"avg_weight_kg": {{avg_weight_kg}} }',
    '{ "name": "{{name}}", "scientific_name": "{{scientific_name}}", '
    '"family": "{{family}}", "branch": "{{branch}}", '
    '"genus": "{{genus}}", "species": "{{species}}" }',
    "{% if value!=value %}0.0{% else %}{{value}}{% endif %}",
    "{{value[0:4]}}",
    "{{value|int + 1000}}",
    "{{value|trim}}",
    "{{value}}",
}


def _dotted_lowered() -> set:
    """The cities_weather dotted renders and 12-month arithmetic
    templates — native since the r11 schema-aware dotted lowering +
    precedence arithmetic parser (39 templates that previously paid
    the UDF)."""
    months = [
        "January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November",
        "December",
    ]
    out = set()
    for family in (
        "avg_days_of_rain", "temperatures.avg_highs",
        "temperatures.avg_lows",
    ):
        for m in months:
            out.add("{{weather.%s.%s}}" % (family, m))
        total = " + ".join(f"weather.{family}.{m}|int" for m in months)
        if family == "avg_days_of_rain":
            out.add("{{%s}}" % total)
        else:
            out.add("{{((%s)/12)|int}}" % total)
    return out


def _loop_templates() -> set:
    """The __row_data__ dict-dump loop templates (destination file +
    inline; whitespace differs between them) — native since the r13
    AST loop unroll (jinja_compute._lower_loop_template): the
    iteration domain is the static column list, so the loop unrolls to
    a per-column concat inside whole-stage codegen."""
    return {
        '{\n    {% for key in __row_data__.keys() -%}\n    '
        '{% if key != "__row_data__" -%}\n    '
        "{% if not loop.first %},{% endif -%}\n    "
        '"{{key}}": "{{__row_data__[key]|trim}}"\n    '
        "{%- endif %}\n    {% endfor -%}\n}",
        "{ {% for key in __row_data__.keys() -%} "
        '{% if key != "__row_data__" -%} '
        "{% if not loop.first %},{% endif -%} "
        '"{{key}}": "{{__row_data__[key]|trim}}" '
        "{%- endif %} {% endfor -%} }",
    }


def _expected_fallbacks() -> set:
    """Since r13 the golden suite has ZERO UDF fallbacks — every
    template in the reference's own test project compiles to native
    Column expressions."""
    return set()


EXPECTED_LOWERED = _STATIC_LOWERED | _dotted_lowered() | _loop_templates()


@pytest.mark.skipif(
    not os.path.isdir(REF_TESTS), reason="reference checkout not available"
)
def test_golden_suite_lowering_manifest(spark, tmp_path):
    from earthmover_spark.functions import jinja_compute as jc
    from earthmover_spark.plans.executor import run_project

    lowered, fell_back = set(), set()
    orig_lower = jc.lower_template
    orig_udf_col = jc.jinja_udf_column
    orig_udf_struct = jc.jinja_udf_struct

    def spy_lower(template, columns, value_col=None, schema=None,
                  self_row_data=False):
        out = orig_lower(template, columns, value_col, schema,
                         self_row_data)
        (lowered if out is not None else fell_back).add(template)
        return out

    def spy_udf_col(template, columns, value_col=None, macros="",
                    loader_dir=None, self_row_data=False):
        fell_back.add(template)
        return orig_udf_col(
            template, columns, value_col, macros, loader_dir,
            self_row_data,
        )

    def spy_udf_struct(pending, columns, macros="", loader_dir=None):
        for _, tmpl, _ in pending:
            fell_back.add(tmpl)
        return orig_udf_struct(pending, columns, macros, loader_dir)

    jc.lower_template = spy_lower
    jc.jinja_udf_column = spy_udf_col
    jc.jinja_udf_struct = spy_udf_struct
    try:
        run_project(
            spark,
            os.path.join(REF_TESTS, "earthmover.yaml"),
            output_dir=str(tmp_path / "out"),
        )
    finally:
        jc.lower_template = orig_lower
        jc.jinja_udf_column = orig_udf_col
        jc.jinja_udf_struct = orig_udf_struct

    assert lowered == EXPECTED_LOWERED, (
        "native-lowered template set changed — a removal means a "
        "silent 10-100x UDF regression; an addition must be verified "
        f"render-identical first.\n extra={lowered - EXPECTED_LOWERED}\n"
        f" missing={EXPECTED_LOWERED - lowered}"
    )
    fell_back -= lowered  # a template may be probed then lowered
    expected_fb = _expected_fallbacks()
    assert fell_back == expected_fb, (
        f"UDF-fallback set changed.\n extra={fell_back - expected_fb}\n"
        f" missing={expected_fb - fell_back}"
    )


def test_macros_allow_lowering_gate():
    from earthmover_spark.functions.jinja_compute import (
        macros_allow_lowering,
    )

    defs = (
        "{% macro test() -%}testing!{%- endmacro -%}"
        "{% macro test2() -%}testing!{%- endmacro %}"
    )
    # declared-but-uncalled macros must NOT block lowering
    assert macros_allow_lowering("{{value|trim}}", defs)
    assert macros_allow_lowering("plain", defs)
    # a template actually CALLING a defined macro must fall back
    assert not macros_allow_lowering("{{test()}}", defs)
    assert not macros_allow_lowering("x {{ test2( ) }} y", defs)
    # a name that merely contains a macro name as a substring is fine
    assert macros_allow_lowering("{{test2x}}", defs)
    # top-level effects outside macro defs block everything
    assert not macros_allow_lowering("{{v}}", "{% set x = 1 %}")
    assert not macros_allow_lowering("{{v}}", defs + "stray text")
    # comments and whitespace around defs are harmless
    assert macros_allow_lowering("{{v}}", "{# note #}\n" + defs + "\n")
    # empty macros always allow
    assert macros_allow_lowering("{{v}}", "")


def test_declared_macros_no_longer_force_udf(spark):
    """End-to-end: add_columns under a project with declared-but-unused
    macros must plan ZERO Python stages (the r11 gate fix), and a
    macro-CALLING template still renders via the UDF."""
    from earthmover_spark.operators.column import add_columns

    df = spark.createDataFrame([("a",), ("b",)], ["name"])
    macros = "{% macro hello() -%}hi{%- endmacro %}"
    out = add_columns(
        df, columns={"tag": "x_{{name}}"}, macros=macros
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert [r.tag for r in out.orderBy("name").collect()] == ["x_a", "x_b"]

    called = add_columns(
        df, columns={"tag": "{{hello()}}_{{name}}"}, macros=macros
    )
    assert [r.tag for r in called.orderBy("name").collect()] == [
        "hi_a", "hi_b",
    ]
