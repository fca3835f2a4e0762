"""Search templates: mustache-subset rendering + the stored-script store,
and the rendered body feeding the one shared predicate compiler."""

import pytest

from harmonize_search_analyze_spark.plans.templates import (
    ScriptStore,
    TemplateError,
    render_template,
)


def test_scalar_substitution():
    assert render_template(
        '{"match": {"f": "{{q}}"}}', {"q": "hello"}
    ) == {"match": {"f": "hello"}}


def test_scalar_escaping():
    out = render_template('{"match": {"f": "{{q}}"}}', {"q": 'a"b\\c'})
    assert out == {"match": {"f": 'a"b\\c'}}


def test_numeric_and_bool_render_as_json_scalars():
    out = render_template(
        '{"range": {"v": {"gte": {{lo}}, "lte": {{hi}}}}, "b": {{flag}}}',
        {"lo": 3, "hi": 7.5, "flag": True},
    )
    assert out == {"range": {"v": {"gte": 3, "lte": 7.5}}, "b": True}


def test_tojson_array():
    out = render_template(
        '{"terms": {"t": {{#toJson}}vals{{/toJson}}}}',
        {"vals": ["x", "y"]},
    )
    assert out == {"terms": {"t": ["x", "y"]}}


def test_conditional_section_and_default():
    src = '{"range": {"v": {"gte": {{lo}}{{^lo}}0{{/lo}} }}}'
    assert render_template(src, {"lo": 9}) == {"range": {"v": {"gte": 9}}}
    assert render_template(src, {}) == {"range": {"v": {"gte": 0}}}


def test_section_with_nested_vars():
    src = '{"bool": {"must": [{"match_all": {}}{{#cap}},{"range": {"u": {"lte": {{cap}}}}}{{/cap}}]}}'
    assert render_template(src, {}) == {"bool": {"must": [{"match_all": {}}]}}
    assert render_template(src, {"cap": 5}) == {
        "bool": {"must": [{"match_all": {}}, {"range": {"u": {"lte": 5}}}]}
    }


def test_dotted_param_lookup():
    assert render_template(
        '{"match": {"f": "{{a.b}}"}}', {"a": {"b": "z"}}
    ) == {"match": {"f": "z"}}


def test_invalid_json_raises():
    with pytest.raises(TemplateError, match="valid JSON"):
        render_template('{"match": {{q}}}', {})


def test_script_store_roundtrip():
    store = ScriptStore()
    store.put("t1", '{"match": {"f": "{{q}}"}}')
    assert store.render("t1", {"q": "v"}) == {"match": {"f": "v"}}
    store.delete("t1")
    with pytest.raises(TemplateError, match="unknown stored template"):
        store.get("t1")


def test_rendered_body_compiles_and_filters(spark):
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    src = (
        '{"bool": {"must": ['
        '{"terms": {"event_type": {{#toJson}}types{{/toJson}}}},'
        '{"range": {"value": {"gte": {{min_v}}{{^min_v}}0{{/min_v}} }}}'
        '{{#user_cap}},{"range": {"user_id": {"lte": {{user_cap}}}}}{{/user_cap}}'
        ']}}'
    )
    body = render_template(
        src, {"types": ["a", "b"], "user_cap": 2}
    )
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -3.0), (3, "a", 5.0), (9, "c", 5.0)],
        ["user_id", "event_type", "value"],
    )
    got = sorted(r.user_id for r in df.where(compile_query(body)).collect())
    assert got == [1]  # u2 has value<0, u3 over cap, u9 wrong type
