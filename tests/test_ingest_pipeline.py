"""ES ingest-pipeline processors: grok/dissect compilation, per-processor
semantics (try-cast failures, conditionals, drop), chain composition."""

from __future__ import annotations

import datetime

import pytest

from harmonize_search_analyze_spark.operators.ingest_pipeline import (
    dissect_to_regex,
    grok_to_regex,
    run_pipeline,
)


def test_grok_compile():
    rx, fields = grok_to_regex(
        "%{WORD:verb} \\[%{TIMESTAMP_ISO8601:when}\\] took %{NUMBER:ms}ms"
    )
    assert fields == ["verb", "when", "ms"]
    import re

    m = re.match(rx, "GET [2024-01-01T10:00:00.123Z] took 41.5ms")
    assert m and m.group(1) == "GET" and m.group(3) == "41.5"
    # unnamed refs match without capturing; custom definitions override
    rx2, f2 = grok_to_regex(
        "%{SEV:level} %{WORD}", extra={"SEV": "(?:LOW|HIGH)"}
    )
    assert f2 == ["level"]
    assert re.match(rx2, "HIGH x").group(1) == "HIGH"
    with pytest.raises(ValueError):
        grok_to_regex("%{NOPE:x}")


def test_dissect_compile():
    import re

    rx, fields = dissect_to_regex("%{client} - %{?skip} [%{msg}]")
    assert fields == ["client", "msg"]
    m = re.match(rx, "10.0.0.1 - xx [hello [nested] world]")
    # final key is greedy: nested brackets stay inside msg
    assert m.group(1) == "10.0.0.1" and m.group(2) == "hello [nested] world"


def test_processor_semantics(spark):
    df = spark.createDataFrame(
        [("a=1,b=x,c=9", "42", "2024-01-02 03:04:05", " Pad ", "u,v,w")],
        ["kvs", "num", "when", "pad", "csvline"],
    )
    out = run_pipeline(df, [
        {"kv": {"field": "kvs", "field_split": ",", "value_split": "=",
                "include_keys": ["a", "c"]}},
        {"convert": {"field": "num", "type": "long",
                     "target_field": "num_l"}},
        {"date": {"field": "when", "formats": ["yyyy-MM-dd HH:mm:ss"],
                  "target_field": "ts"}},
        {"trim": {"field": "pad"}},
        {"csv": {"field": "csvline", "target_fields": ["c1", "c2", "c3"]}},
        {"set": {"field": "tag", "value": "ingested"}},
        {"script": {"target_field": "num2", "source": "num_l * 2"}},
    ]).collect()[0]
    assert (out.a, out.c) == ("1", "9")
    assert out.num_l == 42 and out.num2 == 84
    assert out.ts == datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert out.pad == "Pad" and (out.c1, out.c3) == ("u", "w")
    assert out.tag == "ingested"


def test_convert_failure_and_conditional_and_drop(spark):
    df = spark.createDataFrame(
        [("x", "keep"), ("7", "keep"), ("8", "drop-me")], ["v", "flag"]
    )
    rows = run_pipeline(df, [
        {"convert": {"field": "v", "type": "long", "target_field": "n"}},
        # conditional set: only rows where n is parsed
        {"set": {"field": "parsed", "value": "y", "if": "n IS NOT NULL"}},
        {"drop": {"if": "flag = 'drop-me'"}},
    ]).collect()
    got = {(r.v): (r.n, r.parsed) for r in rows}
    assert got == {"x": (None, None), "7": (7, "y")}


def test_grok_dissect_processors_and_rename(spark):
    df = spark.createDataFrame(
        [("ERROR 2024-05-05T01:02:03 disk full on node-3",)], ["line"]
    )
    out = run_pipeline(df, [
        {"grok": {"field": "line",
                  "pattern": "%{LOGLEVEL:level} %{TIMESTAMP_ISO8601:at} "
                             "%{GREEDYDATA:msg}"}},
        {"dissect": {"field": "msg", "pattern": "%{what} on %{node}"}},
        {"rename": {"field": "level", "target_field": "severity"}},
        {"remove": {"field": "line"}},
        {"uppercase": {"field": "node"}},
        {"gsub": {"field": "what", "pattern": " ", "replacement": "_"}},
        {"split": {"field": "what", "separator": "_",
                   "target_field": "what_parts"}},
        {"join": {"field": "what_parts", "separator": "+"}},
    ]).collect()[0]
    assert out.severity == "ERROR" and out.node == "NODE-3"
    assert out.what == "disk_full" and out.what_parts == "disk+full"
    assert "line" not in out.asDict()


def test_set_copy_and_override(spark):
    df = spark.createDataFrame([("a", None), ("b", "has")], ["src", "dst"])
    rows = run_pipeline(df, [
        {"set": {"field": "dst", "copy_from": "src", "override": False}},
    ]).collect()
    assert {(r.src, r.dst) for r in rows} == {("a", "a"), ("b", "has")}
    with pytest.raises(ValueError):
        run_pipeline(df, [{"nope": {}}])
    with pytest.raises(ValueError):
        run_pipeline(df, [{"a": {}, "b": {}}])


def test_grok_group_neutralization():
    """User-written capturing groups (in pattern_definitions or literal
    regex) must not shift field group numbering."""
    import re

    rx, fields = grok_to_regex(
        "%{SEV:level} %{WORD:w}", extra={"SEV": "(LOW|HIGH)"}
    )
    assert fields == ["level", "w"]
    m = re.match(rx, "HIGH abc")
    assert (m.group(1), m.group(2)) == ("HIGH", "abc")
    # capturing group in the literal segment between references
    rx2, f2 = grok_to_regex("(x|y)=%{INT:n}")
    assert f2 == ["n"]
    assert re.match(rx2, "x=42").group(1) == "42"


def test_failure_tolerance_ansi(spark):
    """One malformed document must NULL its fields, never abort the job
    (ANSI is on by default in Spark 4): date garbage, ragged csv,
    duplicate kv keys, multi-char value_split."""
    df = spark.createDataFrame(
        [("garbage", "a,b", "k=>1;k=>2;m=>33")], ["when", "line", "kvs"]
    )
    out = run_pipeline(df, [
        {"date": {"field": "when", "target_field": "ts"}},
        {"csv": {"field": "line", "target_fields": ["c1", "c2", "c3"]}},
        {"kv": {"field": "kvs", "field_split": ";", "value_split": "=>",
                "include_keys": ["k", "m", "absent"]}},
    ]).collect()[0]
    assert out.ts is None
    assert (out.c1, out.c2, out.c3) == ("a", "b", None)
    assert out.k == "1"          # first occurrence wins, no map crash
    assert out.m == "33"         # multi-char separator handled
    assert out.absent is None


def test_conditional_extract_and_structural_if(spark):
    """`if` gates extraction processors per row; structural processors
    reject it loudly; drop with no condition drops everything."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "n=5"), (2, "n=6")], ["id", "kvs"]
    )
    rows = {r.id: r.n for r in run_pipeline(df, [
        {"kv": {"field": "kvs", "field_split": ",", "value_split": "=",
                "include_keys": ["n"], "if": "id = 1"}},
    ]).collect()}
    assert rows == {1: "5", 2: None}
    with _pytest.raises(ValueError, match="structural"):
        run_pipeline(df, [{"rename": {"field": "kvs",
                                      "target_field": "x", "if": "id=1"}}])
    assert run_pipeline(df, [{"drop": {}}]).count() == 0


def test_inference_processor_logistic_and_linear(spark):
    import math

    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame(
        [(1, 2.0, 1.0), (2, -4.0, 0.0), (3, None, 1.0)],
        ["id", "x", "y"],
    )
    model = {
        "type": "logistic_regression",
        "coefficients": {"x": 1.0, "y": 0.5},
        "intercept": -0.5,
        "classification_labels": ["low", "high"],
    }
    out = {r.id: r for r in run_pipeline(df, [
        {"inference": {"model": model, "target_field": "p"}},
    ]).collect()}
    assert abs(out[1]["p"] - 1 / (1 + math.exp(-2.0))) < 1e-12
    assert out[1]["p_label"] == "high" and out[2]["p_label"] == "low"
    # NULL feature contributes 0 (x=None -> logit = -0.5 + 0.5 = 0 -> 0.5)
    assert abs(out[3]["p"] - 0.5) < 1e-12 and out[3]["p_label"] == "high"

    lin = {"type": "linear_regression",
           "coefficients": {"x": 2.0}, "intercept": 1.0}
    got = {r.id: r.yhat for r in run_pipeline(df, [
        {"inference": {"model": lin, "target_field": "yhat"}},
    ]).collect()}
    assert got[1] == 5.0 and got[2] == -7.0 and got[3] == 1.0


def test_inference_processor_if_and_validation(spark):
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame([(1, 1.0), (2, 1.0)], ["id", "x"])
    model = {"type": "logistic_regression", "coefficients": {"x": 10.0},
             "classification_labels": ["n", "y"]}
    rows = {r.id: r for r in run_pipeline(df, [
        {"inference": {"model": model, "target_field": "p", "if": "id = 1"}},
    ]).collect()}
    assert rows[1]["p"] is not None and rows[1]["p_label"] == "y"
    assert rows[2]["p"] is None and rows[2]["p_label"] is None
    with _pytest.raises(ValueError, match="model type"):
        run_pipeline(df, [{"inference": {"model": {"type": "boosted_tree",
                                                   "coefficients": {"x": 1}}}}])
    with _pytest.raises(ValueError, match="coefficients"):
        run_pipeline(df, [{"inference": {"model": {
            "type": "linear_regression", "coefficients": {}}}}])


def test_bbq_ragged_embedding_scores_as_zero_bits(spark):
    """A shorter-than-dim embedding must rank (missing dims = clear sign
    bits), not abort the query under ANSI."""
    from harmonize_search_analyze_spark.operators.similarity import bbq_topk

    df = spark.createDataFrame(
        [(1, [1.0, 1.0, 1.0, 1.0]), (2, [1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id: r.hamming for r in
           bbq_topk(df, [1.0, 1.0, 1.0, 1.0], k=5, shortlist=5).collect()}
    assert got[1] == 0 and got[2] == 2


def test_kv_separator_with_quote_is_escaped(spark):
    """A single quote inside field_split/value_split must not break the
    generated SQL expression (same escaping contract as include_keys)."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame([(1, "a'1;b'2")], ["id", "kvs"])
    out = run_pipeline(df, [
        {"kv": {"field": "kvs", "field_split": ";", "value_split": "'",
                "include_keys": ["a", "b"]}},
    ]).collect()[0]
    assert out["a"] == "1" and out["b"] == "2"


def test_inference_if_preserves_preexisting_target(spark):
    """`if`-skipped rows keep the document unchanged (ES contract): a
    pre-existing target column is preserved, not overwritten with NULL."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 0.25), (2, 1.0, 0.75)], ["id", "x", "p"]
    )
    model = {"type": "logistic_regression", "coefficients": {"x": 10.0},
             "classification_labels": ["n", "y"]}
    rows = {r.id: r for r in run_pipeline(df, [
        {"inference": {"model": model, "target_field": "p", "if": "id = 1"}},
    ]).collect()}
    assert rows[1]["p"] > 0.99 and rows[1]["p_label"] == "y"
    assert rows[2]["p"] == 0.75 and rows[2]["p_label"] == "y"

    lin = {"type": "linear_regression", "coefficients": {"x": 2.0},
           "intercept": 1.0}
    rows = {r.id: r for r in run_pipeline(df, [
        {"inference": {"model": lin, "target_field": "p", "if": "id = 1"}},
    ]).collect()}
    assert rows[1]["p"] == 3.0 and rows[2]["p"] == 0.75


def test_append_processor(spark):
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame([(1, ["a"]), (2, None)], ["id", "tags"])
    out = run_pipeline(df, [
        {"append": {"field": "tags", "value": ["b", "a"]}},
    ])
    got = {r.id: r.tags for r in out.collect()}
    assert got == {1: ["a", "b", "a"], 2: ["b", "a"]}
    nodup = run_pipeline(df, [
        {"append": {"field": "tags", "value": ["b", "a"],
                    "allow_duplicates": False}},
    ])
    assert {r.id: r.tags for r in nodup.collect()}[1] == ["a", "b"]


def test_bytes_processor(spark):
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame(
        [(1, "1kb"), (2, "2.5MB"), (3, "10b"), (4, "nonsense"), (5, "3gb")],
        ["id", "sz"],
    )
    out = run_pipeline(df, [
        {"bytes": {"field": "sz", "target_field": "n"}},
    ])
    got = {r.id: r.n for r in out.collect()}
    assert got == {1: 1024, 2: 2621440, 3: 10, 4: None, 5: 3 * 1024 ** 3}


def test_urldecode_and_html_strip(spark):
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame(
        [(1, "a%20b%3Dc", "<p>Hi &amp; <b>bye</b></p>")],
        ["id", "url", "html"],
    )
    out = run_pipeline(df, [
        {"urldecode": {"field": "url"}},
        {"html_strip": {"field": "html"}},
    ]).collect()[0]
    assert out.url == "a b=c"
    assert out.html == "Hi & bye"


def test_fingerprint_processor(spark):
    import hashlib

    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    df = spark.createDataFrame(
        [(1, "x", None)], "id INT, a STRING, b STRING"
    )
    out = run_pipeline(df, [
        {"fingerprint": {"fields": ["a", "b"], "method": "SHA-256"}},
    ]).collect()[0]
    assert out.fingerprint == hashlib.sha256(b"x|").hexdigest()


def test_user_agent_processor(spark):
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    uas = [
        (1, "Mozilla/5.0 (Windows NT 10.0; Win64) AppleWebKit/537.36 "
            "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
        (2, "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, "
            "like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91"),
        (3, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
            "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 "
            "Safari/605.1.15"),
        (4, "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) "
            "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 "
            "Mobile/15E148 Safari/604.1"),
        (5, "curl/8.4.0"),
    ]
    df = spark.createDataFrame(uas, ["id", "ua"])
    out = {r.id: r for r in run_pipeline(df, [
        {"user_agent": {"field": "ua", "target_field": "b"}},
    ]).collect()}
    assert (out[1].b_name, out[1].b_os, out[1].b_device) == (
        "Chrome", "Windows", "Desktop")
    assert out[1].b_version.startswith("120.")
    assert out[2].b_name == "Edge"          # Edge wins over its Chrome token
    assert (out[3].b_name, out[3].b_os) == ("Safari", "Mac OS X")
    assert (out[4].b_os, out[4].b_device) == ("iOS", "Mobile")
    assert (out[5].b_name, out[5].b_os) == ("Other", "Other")
