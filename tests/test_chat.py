"""Instruction/chat-data operators: validation truth table, template
rendering, per-role stats; all map-only (plan-asserted)."""

from __future__ import annotations

from harmonize_search_analyze_spark.operators.chat import (
    chat_render,
    chat_stats,
    chat_validate,
)

SCHEMA = "id int, messages array<struct<role string, content string>>"


def test_chat_validate_truth_table(spark):
    rows = [
        # valid: optional system head + strict user/assistant pairs
        (1, [("system", "s"), ("user", "q"), ("assistant", "a")]),
        (2, [("user", "q1"), ("assistant", "a1"),
             ("user", "q2"), ("assistant", "a2")]),
        # invalid shapes
        (3, [("assistant", "starts wrong")]),
        (4, [("user", "dangling")]),              # ends on user
        (5, [("user", ""), ("assistant", "x")]),  # empty content
        (6, [("user", "x"), ("tool", "t"),
             ("assistant", "y")]),                # unknown role
        (7, [("user", "x"), ("system", "mid"),
             ("assistant", "y")]),                # system not at head
        (8, [("system", "s")]),                   # no trainable tail
        (9, []),                                  # empty
        (10, [("user", "x"), ("user", "x2"),
              ("assistant", "y")]),               # broken alternation
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.id: r.valid for r in chat_validate(df).collect()}
    assert got == {
        1: True, 2: True, 3: False, 4: False, 5: False,
        6: False, 7: False, 8: False, 9: False, 10: False,
    }


def test_chat_render_and_stats_map_only(spark):
    from harmonize_search_analyze_spark.plans.lint import lint_plan

    df = spark.createDataFrame(
        [(1, [("user", "hi"), ("assistant", "yo")])], SCHEMA
    )
    out = chat_stats(chat_render(chat_validate(df)), "messages")
    row = out.collect()[0]
    assert row.text == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nyo<|im_end|>"
    )
    assert (row.n_user, row.n_assistant, row.n_system) == (1, 1, 0)
    assert row.n_chars == 4 and row.n_turns == 2 and row.valid
    # the whole chain is one map-only projection
    assert lint_plan(out) == []
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_chat_render_custom_delimiters(spark):
    df = spark.createDataFrame(
        [(1, [("user", "q"), ("assistant", "a")])], SCHEMA
    )
    out = chat_render(df, "messages", start="[", end="]").collect()[0]
    assert out.text == "[user\nq]\n[assistant\na]"
