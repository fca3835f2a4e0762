"""Instruction/chat-data operators — the SFT side of the pipeline.

Instruction-tuning corpora arrive as per-example MESSAGE ARRAYS
(``array<struct<role, content>>``); before packing/tokenizing, a
pipeline must (a) validate structure — known roles, strict
user/assistant alternation after an optional system head, non-empty
contents — and (b) render each conversation through the model's chat
template into the single training string. Both are map-only
higher-order-function column expressions here (one pass, no explode,
no Python): at 100 TB each is a projection riding the scan.

Template: the ChatML shape (``<|im_start|>role\\ncontent<|im_end|>``
joined by newlines) — the de-facto open format; other templates are
the same fold with different delimiters, so the operator takes the
delimiters as parameters rather than hard-coding a zoo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KNOWN_ROLES = ("system", "user", "assistant")


def _roles_sql(messages: str) -> str:
    return f"transform({messages}, m -> m.role)"


def chat_validate(
    df: DataFrame,
    messages_col: str = "messages",
) -> DataFrame:
    """Append structure-validation columns: ``n_turns``; ``valid``
    true iff every role is known, every content is non-empty, at most
    one system message and only at position 0, and the non-system tail
    strictly alternates starting with ``user`` and ends on
    ``assistant`` (the trainable shape). One codegen'd pass over the
    array — the filter stage upstream of rendering/packing."""
    m = messages_col
    roles = _roles_sql(m)
    known = ", ".join(f"'{r}'" for r in _KNOWN_ROLES)
    tail = (
        f"CASE WHEN size({m}) > 0 "
        f"AND try_element_at({m}, 1).role = 'system' "
        f"THEN slice({roles}, 2, size({m}) - 1) ELSE {roles} END"
    )
    # strict alternation from 'user': role at tail position i (0-based)
    # must be user when i is even, assistant when i is odd
    alternates = (
        f"forall(zip_with({tail}, sequence(0, size({tail}) - 1),"
        " (r, i) -> r = IF(i % 2 = 0, 'user', 'assistant')),"
        " x -> x)"
    )
    valid = (
        f"size({m}) > 0"
        f" AND forall({roles}, r -> r IN ({known}))"
        f" AND forall({m}, msg -> msg.content IS NOT NULL"
        f" AND length(msg.content) > 0)"
        f" AND size(filter({roles}, r -> r = 'system'))"
        f" <= IF(try_element_at({m}, 1).role = 'system', 1, 0)"
        f" AND size({tail}) > 0"
        f" AND size({tail}) % 2 = 0"
        f" AND {alternates}"
    )
    return df.withColumn(
        "n_turns", F.expr(f"size({m})")
    ).withColumn("valid", F.coalesce(F.expr(valid), F.lit(False)))


def chat_render(
    df: DataFrame,
    messages_col: str = "messages",
    *,
    out_col: str = "text",
    start: str = "<|im_start|>",
    end: str = "<|im_end|>",
) -> DataFrame:
    """Render each message array through the ChatML-shaped template:
    ``{start}{role}\\n{content}{end}`` per message, newline-joined.
    Map-only fold (``array_join`` over a ``transform``), no explode —
    the projection that feeds tokenization/packing."""
    m = messages_col
    rendered = (
        f"array_join(transform({m},"
        f" msg -> concat('{start}', msg.role, '\\n',"
        f" msg.content, '{end}')), '\\n')"
    )
    return df.withColumn(out_col, F.expr(rendered))


def chat_stats(
    df: DataFrame,
    messages_col: str = "messages",
) -> DataFrame:
    """Per-conversation statistics for mixing/filtering decisions:
    turn counts per role and total content characters — one map-only
    projection (the SFT analogue of the pretraining corpus signals)."""
    m = messages_col
    roles = _roles_sql(m)

    def cnt(role: str) -> str:
        return f"size(filter({roles}, r -> r = '{role}'))"

    chars = (
        f"aggregate(transform({m}, msg -> length(msg.content)),"
        " CAST(0 AS BIGINT), (a, x) -> a + coalesce(x, 0))"
    )
    return df.select(
        "*",
        F.expr(cnt("system")).alias("n_system"),
        F.expr(cnt("user")).alias("n_user"),
        F.expr(cnt("assistant")).alias("n_assistant"),
        F.expr(chars).alias("n_chars"),
    )
