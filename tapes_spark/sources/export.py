"""JSONL export sink — the nested composition join (SURVEY.md §2.1 S7,
§2.5 J15; tapes api/sessions_handlers.go:811-919, queries/spans.sql:151-204).

One JSON line per conversation: conversation header -> ordered traces ->
each trace's ordered turns.  Two levels of groupBy + collect_list(struct)
with sort_array on explicit ordinals (Spark sorts aren't stable across
shuffles, so every level carries its own sort key — the O2 lesson).

The 30-day window clamp mirrors the reference's export guard ("never ...
stream an org's entire history", sessions_handlers.go:825-842): callers
asking for more get the clamp applied and LOGGED, never silently.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

EXPORT_WINDOW_CLAMP_DAYS = 30


def export_conversations(
    enriched: DataFrame,
    conversation_tape: DataFrame,
    conv_aggregates: DataFrame,
    since: str | None = None,
    until: str | None = None,
) -> DataFrame:
    """Returns a one-string-column frame (``line``) ready for
    ``df.write.text`` — each line a self-contained conversation export.
    """
    turns = enriched.select(
        "conv_id",
        "trace_num",
        "turn_idx",
        "role",
        F.col("text_norm").alias("text"),
        "tool",
        "call_kind",
        "ts",
        "model_norm",
        "input_tokens",
        "output_tokens",
        "cost_usd",
    )
    if since and until:
        s = F.lit(since).cast("timestamp")
        u = F.lit(until).cast("timestamp")
        clamped = F.least(u, s + F.expr(f"INTERVAL {EXPORT_WINDOW_CLAMP_DAYS} DAYS"))
        turns = turns.filter((F.col("ts") >= s) & (F.col("ts") < clamped))
        log.info(
            "export window [%s, %s) clamped to %s days max", since, until,
            EXPORT_WINDOW_CLAMP_DAYS,
        )

    # level 1: turns -> per-trace ordered arrays
    per_trace_turns = turns.groupBy("conv_id", "trace_num").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "turn_idx", "role", "text", "tool", "call_kind", "ts",
                    "model_norm", "input_tokens", "output_tokens", "cost_usd",
                )
            )
        ).alias("turns")
    )
    trace_level = conversation_tape.join(
        per_trace_turns, ["conv_id", "trace_num"], "left"
    ).select(
        "conv_id",
        F.struct(
            "trace_num",
            "trace_id",
            "user_prompt",
            "response_preview",
            "turn_count",
            "total_input_tokens",
            "total_output_tokens",
            "total_cost_usd",
            "started_at",
            "ended_at",
            "synthetic",
            "turns",
        ).alias("trace"),
    )
    # level 2: traces -> per-conversation ordered array
    per_conv = trace_level.groupBy("conv_id").agg(
        F.sort_array(F.collect_list("trace")).alias("traces")
    )
    composed = conv_aggregates.join(per_conv, "conv_id", "left").select(
        F.to_json(
            F.struct(
                "conv_id",
                "status",
                "turn_count",
                "trace_count",
                "total_input_tokens",
                "total_output_tokens",
                "total_cost_usd",
                "derived_model",
                "started_at",
                "last_seen_at",
                "traces",
            )
        ).alias("line")
    )
    return composed
