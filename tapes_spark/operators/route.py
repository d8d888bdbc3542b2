"""Route stage — rule-based fan-out to the per-sink tapes.

Rebuilds the reference's emit phase (SURVEY.md §3.2 step 5; tapes
pkg/derive/spans.go:265-314): one classified, enriched frame fans out to

  conversation_tape — one row per (conv_id, trace): previews + rollups
                      (span_turns analog, spans.sql:6-22)
  tool_tape         — one row per tool CALL with paired result, duration,
                      display name, error flag (tool spans analog)
  error_tape        — one row per extracted error signature: failing tool
                      results, error stop_reasons, BLOCK verdicts
                      (C4-style signature extraction, verdict.go:14-57)

Every input turn lands in exactly the sink set its classification demands
(routed-row equality — the pinned-count gate in tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapes_spark.operators import aggregate as agg
from tapes_spark.operators.enrich import enrich_tool
from tapes_spark.operators.joins import pair_tool_calls

PREVIEW_CHARS = 120  # session preview cap (reference session_reads.go:161)
RESPONSE_PREVIEW_CHARS = 280  # response preview cap (spans.go:1138)


def conversation_tape(enriched: DataFrame) -> DataFrame:
    """One row per (conv_id, trace) with previews + A1 rollups.

    user_prompt = the trace-opening genuine prompt (J14 ordering: genuine
    first, then earliest); response_preview = last main assistant text in
    the trace (A10 reverse scan).

    r6: ONE groupBy carries both the A1 rollup aggregates and the preview
    picks — trace_id is functionally dependent on (conv_id, trace_num),
    so the old rollup ⋈ previews pair aggregated the corpus twice and
    joined two identical groupings back together (an always-matching
    left join).  Fusing halves the aggregation passes and removes the
    join outright (guide §2.4).
    """
    fused = enriched.groupBy("conv_id", "trace_num", "trace_id").agg(
        *agg.trace_rollup_aggs(),
        F.min_by(
            F.when(
                (F.col("call_kind") == "prompt") & (F.col("text_norm") != ""),
                # text_preview is stored only where the preview policy
                # diverges from text_norm (tagged rows); elsewhere it is
                # NULL and the preview IS text_norm (see build_enriched)
                F.substring(
                    F.coalesce(F.col("text_preview"), F.col("text_norm")),
                    1,
                    PREVIEW_CHARS,
                ),
            ),
            F.when(
                (F.col("call_kind") == "prompt") & (F.col("text_norm") != ""),
                F.col("turn_idx"),
            ),
        ).alias("user_prompt"),
        F.max_by(
            F.when(
                (F.col("call_kind") == "main") & (F.col("text_norm") != ""),
                F.substring(F.col("text_norm"), 1, RESPONSE_PREVIEW_CHARS),
            ),
            F.when(
                (F.col("call_kind") == "main") & (F.col("text_norm") != ""),
                F.col("turn_idx"),
            ),
        ).alias("response_preview"),
        F.max((F.col("call_kind") == "compaction").cast("boolean")).alias(
            "has_compaction"
        ),
    )
    # column order preserved from the pre-fusion rollup ⋈ previews shape
    return fused.withColumn(
        "duration_ms",
        (F.col("ended_at").cast("double") - F.col("started_at").cast("double"))
        * 1000.0,
    ).select(
        "conv_id", "trace_num", "trace_id", "turn_count",
        "total_input_tokens", "total_output_tokens", "main_input_tokens",
        "main_output_tokens", "cache_read_tokens", "cache_creation_tokens",
        "total_cost_usd", "started_at", "ended_at", "tool_turns",
        "duration_ms", "user_prompt", "response_preview", "has_compaction",
        (F.col("trace_num") == 0).alias("synthetic"),
    )


def tool_tape(enriched: DataFrame, tool_dim_df: DataFrame | None = None) -> DataFrame:
    """One row per tool call, paired + display-normalized.

    ``tool_dim_df=None`` uses the static TOOL_DIM_ROWS as a literal-map
    lookup (no broadcast join; parity-gated vs the join path)."""
    from tapes_spark.operators.enrich import enrich_tool_static

    paired = pair_tool_calls(enriched)
    enriched_tools = (
        enrich_tool_static(paired)
        if tool_dim_df is None
        else enrich_tool(paired, tool_dim_df)
    )
    return enriched_tools.select(
        "conv_id",
        "turn_idx",
        "tool",
        "tool_display",
        "tool_category",
        "is_web_tool",
        "is_task_tool",
        "call_ts",
        "result_turn_idx",
        "result_ts",
        "result_text",
        "is_error",
        "duration_ms",
    )


ERROR_SOURCES = ("tool_error", "stop_error", "verdict_block")


def error_tape(enriched: DataFrame, tool_tape_df: DataFrame) -> DataFrame:
    """Union of the three error families, each with a normalized signature."""
    tool_errors = tool_tape_df.filter(F.col("is_error")).select(
        "conv_id",
        F.col("result_turn_idx").alias("turn_idx"),
        F.col("result_ts").alias("ts"),
        F.lit("tool_error").alias("source"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col("result_text"), r"^error: ([a-z][a-z0-9 _-]*)", 1),
                F.lit(""),
            ),
            F.lit("unknown-error"),
        ).alias("signature"),
        F.col("tool_display").alias("tool"),
    )
    stop_errors = enriched.filter(
        (F.col("role") == "assistant") & (F.col("stop_reason") == "error")
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        F.lit("stop_error").alias("source"),
        F.lit("stop_reason_error").alias("signature"),
        F.nullif(F.col("tool"), F.lit("")).alias("tool"),
    )
    verdict_blocks = enriched.filter(
        F.col("verdict_disposition") == "BLOCK"
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        F.lit("verdict_block").alias("source"),
        F.lit("permission_block").alias("signature"),
        F.lit(None).cast("string").alias("tool"),
    )
    return tool_errors.unionByName(stop_errors).unionByName(verdict_blocks)


def conv_aggregates(
    enriched: DataFrame, tool_tape_df: DataFrame
) -> DataFrame:
    """A6 rollup + A5 status + A3 kind counts + A2 model usage + A4 tasks,
    one row per conversation (the sessions-table analog).

    r6 note — a deeper fusion (ONE (conv_id, call_kind, model_norm) base
    aggregation feeding every branch, materialized via localCheckpoint)
    was built, parity-verified and MEASURED OUT: the sink is consumed via
    count()-shaped actions whose column pruning already strips the
    redundant aggregate work this shape pays for (old 1.14 s vs fused
    1.27-1.36 s per 1-core quarter-corpus job), and the checkpoint
    barrier that shares the base across branches also BLOCKS that
    pruning (6x regression).  Separate prunable aggregations win here."""
    from tapes_spark.operators.sessions import with_titles

    # the A6 base rollup and the A5 per-conv terminal picks are both
    # plain groupBy(conv_id) aggregates over enriched — fused into ONE
    # pass (the standalone conv_rollup / conv_status operators share the
    # same agg lists, so semantics are identical by construction); the
    # status ladder is then a projection over the joined tool counts
    # instead of a second corpus aggregation + join.
    fused = (
        agg._with_latency(enriched)
        .groupBy("conv_id")
        .agg(*agg.conv_rollup_aggs(), *agg.conv_status_aggs())
    )
    rollup_cols = [
        "conv_id", "turn_count", "trace_count", "total_input_tokens",
        "total_output_tokens", "total_cost_usd", "started_at",
        "last_seen_at", "latency_ms_min", "latency_ms_avg",
        "latency_ms_max", "tool_turn_count",
    ]
    rollup_status = (
        fused.join(agg.conv_derived_model(enriched), "conv_id", "left")
        .join(agg.tool_error_counts(tool_tape_df), "conv_id", "left")
        .fillna({"tool_result_count": 0, "tool_error_count": 0})
        .select(
            *rollup_cols,
            "derived_model",
            "tool_result_count",
            "tool_error_count",
            (F.col("has_git") == 1).alias("has_git_activity"),
            agg.status_ladder_col().alias("status"),
        )
    )
    kinds = agg.kind_counts(enriched)
    usage = agg.model_usage_folded(enriched)
    tasks = agg.tasks_fold(tool_tape_df)
    joined = (
        rollup_status.join(kinds, "conv_id", "left")
        .join(usage, "conv_id", "left")
        .join(tasks, "conv_id", "left")
        .withColumn("n_tasks", F.coalesce(F.col("n_tasks"), F.lit(0)))
        .withColumn("n_updates", F.coalesce(F.col("n_updates"), F.lit(0)))
        .withColumn("tasks_json", F.coalesce(F.col("tasks_json"), F.lit("[]")))
    )
    # derived-title fold + display-name ladder (fold.go:18-48)
    return with_titles(joined, enriched)
