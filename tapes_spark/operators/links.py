"""Span-links tape — the dataflow graph between turn-level spans.

Rebuilds the reference's span_links table and link emission (tapes
pkg/derive/spans.go:51-55, 480-548; migrations/1781230000_span_model.up.sql:72-88)
over the flattened transcript shape, where the llm span and the tool span
it emits share a turn_idx and are distinguished by span kind:

  emits           llm output -> tool input: one per tool call
                  (spans.go:524-546).
  feeds           tool output -> the NEXT llm call's input: one per paired
                  result that a later assistant turn actually consumed
                  (spans.go:505-512) — a result with no later llm call
                  never links.
  verdict         shadow (check) llm -> the tool span it judged: straight
                  from the J3 attachment sink (spans.go:444-450).
  compaction-seam compaction llm -> the next trace's first llm in the same
                  conversation (spans.go:412-418).  The seam source is
                  overwritten by later compactions ("last one arms it"),
                  so only the LAST compaction turn of a trace links.
  rejoin          subagent root -> the spawning Task tool span
                  (spans.go:393-397), via the J6 reconcile match plus an
                  as-of pick of the latest preceding Task call.

Every link id is deterministic (sha256 over the canonical link tuple —
D2), so the tape is idempotently re-derivable like every other sink.

Scale: emits/verdict are narrow projections; feeds and the seam use the
conversation-clustered exchange every other window shares (keys start
with conv_id); nothing shuffles wider than its output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LINK_KINDS = (
    "emits",
    "feeds",
    "verdict",
    "compaction-seam",
    "rejoin",
    "orphan-shadow",
    "orphan-thread",
)

_LINK_COLS = (
    "conv_id",
    "kind",
    "from_kind",
    "from_turn_idx",
    "from_io",
    "to_kind",
    "to_turn_idx",
    "to_io",
)


def _with_link_id(df: DataFrame) -> DataFrame:
    """Uniform link schema + deterministic id.

    Every link frame carries an ``agent_id`` column (NULL for in-conv
    links) so all LINK_KINDS union into one tape.  The id hashes the
    canonical tuple + agent_id; ``concat_ws`` skips NULLs, so in-conv
    link ids are byte-identical to the pre-agent_id formula."""
    if "agent_id" not in df.columns:
        df = df.withColumn("agent_id", F.lit(None).cast("string"))
    return df.withColumn(
        "link_id",
        F.sha2(
            F.concat_ws(
                "|",
                *[F.col(c).cast("string") for c in _LINK_COLS],
                F.col("agent_id"),
            ),
            256,
        ),
    )


def emits_links(tool_tape: DataFrame) -> DataFrame:
    """One emits link per tool call: the emitting llm span and the tool
    span share the call's turn_idx in the flattened shape."""
    return _with_link_id(
        tool_tape.select(
            "conv_id",
            F.lit("emits").alias("kind"),
            F.lit("llm").alias("from_kind"),
            F.col("turn_idx").alias("from_turn_idx"),
            F.lit("output").alias("from_io"),
            F.lit("tool").alias("to_kind"),
            F.col("turn_idx").alias("to_turn_idx"),
            F.lit("input").alias("to_io"),
        )
    )


def feeds_links(enriched: DataFrame, tool_tape: DataFrame) -> DataFrame:
    """Tool result -> the next llm (assistant) turn that consumed it.

    Union the llm turns with the result rows on one per-conv timeline and
    take, for each result, the first llm turn strictly after it (window
    first over the following frame — no range join)."""
    llm_marks = enriched.filter(F.col("role") == "assistant").select(
        "conv_id",
        F.col("turn_idx").alias("idx"),
        F.lit(None).cast("int").alias("call_turn_idx"),
    )
    result_marks = tool_tape.filter(F.col("result_turn_idx").isNotNull()).select(
        "conv_id",
        F.col("result_turn_idx").alias("idx"),
        F.col("turn_idx").alias("call_turn_idx"),
    )
    # a result and an llm turn can never share an idx in the flattened
    # shape (a result turn is role=tool), so "first llm strictly after
    # this result" = "min llm idx among rows later in the timeline".
    # Expressed as a REVERSE running aggregate: ordered by idx DESC with
    # an unbounded-preceding-to-(-1) frame, which Spark computes
    # incrementally in O(n) per partition.  The previous form — first()
    # over rowsBetween(1, unboundedFollowing) — re-scans the frame per
    # row, O(n^2) per conversation: measured 252 s for ONE 10^5-turn
    # conversation (the giant-conv skew gate caught it) vs ~1 s now.
    timeline = llm_marks.unionByName(result_marks)
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("idx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    next_llm = F.min(
        F.when(F.col("call_turn_idx").isNull(), F.col("idx"))
    ).over(w)
    return _with_link_id(
        timeline.withColumn("next_llm_idx", next_llm)
        .filter(F.col("call_turn_idx").isNotNull() & F.col("next_llm_idx").isNotNull())
        .select(
            "conv_id",
            F.lit("feeds").alias("kind"),
            F.lit("tool").alias("from_kind"),
            F.col("call_turn_idx").alias("from_turn_idx"),
            F.lit("output").alias("from_io"),
            F.lit("llm").alias("to_kind"),
            F.col("next_llm_idx").alias("to_turn_idx"),
            F.lit("input").alias("to_io"),
        )
    )


def verdict_links(verdict_attachments: DataFrame) -> DataFrame:
    """Shadow llm -> judged tool span, from the J3 attachment sink."""
    return _with_link_id(
        verdict_attachments.filter(F.col("tool_turn_idx").isNotNull()).select(
            "conv_id",
            F.lit("verdict").alias("kind"),
            F.lit("llm").alias("from_kind"),
            F.col("check_turn_idx").alias("from_turn_idx"),
            F.lit("output").alias("from_io"),
            F.lit("tool").alias("to_kind"),
            F.col("tool_turn_idx").alias("to_turn_idx"),
            F.lit("input").alias("to_io"),
        )
    )


def orphan_shadow_links(
    enriched: DataFrame, verdict_attachments: DataFrame
) -> DataFrame:
    """Unattached shadow calls as QUERYABLE rows, not just a counter.

    The reference parents an unanchored shadow to its live trace's root
    span and bumps OrphanShadow (spans.go:425-441; the corpus pins
    exactly 5, spans_corpus_test.go:84-87).  Here: a check turn whose
    matcher found no tool anchor emits kind ``orphan-shadow`` from the
    check llm span to the ROOT llm turn of the check's own trace — an
    auditor can now list them from link_tape instead of only reading the
    derive report's count."""
    unattached = verdict_attachments.filter(
        F.col("tool_turn_idx").isNull()
    ).select("conv_id", "check_turn_idx")
    check_traces = enriched.select(
        "conv_id",
        F.col("turn_idx").alias("check_turn_idx"),
        "trace_num",
    )
    roots = enriched.groupBy("conv_id", "trace_num").agg(
        F.min("turn_idx").alias("root_turn_idx")
    )
    return _with_link_id(
        unattached.join(check_traces, ["conv_id", "check_turn_idx"])
        .join(roots, ["conv_id", "trace_num"])
        .select(
            "conv_id",
            F.lit("orphan-shadow").alias("kind"),
            F.lit("llm").alias("from_kind"),
            F.col("check_turn_idx").alias("from_turn_idx"),
            F.lit("output").alias("from_io"),
            F.lit("llm").alias("to_kind"),
            F.col("root_turn_idx").alias("to_turn_idx"),
            F.lit("input").alias("to_io"),
        )
    )


def orphan_thread_links(
    reconciled: DataFrame, agent_col: str = "agent_id"
) -> DataFrame:
    """Unanchored subagent threads as rows (the reference's
    CodexThreadsUnanchored stays a counter in reconcile_report; this
    materializes each as kind ``orphan-thread`` with a null target so
    the thread is listable next to the rejoin links it failed to earn —
    never attached to a wrong conversation, codex.go:115-117)."""
    # agent id is the identity (conv/turn fields are all null here);
    # the shared _with_link_id includes it in the hash
    return _with_link_id(
        reconciled.filter(F.col("matched_by").isNull())
        .select(
            F.lit(None).cast("string").alias("conv_id"),
            F.lit("orphan-thread").alias("kind"),
            F.lit("agent").alias("from_kind"),
            F.lit(None).cast("int").alias("from_turn_idx"),
            F.lit("output").alias("from_io"),
            F.lit(None).cast("string").alias("to_kind"),
            F.lit(None).cast("int").alias("to_turn_idx"),
            F.lit(None).cast("string").alias("to_io"),
            F.col(agent_col).cast("string").alias("agent_id"),
        )
    )


def compaction_seam_links(enriched: DataFrame) -> DataFrame:
    """LAST compaction llm of a trace -> the first llm of the next trace.

    Requires trace_num (with_traces).  A compaction with no later trace
    (or a next trace with no llm turn) arms a seam that never fires —
    no link, same as the reference."""
    compactions = (
        enriched.filter(F.col("call_kind") == "compaction")
        .groupBy("conv_id", "trace_num")
        .agg(F.max("turn_idx").alias("from_turn_idx"))
    )
    first_llm = (
        enriched.filter(F.col("role") == "assistant")
        .groupBy("conv_id", "trace_num")
        .agg(F.min("turn_idx").alias("to_turn_idx"))
        .withColumn("prev_trace", F.col("trace_num") - 1)
    )
    return _with_link_id(
        compactions.join(
            first_llm,
            (compactions["conv_id"] == first_llm["conv_id"])
            & (compactions["trace_num"] == first_llm["prev_trace"]),
        )
        .select(
            compactions["conv_id"],
            F.lit("compaction-seam").alias("kind"),
            F.lit("llm").alias("from_kind"),
            F.col("from_turn_idx"),
            F.lit("output").alias("from_io"),
            F.lit("llm").alias("to_kind"),
            F.col("to_turn_idx"),
            F.lit("input").alias("to_io"),
        )
    )


def rejoin_links(
    reconciled: DataFrame,
    transcripts: DataFrame,
    tool_tape: DataFrame,
    agent_col: str = "agent_id",
) -> DataFrame:
    """Subagent -> spawning Task tool span (spans.go:393-397).

    *reconciled* is the J6 output (agent_id -> conv_id); the spawning
    call is the latest Task-category tool call at or before the child's
    first captured turn (as-of pick, deterministic tie-break on
    turn_idx).  Conv-unmatched agents emit nothing (they are the
    reference's orphan counter, reported by the reconcile report)."""
    child_start = transcripts.groupBy(agent_col).agg(
        F.min("ts").alias("child_start_ts")
    )
    matched = (
        reconciled.filter(F.col("conv_id").isNotNull())
        .select(agent_col, "conv_id")
        .join(child_start, agent_col)
    )
    task_calls = tool_tape.filter(F.col("is_task_tool")).select(
        "conv_id",
        F.col("turn_idx").alias("task_turn_idx"),
        F.col("call_ts"),
    )
    w = Window.partitionBy(agent_col).orderBy(
        F.col("call_ts").desc(), F.col("task_turn_idx").desc()
    )
    best = (
        matched.join(task_calls, "conv_id")
        .filter(F.col("call_ts") <= F.col("child_start_ts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    # the agent is part of the link identity (two subagents may rejoin
    # the same Task span); _with_link_id hashes it with the tuple
    return _with_link_id(
        best.select(
            "conv_id",
            F.lit("rejoin").alias("kind"),
            F.lit("agent").alias("from_kind"),
            F.lit(None).cast("int").alias("from_turn_idx"),
            F.lit("output").alias("from_io"),
            F.lit("tool").alias("to_kind"),
            F.col("task_turn_idx").alias("to_turn_idx"),
            F.lit("input").alias("to_io"),
            F.col(agent_col).cast("string").alias("agent_id"),
        )
    )


def with_spawn_labels(
    tool_tape: DataFrame,
    rejoins: DataFrame,
    transcripts: DataFrame | None = None,
    agent_col: str = "agent_id",
) -> DataFrame:
    """J12: fold the reconciler's per-spawn labels onto the spawning
    Task tool rows (reference spawnToolInput, spans.go:553-575: the
    console's subagent panel reads subagent_type/description from the
    spawn call's input; reconcile labels fill them at derive time).

    *rejoins* is :func:`rejoin_links` output; *transcripts* optionally
    carries ``agent_type`` / ``description`` columns (the anchor-row
    labels) keyed by *agent_col*.
    """
    labels = rejoins.select(
        "conv_id",
        F.col("to_turn_idx").alias("turn_idx"),
        "agent_id",
    )
    if transcripts is not None and "agent_type" in transcripts.columns:
        extra = transcripts.select(
            F.col(agent_col).alias("agent_id"),
            "agent_type",
            *(
                ["description"]
                if "description" in transcripts.columns
                else []
            ),
        ).distinct()
        labels = labels.join(extra, "agent_id", "left")
    if "agent_type" not in labels.columns:
        labels = labels.withColumn(
            "agent_type", F.lit(None).cast("string")
        )
    if "description" not in labels.columns:
        labels = labels.withColumn(
            "description", F.lit(None).cast("string")
        )
    return tool_tape.join(
        F.broadcast(
            labels.select(
                "conv_id", "turn_idx",
                F.col("agent_id").alias("spawned_agent_id"),
                F.col("agent_type").alias("spawned_agent_type"),
                F.col("description").alias("spawned_description"),
            )
        ),
        ["conv_id", "turn_idx"],
        "left",
    )


def link_tape(
    enriched: DataFrame,
    tool_tape: DataFrame,
    verdict_attachments: DataFrame | None = None,
) -> DataFrame:
    """The in-conversation link tape (emits + feeds + compaction-seam
    [+ verdict]).  Rejoin links need the subagent side inputs and are
    produced by :func:`rejoin_links`."""
    links = emits_links(tool_tape).unionByName(
        feeds_links(enriched, tool_tape)
    ).unionByName(compaction_seam_links(enriched))
    if verdict_attachments is not None:
        links = links.unionByName(
            verdict_links(verdict_attachments)
        ).unionByName(orphan_shadow_links(enriched, verdict_attachments))
    return links


def full_link_tape(
    in_conv_links: DataFrame,
    rejoins: DataFrame | None = None,
    orphan_threads: DataFrame | None = None,
) -> DataFrame:
    """ALL declared LINK_KINDS as one tape: the in-conversation links
    (:func:`link_tape`) plus the agent-side kinds.  Every frame shares
    the uniform schema (_LINK_COLS + agent_id + link_id), so the closed
    LINK_KINDS vocabulary is fully representable in one sink — an
    'orphan-thread' row is listable next to the rejoin it failed to earn
    (codex.go:115-117) instead of living in a schema of its own."""
    out = in_conv_links
    if rejoins is not None:
        out = out.unionByName(rejoins)
    if orphan_threads is not None:
        out = out.unionByName(orphan_threads)
    return out
