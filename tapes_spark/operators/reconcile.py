"""J6 — transcript <-> wire reconcile (set-similarity join).

Rebuilds the reference reconciler (SURVEY.md §2.5 J6; tapes
pkg/derive/reconcile.go:45-185): subagent transcript files must be
attached to the conversation (chain) they belong to.  Two rungs of the
degrade ladder:

  identity  — transcript carries the conversation id (thread_id ==
              agent_id in the reference): plain equi-join, always wins.
  agent_path— the Codex rung (pkg/derive/codex.go:93-117): a spawn-anchor
              side table maps agent_path -> (conv, spawn call); joined
              ONLY while a path maps to exactly one anchor AND the agent
              claims exactly one path — a reused path is ambiguous and
              refuses to guess.
  overlap   — otherwise, match by block-SIGNATURE set overlap: explode
              normalized turn signatures on both sides, equi-join on
              signature, count per (agent, conv), take the max-overlap
              conversation (>0) per agent with a deterministic tie-break.

Unmatched transcripts are reported, not dropped (the reference counts
them as the join-rate metric; corpus gate pins join >= 0.90).

Scale: the signature equi-join shuffles on a 64-char hash — uniformly
distributed, no skew; per-signature fan-out is bounded because signatures
are near-unique (dedup both sides first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tapes_spark.functions.hashing import block_signature_col
from tapes_spark.functions.normalize import normalized_text_col


def _signatures(df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id, block_sig) pairs with normalized text."""
    text_norm = (
        F.col("text_norm")
        if "text_norm" in df.columns
        else normalized_text_col(F.col("text"))
    )
    return df.select(
        F.col(id_col),
        block_signature_col(F.col("role"), text_norm, F.col("tool")).alias(
            "block_sig"
        ),
    ).distinct()


def reconcile_transcripts(
    conversations: DataFrame,
    transcripts: DataFrame,
    agent_col: str = "agent_id",
    spawn_anchors: DataFrame | None = None,
) -> DataFrame:
    """Match each transcript (grouped by *agent_col*) to a conversation.

    *conversations*: the main table (conv_id, turn_idx, role, text[, text_norm], tool).
    *transcripts*: side input with *agent_col* (+ optional ``claimed_conv_id``
    for the identity rung, optional ``agent_path`` for the Codex rung)
    and the same turn columns.
    *spawn_anchors*: optional (agent_path, conv_id) spawn-evidence table
    for the agent_path rung.

    Returns one row per agent:
      (agent_id, conv_id,
       matched_by in ('identity','agent_path','overlap',null), overlap)
    """
    conv_sigs = _signatures(conversations, "conv_id")
    agent_sigs = _signatures(transcripts, agent_col)
    agents = transcripts.select(F.col(agent_col)).distinct()

    # identity rung: claimed conv id that actually exists
    if "claimed_conv_id" in transcripts.columns:
        claims = transcripts.select(agent_col, "claimed_conv_id").distinct()
        valid_convs = conversations.select("conv_id").distinct()
        identity = (
            claims.join(
                valid_convs,
                claims["claimed_conv_id"] == valid_convs["conv_id"],
                "inner",
            )
            .select(
                F.col(agent_col),
                F.col("conv_id"),
                F.lit("identity").alias("matched_by"),
                F.lit(None).cast("long").alias("overlap"),
            )
            # an ambiguous agent (two different claims) falls through to
            # the overlap rung (the reference's ambiguity guard, J7)
            .withColumn(
                "n_claims",
                F.count("*").over(Window.partitionBy(agent_col)),
            )
            .filter(F.col("n_claims") == 1)
            .drop("n_claims")
        )
    else:
        identity = agents.limit(0).select(
            F.col(agent_col),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("string").alias("matched_by"),
            F.lit(None).cast("long").alias("overlap"),
        )

    unmatched_agents = agents.join(identity.select(agent_col), agent_col,
                                   "left_anti")

    # agent_path rung (codex.go:93-117): exact but ambiguous under path
    # reuse — join only while BOTH sides are unambiguous
    if spawn_anchors is not None and "agent_path" in transcripts.columns:
        unique_anchors = (
            spawn_anchors.groupBy("agent_path")
            .agg(
                F.count("*").alias("n_anchors"),
                F.first("conv_id").alias("conv_id"),
            )
            .filter(F.col("n_anchors") == 1)
            .drop("n_anchors")
        )
        path_claims = (
            transcripts.filter(F.col("agent_path").isNotNull())
            .select(agent_col, "agent_path")
            .distinct()
            .join(unmatched_agents, agent_col, "left_semi")
            # an agent claiming two paths is ambiguous too
            .withColumn(
                "n_paths", F.count("*").over(Window.partitionBy(agent_col))
            )
            .filter(F.col("n_paths") == 1)
            .drop("n_paths")
        )
        by_path = path_claims.join(unique_anchors, "agent_path").select(
            F.col(agent_col),
            F.col("conv_id"),
            F.lit("agent_path").alias("matched_by"),
            F.lit(None).cast("long").alias("overlap"),
        )
        identity = identity.unionByName(by_path)
        unmatched_agents = agents.join(
            identity.select(agent_col), agent_col, "left_anti"
        )

    overlap_counts = (
        agent_sigs.join(unmatched_agents, agent_col, "left_semi")
        .join(conv_sigs, "block_sig")
        .groupBy(agent_col, "conv_id")
        .agg(F.count("*").alias("overlap"))
    )
    w = Window.partitionBy(agent_col).orderBy(
        F.col("overlap").desc(), F.col("conv_id").asc()
    )
    overlap_best = (
        overlap_counts.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("overlap") > 0))
        .select(
            F.col(agent_col),
            F.col("conv_id"),
            F.lit("overlap").alias("matched_by"),
            F.col("overlap"),
        )
    )
    matched = identity.unionByName(overlap_best)
    return agents.join(matched, agent_col, "left")


def join_rate(reconciled: DataFrame) -> float:
    """matched / total — the reference's corpus gate pins this >= 0.90."""
    total = reconciled.count()
    if total == 0:
        return 1.0
    return reconciled.filter(F.col("matched_by").isNotNull()).count() / total


def reconcile_report(reconciled: DataFrame) -> dict:
    """Per-rung counts + the unanchored counter (the reference's
    ReconcileStats.CodexThreadsUnanchored analog, codex.go:115-117):
    an unanchored thread stays visible in its trace, never attached to
    a wrong target — reported, not dropped."""
    by_rung = {
        r["matched_by"]: r["count"]
        for r in reconciled.groupBy("matched_by").count().collect()
    }
    return {
        "matched_identity": by_rung.get("identity", 0),
        "matched_agent_path": by_rung.get("agent_path", 0),
        "matched_overlap": by_rung.get("overlap", 0),
        "threads_unanchored": by_rung.get(None, 0),
    }
