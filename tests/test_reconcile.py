"""J6 reconcile gates: identity rung, overlap rung, ambiguity fallthrough,
unmatched reporting, join-rate metric (reference pins >= 0.90)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators.reconcile import join_rate, reconcile_transcripts


@pytest.fixture(scope="module")
def side_transcripts(spark, transcripts):
    """Synthetic subagent transcripts: per source conv, a subset of its
    turns under an agent id; one carries a valid claimed_conv_id
    (identity rung), the rest rely on signature overlap."""
    base = transcripts.filter(F.col("turn_idx") < 6)
    agents = base.filter(
        F.col("conv_id").isin("conv-000000", "conv-000002", "conv-000005")
    ).withColumn(
        "agent_id", F.concat(F.lit("agent-"), F.col("conv_id"))
    )
    with_claim = agents.withColumn(
        "claimed_conv_id",
        F.when(F.col("conv_id") == "conv-000000", F.col("conv_id")),
    )
    # strip the true conv_id so only the claim / signatures can match
    return with_claim.drop("conv_id")


def test_identity_and_overlap_rungs(spark, transcripts, side_transcripts):
    rec = reconcile_transcripts(transcripts, side_transcripts)
    rows = {r["agent_id"]: r for r in rec.collect()}
    assert rows["agent-conv-000000"]["matched_by"] == "identity"
    assert rows["agent-conv-000000"]["conv_id"] == "conv-000000"
    for agent, conv in (
        ("agent-conv-000002", "conv-000002"),
        ("agent-conv-000005", "conv-000005"),
    ):
        assert rows[agent]["matched_by"] == "overlap", agent
        assert rows[agent]["conv_id"] == conv
        assert rows[agent]["overlap"] >= 1


def test_unmatched_agent_reported_not_dropped(spark, transcripts):
    alien = spark.createDataFrame(
        [("agent-x", 0, "user", "text that matches nothing at all zzz", "",
          None)],
        "agent_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    rec = reconcile_transcripts(transcripts, alien)
    rows = rec.collect()
    assert len(rows) == 1
    assert rows[0]["matched_by"] is None
    assert join_rate(rec) == 0.0


def test_join_rate(spark, transcripts, side_transcripts):
    rec = reconcile_transcripts(transcripts, side_transcripts)
    assert join_rate(rec) >= 0.9  # the reference's corpus gate


def test_ambiguous_claim_falls_through_to_overlap(spark, transcripts):
    # one agent, two different claimed conv ids -> identity rung skipped,
    # overlap still finds the right conversation
    rows = (
        transcripts.filter(
            (F.col("conv_id") == "conv-000001") & (F.col("turn_idx") < 4)
        )
        .withColumn("agent_id", F.lit("agent-dup"))
        .withColumn(
            "claimed_conv_id",
            F.when(F.col("turn_idx") == 0, "conv-000001").otherwise(
                "conv-000002"
            ),
        )
        .drop("conv_id")
    )
    rec = reconcile_transcripts(transcripts, rows)
    got = rec.collect()[0]
    assert got["matched_by"] == "overlap"
    assert got["conv_id"] == "conv-000001"


class TestAgentPathRung:
    """Codex degrade ladder (codex.go:93-117): agent_path joins only
    while unambiguous; unanchored threads are counted, never guessed."""

    def _alien(self, spark, agent, path):
        return spark.createDataFrame(
            [(agent, path, 0, "user", "no signature overlap zzz qqq", "",
              None)],
            "agent_id string, agent_path string, turn_idx int, role string,"
            " text string, tool string, ts timestamp",
        )

    def test_unique_path_anchors(self, spark, transcripts):
        anchors = spark.createDataFrame(
            [("/agents/reviewer", "conv-000003")],
            "agent_path string, conv_id string",
        )
        rec = reconcile_transcripts(
            transcripts, self._alien(spark, "agent-p", "/agents/reviewer"),
            spawn_anchors=anchors,
        )
        row = rec.collect()[0]
        assert row["matched_by"] == "agent_path"
        assert row["conv_id"] == "conv-000003"

    def test_reused_path_refuses_to_guess(self, spark, transcripts):
        from tapes_spark.operators.reconcile import reconcile_report

        anchors = spark.createDataFrame(
            [("/agents/reviewer", "conv-000003"),
             ("/agents/reviewer", "conv-000004")],
            "agent_path string, conv_id string",
        )
        rec = reconcile_transcripts(
            transcripts, self._alien(spark, "agent-p", "/agents/reviewer"),
            spawn_anchors=anchors,
        )
        row = rec.collect()[0]
        assert row["matched_by"] is None and row["conv_id"] is None
        assert reconcile_report(rec)["threads_unanchored"] == 1

    def test_agent_claiming_two_paths_is_ambiguous(self, spark, transcripts):
        anchors = spark.createDataFrame(
            [("/a", "conv-000003"), ("/b", "conv-000004")],
            "agent_path string, conv_id string",
        )
        two = self._alien(spark, "agent-p", "/a").unionByName(
            self._alien(spark, "agent-p", "/b")
        )
        rec = reconcile_transcripts(transcripts, two, spawn_anchors=anchors)
        assert rec.collect()[0]["matched_by"] is None

    def test_identity_beats_agent_path(self, spark, transcripts):
        anchors = spark.createDataFrame(
            [("/a", "conv-000004")], "agent_path string, conv_id string"
        )
        claimed = self._alien(spark, "agent-p", "/a").withColumn(
            "claimed_conv_id", F.lit("conv-000002")
        )
        rec = reconcile_transcripts(transcripts, claimed,
                                    spawn_anchors=anchors)
        row = rec.collect()[0]
        assert row["matched_by"] == "identity"
        assert row["conv_id"] == "conv-000002"
