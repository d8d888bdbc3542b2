"""Gates for the JSONL backfill source (S9), export sink (S7/J15),
keyset pagination (O3), and chain hashing (N7/P11)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tapes_spark.functions.hashing import chain_hashes, with_block_signature
from tapes_spark.operators.pagination import keyset_page, next_cursor
from tapes_spark.pipeline import run_pipeline
from tapes_spark.sources import export_conversations, read_transcript_jsonl


@pytest.fixture(scope="module")
def result(spark, transcripts):
    return run_pipeline(spark, transcripts)


class TestTranscriptJsonl:
    def test_reads_and_normalizes(self, spark, tmp_path):
        lines = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "hello", "ts": "2026-01-01T00:00:00Z"},
            # alias spellings: session_id/type/content/tool_name, no idx
            {"session_id": "c1", "type": "assistant", "content": "hi",
             "tool_name": "Bash", "timestamp": "2026-01-01T00:00:05Z"},
            {"conv_id": "c2", "idx": 0, "role": "user", "text": "x",
             "ts": "2026-01-01T00:01:00Z"},
        ]
        p = tmp_path / "t.jsonl"
        p.write_text("\n".join(json.dumps(x) for x in lines))
        df = read_transcript_jsonl(spark, str(p))
        rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
        assert set(rows) == {("c1", 0), ("c1", 1), ("c2", 0)}
        assert rows[("c1", 1)]["role"] == "assistant"
        assert rows[("c1", 1)]["tool"] == "Bash"
        assert rows[("c1", 1)]["text"] == "hi"

    def test_backfill_through_pipeline(self, spark, tmp_path):
        lines = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "do it", "ts": "2026-01-01T00:00:00Z"},
            {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
             "text": "done [model: gpt-5] [usage: in=10 out=5 cache_read=0 "
                     "cache_write=0] [stop_reason: end_turn]",
             "ts": "2026-01-01T00:00:09Z"},
        ]
        p = tmp_path / "b.jsonl"
        p.write_text("\n".join(json.dumps(x) for x in lines))
        df = read_transcript_jsonl(spark, str(p))
        res = run_pipeline(spark, df, persist=False, with_verdict_attach=False)
        agg = res.sinks["conv_aggregates"].collect()[0]
        assert agg["turn_count"] == 2
        assert agg["derived_model"] == "gpt-5"
        assert agg["status"] == "completed"


class TestExport:
    def test_one_line_per_conv_nested_ordered(self, spark, result):
        lines = export_conversations(
            result.enriched,
            result.sinks["conversation_tape"],
            result.sinks["conv_aggregates"],
        ).collect()
        assert len(lines) == 8
        by_conv = {}
        for r in lines:
            obj = json.loads(r["line"])
            by_conv[obj["conv_id"]] = obj
        conv = by_conv["conv-000000"]
        assert conv["status"] == "completed"
        traces = conv["traces"]
        assert [t["trace_num"] for t in traces] == sorted(
            t["trace_num"] for t in traces
        )
        for t in traces:
            idxs = [turn["turn_idx"] for turn in t["turns"]]
            assert idxs == sorted(idxs)
        # every valid turn appears exactly once across all traces
        n_turns = sum(len(t["turns"]) for t in traces)
        assert n_turns == conv["turn_count"]


class TestKeysetPagination:
    def test_pages_partition_the_table(self, spark, result):
        tape = result.sinks["conv_aggregates"]
        seen = []
        cursor = None
        while True:
            page = keyset_page(
                tape, "total_cost_usd", cursor=cursor, descending=True, limit=3
            ).collect()
            if not page:
                break
            seen.extend(r["conv_id"] for r in page)
            cursor = next_cursor(page, "total_cost_usd")
        assert len(seen) == 8
        assert len(set(seen)) == 8  # no dup, no skip
        costs = [
            r["total_cost_usd"]
            for r in tape.orderBy(
                F.col("total_cost_usd").desc(), F.col("conv_id").desc()
            ).collect()
        ]
        assert costs == sorted(costs, reverse=True)

    def test_sort_allowlist_enforced(self, spark, result):
        with pytest.raises(ValueError, match="allowlist"):
            keyset_page(result.sinks["conv_aggregates"], "evil; DROP TABLE")


class TestChainHash:
    def test_deterministic_and_linked(self, spark, result):
        chains = chain_hashes(result.enriched)
        rows = sorted(
            (r["turn_idx"], r["node_hash"], r["parent_hash"])
            for r in chains.filter(F.col("conv_id") == "conv-000000").collect()
        )
        # genesis parent empty; each node's parent is the previous spine
        assert rows[0][2] == ""
        for (i1, h1, _), (i2, _, p2) in zip(rows, rows[1:]):
            assert p2 == h1  # no injected turns in conv-000000's spine

    def test_rerun_identical(self, spark, result):
        a = chain_hashes(result.enriched).orderBy("conv_id", "turn_idx").collect()
        b = chain_hashes(result.enriched).orderBy("conv_id", "turn_idx").collect()
        assert a == b

    def test_cross_batch_carry(self, spark, result):
        """The mapInPandas fold must carry the spine across Arrow batch
        seams: shrinking the batch size so every conversation spans many
        batches must not change a single hash."""
        want = chain_hashes(result.enriched).orderBy(
            "conv_id", "turn_idx"
        ).collect()
        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key)
        try:
            spark.conf.set(key, "3")
            got = chain_hashes(result.enriched).orderBy(
                "conv_id", "turn_idx"
            ).collect()
        finally:
            spark.conf.set(key, old)
        assert got == want

    def test_signature_reflects_normalized_content(self, spark):
        df = spark.createDataFrame(
            [
                ("c", 0, "user", "same", ""),
                ("c", 1, "user", "same", ""),
                ("c", 2, "user", "different", ""),
            ],
            "conv_id string, turn_idx int, role string, text_norm string, tool string",
        )
        sigs = [r["block_sig"] for r in
                with_block_signature(df).orderBy("turn_idx").collect()]
        assert sigs[0] == sigs[1] != sigs[2]

    def test_unpersisted_union_lineage_still_clusters(self, spark, transcripts):
        """Regression: on the raw (unpersisted) split-union lineage the
        optimizer used to elide the fold's repartition, splitting a
        conversation across partitions and breaking the spine.  The
        xxhash64 clustering (functions/partitioning.py) must hold without
        any caching."""
        from tapes_spark.pipeline import build_enriched

        enriched, _ = build_enriched(spark, transcripts)
        chains = chain_hashes(enriched)
        rows = sorted(
            (r["turn_idx"], r["node_hash"], r["parent_hash"])
            for r in chains.filter(F.col("conv_id") == "conv-000000").collect()
        )
        assert rows[0][2] == ""
        for (i1, h1, _), (i2, _, p2) in zip(rows, rows[1:]):
            assert p2 == h1
