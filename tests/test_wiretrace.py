"""S8 wire-trace backfill gates: the reference's own PUBLIC recordings
(fixtures/recordings/claude-*/turn-*/) must load, gunzip, reduce and
derive into non-empty tapes with pinned counts — plus the replay skip
ladder over synthetic edge-case bundles (reference
pkg/backfill/wiretrace.go:219-339)."""

from __future__ import annotations

import base64
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from tapes_spark.sources.sse import encode_sse_message
from tapes_spark.sources.wiretrace import (
    read_wire_bundles,
    wire_trace_transcripts,
)

RECORDINGS = "/root/reference/fixtures/recordings/claude-20260727-019fa57e"
SESSION_ID = "ac9b5a71-50d4-47c2-b771-4d5c3e96d899"

needs_recordings = pytest.mark.skipif(
    not os.path.isdir(RECORDINGS), reason="reference recordings not present"
)


@needs_recordings
class TestPublicRecordings:
    def test_bundles_load_and_decode(self, spark):
        b = read_wire_bundles(spark, RECORDINGS)
        rows = b.orderBy("turn_seq").collect()
        assert len(rows) == 17
        assert [r["turn_seq"] for r in rows] == list(range(8, 25))
        assert all(r["skip_reason"] is None for r in rows)
        assert all(r["session_id"] == SESSION_ID for r in rows)
        assert {r["model"] for r in rows} == {"claude-sonnet-4-6"}
        # every bundle's gzip'd stream inflated to real SSE text
        assert all(
            r["sse"] is not None and r["sse"].startswith("event: ")
            for r in rows
        )
        assert all(r["ts_request"] is not None for r in rows)
        assert all(r["url_path"].endswith("/v1/messages") for r in rows)

    def test_recordings_reduce_to_transcripts(self, spark):
        tx = wire_trace_transcripts(spark, RECORDINGS)
        rows = tx.orderBy("turn_idx").collect()
        assert len(rows) == 17
        assert {r["conv_id"] for r in rows} == {SESSION_ID}
        # pinned reduction facts for this recording: 14 tool-use turns
        # across these tools, 4,935 chars of assistant text, capture ts
        # present on every turn (P12)
        assert sum(1 for r in rows if r["tool"] != "") == 14
        assert sorted({r["tool"] for r in rows}) == [
            "", "Agent", "Bash", "Edit", "Read", "Skill",
            "TaskCreate", "TaskUpdate", "Write",
        ]
        assert sum(len(r["text"]) for r in rows) == 4935
        assert all(r["ts"] is not None for r in rows)

    def test_recordings_derive_through_pipeline(self, spark):
        from tapes_spark.pipeline import run_pipeline

        tx = wire_trace_transcripts(spark, RECORDINGS)
        res = run_pipeline(spark, tx, persist=False)
        got = {k: v.count() for k, v in res.sinks.items()}
        assert got["conversation_tape"] == 1  # 1 assistant-only trace
        assert got["tool_tape"] == 14
        assert got["error_tape"] == 0
        assert got["conv_aggregates"] == 1
        assert got["chain_tape"] == 17
        assert got["link_tape"] == 14


class TestReplaySkipLadder:
    def _write_bundle(
        self,
        root,
        name: str,
        url: str = "http://gw.localhost/x/anthropic/v1/messages?beta=true",
        body: dict | None = None,
        truncated: bool = False,
        sse_text: str | None = "event: ping\ndata: {\"type\":\"ping\"}\n\n",
        gzip_sse: bool = True,
        session_id: str = "sess-1",
    ):
        d = root / name
        d.mkdir(parents=True)
        body_bytes = (
            json.dumps(body).encode() if body is not None else b""
        )
        req = {
            "method": "POST",
            "url": url,
            "headers": [
                ["content-type", "application/json"],
                ["X-Tapes-Harness-Session-Id", session_id],
            ],
            "body_b64": base64.b64encode(body_bytes).decode(),
            "body_truncated": truncated,
            "ts": "2026-07-27T21:32:31.641067Z",
        }
        (d / "request.json").write_text(json.dumps(req))
        (d / "meta.json").write_text(json.dumps({
            "status": 200,
            "content_type": "text/event-stream; charset=utf-8",
            "content_encoding": "gzip" if gzip_sse else "",
            "response_bytes": 1,
            "duration_ms": 1.0,
        }))
        if sse_text is not None:
            raw = sse_text.encode()
            (d / "response.sse").write_bytes(
                gzip.compress(raw) if gzip_sse else raw
            )

    def test_skip_reasons_and_missing_sse(self, spark, tmp_path):
        body = {"model": "m", "stream": True}
        self._write_bundle(tmp_path, "turn-001-00000001", body=body)
        self._write_bundle(
            tmp_path, "turn-002-00000002", body=body,
            url="http://gw.localhost/x/anthropic/v1/messages/count_tokens",
        )
        self._write_bundle(
            tmp_path, "turn-003-00000003", body=body, truncated=True
        )
        self._write_bundle(tmp_path, "turn-004-00000004", body=None)
        # a call that never completed: bundle with NO response.sse
        self._write_bundle(
            tmp_path, "turn-005-00000005", body=body, sse_text=None
        )
        # plain (non-gzip) stream must pass through undecoded
        self._write_bundle(
            tmp_path, "turn-006-00000006", body=body, gzip_sse=False,
            sse_text=encode_sse_message("plain text reply", "m1"),
        )
        b = read_wire_bundles(spark, str(tmp_path))
        got = {
            r["turn_seq"]: (r["skip_reason"], r["sse"] is not None)
            for r in b.collect()
        }
        assert got == {
            1: (None, True),
            2: ("not_messages_call", True),
            3: ("body_truncated", True),
            4: ("empty_body", True),
            5: (None, False),
            6: (None, True),
        }
        tx = wire_trace_transcripts(spark, str(tmp_path))
        rows = {r["turn_idx"]: r for r in tx.collect()}
        # ping-only stream (1) reduces to an empty-text turn; skipped and
        # sse-less bundles produce NO row; plain stream (6) reduces fully
        assert set(rows) == {1, 6}
        assert rows[6]["text"] == "plain text reply"
        assert rows[6]["conv_id"] == "sess-1"
