"""P3 SSE reducer gates: the reducer/one-shot byte-equality contract
(reference pkg/capture/anthropic.go:57-224) over wire-shaped fixtures —
reduced text must equal the source text EXACTLY, and the reduced stream
must feed the existing transcript backfill path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.sources.sse import (
    encode_responses_sse,
    encode_sse_message,
    make_responses_recordings,
    make_sse_recordings,
    reduce_responses_oneshot,
    reduce_sse,
    reduce_sse_openai,
    sse_events,
    sse_to_transcripts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestByteEquality:
    def test_roundtrip_over_documents(self, spark, docs):
        """Chunked wire deltas re-assemble to the EXACT source text for
        every document in the corpus (whitespace runs, punctuation,
        multi-byte content included)."""
        recordings = make_sse_recordings(docs)
        reduced = reduce_sse(sse_events(recordings)).withColumn(
            "doc_id", F.substring("conv_id", 5, 100).cast("long")
        )
        joined = reduced.join(
            docs.select("doc_id", F.col("text").alias("want")), "doc_id"
        )
        n = joined.count()
        assert n == docs.count()
        mismatched = joined.filter(
            ~F.col("text").eqNullSafe(F.col("want"))
        ).count()
        assert mismatched == 0

    def test_awkward_texts(self, spark):
        """Blank-line separators, unicode, emptiness: the wire format's
        JSON escaping must keep block splits exact."""
        texts = [
            (0, "a\n\nb\n\nc"),
            (1, ""),
            (2, "κόσμος 日本語 \t tab"),
            (3, "event: fake\ndata: {}\n\ninjection attempt"),
            (4, " leading and trailing  "),
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        reduced = reduce_sse(sse_events(make_sse_recordings(df))).withColumn(
            "doc_id", F.substring("conv_id", 5, 100).cast("long")
        )
        got = {r["doc_id"]: r["text"] for r in reduced.collect()}
        assert got == dict(texts)


class TestFoldSemantics:
    def _events_df(self, spark, sse: str):
        df = spark.createDataFrame(
            [("c", 0, sse)], "conv_id string, turn_idx int, sse string"
        )
        return sse_events(df)

    def test_usage_and_stop_reason(self, spark):
        sse = encode_sse_message("hello world", "msg_1", input_tokens=7)
        row = reduce_sse(self._events_df(spark, sse)).collect()[0]
        assert row["text"] == "hello world"
        assert row["model"] == "model-x" and row["role"] == "assistant"
        assert row["stop_reason"] == "end_turn"
        assert row["input_tokens"] == 7 and row["output_tokens"] >= 1

    def test_tool_use_input_json_assembled(self, spark):
        import json

        frags = ['{"comm', 'and": "ls', ' -la"}']
        events = [
            ("message_start",
             '{"type":"message_start","message":{"role":"assistant",'
             '"model":"m","usage":{"input_tokens":1}}}'),
            ("content_block_start",
             '{"type":"content_block_start","index":0,"content_block":'
             '{"type":"tool_use","id":"tu_1","name":"Bash","input":{}}}'),
        ] + [
            ("content_block_delta",
             json.dumps({"type": "content_block_delta", "index": 0,
                         "delta": {"type": "input_json_delta",
                                   "partial_json": f}}))
            for f in frags
        ] + [
            ("content_block_stop", '{"type":"content_block_stop","index":0}'),
            ("message_delta",
             '{"type":"message_delta","delta":{"stop_reason":"tool_use"},'
             '"usage":{"output_tokens":5}}'),
            ("message_stop", '{"type":"message_stop"}'),
        ]
        sse = "".join(f"event: {t}\ndata: {d}\n\n" for t, d in events)
        row = reduce_sse(self._events_df(spark, sse)).collect()[0]
        assert row["tool_name"] == "Bash"
        assert json.loads(row["tool_input_json"]) == {"command": "ls -la"}
        assert row["stop_reason"] == "tool_use"
        assert row["text"] == ""

    def test_multi_tool_use_blocks_all_collected(self, spark):
        """A turn with TWO tool_use blocks must pin BOTH (ordered) in
        tool_blocks — the reference reducer accumulates the full block
        list; dropping trailing tool inputs would be silent data loss.
        The one-tool transcript bridge still reads the FIRST."""
        import json

        def block(idx, name, frags):
            out = [
                ("content_block_start",
                 json.dumps({"type": "content_block_start", "index": idx,
                             "content_block": {"type": "tool_use",
                                               "id": f"tu_{idx}",
                                               "name": name, "input": {}}})),
            ]
            out += [
                ("content_block_delta",
                 json.dumps({"type": "content_block_delta", "index": idx,
                             "delta": {"type": "input_json_delta",
                                       "partial_json": f}}))
                for f in frags
            ]
            out.append(
                ("content_block_stop",
                 json.dumps({"type": "content_block_stop", "index": idx}))
            )
            return out

        events = [
            ("message_start",
             '{"type":"message_start","message":{"role":"assistant",'
             '"model":"m","usage":{"input_tokens":1}}}'),
        ] + block(0, "Read", ['{"path": "/a"}']) \
          + block(1, "Bash", ['{"comm', 'and": "ls"}']) + [
            ("message_delta",
             '{"type":"message_delta","delta":{"stop_reason":"tool_use"},'
             '"usage":{"output_tokens":5}}'),
            ("message_stop", '{"type":"message_stop"}'),
        ]
        sse = "".join(f"event: {t}\ndata: {d}\n\n" for t, d in events)
        row = reduce_sse(self._events_df(spark, sse)).collect()[0]
        assert row["tool_name"] == "Read"  # bridge: first block
        got = [(b["name"], b["input_json"]) for b in row["tool_blocks"]]
        assert got == [
            ("Read", '{"path": "/a"}'),
            ("Bash", '{"command": "ls"}'),
        ]

    def test_cache_tokens_fold_into_input(self, spark):
        """Prompt tokens = input + cache_creation + cache_read (the
        reference's totalInput, anthropic.go:111-113) — a cached-prompt
        recording must not under-report."""
        sse = (
            "event: message_start\ndata: "
            '{"type":"message_start","message":{"role":"assistant",'
            '"model":"m","usage":{"input_tokens":10,'
            '"cache_creation_input_tokens":200,'
            '"cache_read_input_tokens":3000}}}\n\n'
            "event: message_stop\ndata: " '{"type":"message_stop"}\n\n'
        )
        row = reduce_sse(self._events_df(spark, sse)).collect()[0]
        assert row["input_tokens"] == 3210

    def test_pings_and_damage_ignored(self, spark):
        sse = (
            "event: ping\ndata: {\"type\":\"ping\"}\n\n"
            "event: content_block_delta\ndata: NOT-JSON\n\n"
            + encode_sse_message("ok", "msg_2")
        )
        row = reduce_sse(self._events_df(spark, sse)).collect()[0]
        assert row["text"] == "ok"

    def test_event_parse_is_native(self, spark):
        """The event parser must stay JVM-side (no Python stage)."""
        df = spark.createDataFrame(
            [("c", 0, encode_sse_message("x", "m"))],
            "conv_id string, turn_idx int, sse string",
        )
        plan = sse_events(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan


class TestOpenAIResponsesReducer:
    """P4: the Responses event vocabulary (reference
    pkg/capture/openai_responses.go:27-36,106-170) — terminal-event happy
    path, codex empty-terminal accumulation, torn-stream salvage."""

    def _reduce(self, spark, sse: str):
        df = spark.createDataFrame(
            [("c", 0, sse)], "conv_id string, turn_idx int, sse string"
        )
        return reduce_sse_openai(
            sse_events(df, keep_dataonly=True)
        ).collect()[0]

    def test_roundtrip_over_documents(self, spark, docs):
        """Byte equality over the corpus for BOTH wire shapes (the
        generator alternates api-style event-lines/full-terminal with
        codex-style data-only/empty-terminal per doc id)."""
        reduced = reduce_sse_openai(
            sse_events(make_responses_recordings(docs), keep_dataonly=True)
        ).withColumn(
            "doc_id", F.substring("conv_id", 5, 100).cast("long")
        )
        joined = reduced.join(
            docs.select("doc_id", F.col("text").alias("want")), "doc_id"
        )
        assert joined.count() == docs.count()
        assert (
            joined.filter(~F.col("text").eqNullSafe(F.col("want"))).count()
            == 0
        )
        assert joined.filter(F.col("partial")).count() == 0

    def test_terminal_event_is_the_record(self, spark):
        """The terminal response's output wins over deltas: text comes
        from the full Response object, stop_reason maps completed->stop."""
        row = self._reduce(
            spark, encode_responses_sse("hello responses", "r1",
                                        input_tokens=9)
        )
        assert row["text"] == "hello responses"
        assert row["model"] == "model-r" and row["role"] == "assistant"
        assert row["stop_reason"] == "stop"
        assert row["input_tokens"] == 9 and row["output_tokens"] >= 1
        assert row["partial"] is False and row["reducer_error"] is None

    def test_codex_empty_terminal_uses_accumulated_items(self, spark):
        """codex backend: data-only frames + terminal with an EMPTY
        output array — the accumulated output_item.done items are the
        only complete record (openai_responses.go:113-117)."""
        row = self._reduce(
            spark,
            encode_responses_sse("from items", "r2", codex_style=True),
        )
        assert row["text"] == "from items"
        assert row["stop_reason"] == "stop" and row["partial"] is False

    def test_torn_stream_salvages_delta_text(self, spark):
        """No terminal event and no done items: loose text deltas are the
        salvage, the turn is flagged partial (partialResponse)."""
        row = self._reduce(
            spark,
            encode_responses_sse(
                "torn mid stream", "r3", truncate_after_deltas=True
            ),
        )
        assert row["text"] == "torn mid stream"
        assert row["partial"] is True
        assert "terminal" in row["reducer_error"]
        assert row["stop_reason"] is None
        # model still recovered from response.created
        assert row["model"] == "model-r"

    def test_function_call_items_map_to_tools(self, spark):
        row = self._reduce(
            spark,
            encode_responses_sse(
                "calling a tool", "r4", tool=("get_weather", '{"city":"SF"}')
            ),
        )
        assert row["tool_name"] == "get_weather"
        assert row["tool_input_json"] == '{"city":"SF"}'
        assert [(b["name"], b["input_json"]) for b in row["tool_blocks"]] == [
            ("get_weather", '{"city":"SF"}')
        ]

    def test_incomplete_surfaces_api_reason(self, spark):
        row = self._reduce(
            spark,
            encode_responses_sse(
                "cut off", "r5", status="incomplete",
                incomplete_reason="max_output_tokens",
            ),
        )
        assert row["stop_reason"] == "max_output_tokens"
        assert row["partial"] is False

    def test_oneshot_form_same_mapping(self, spark):
        import json as _json

        body = _json.dumps({
            "id": "r6", "object": "response", "created_at": 1700000000,
            "status": "completed", "model": "model-r",
            "output": [{"type": "message", "role": "assistant",
                        "content": [{"type": "output_text",
                                     "text": "one shot"}]}],
            "usage": {"input_tokens": 3, "output_tokens": 2,
                      "total_tokens": 5},
        })
        df = spark.createDataFrame(
            [("c", 0, body)], "conv_id string, turn_idx int, body string"
        )
        row = reduce_responses_oneshot(df).collect()[0]
        assert row["text"] == "one shot"
        assert row["stop_reason"] == "stop"
        assert row["input_tokens"] == 3 and row["output_tokens"] == 2

    def test_feeds_transcript_bridge(self, spark):
        df = spark.createDataFrame(
            [(0, "bridged reply")], "doc_id long, text string"
        )
        tx = sse_to_transcripts(
            reduce_sse_openai(
                sse_events(
                    make_responses_recordings(df), keep_dataonly=True
                )
            )
        )
        rows = tx.collect()
        assert len(rows) == 1 and rows[0]["text"] == "bridged reply"
        assert rows[0]["role"] == "assistant"


class TestBackfillBridge:
    def test_reduced_stream_feeds_pipeline(self, spark):
        from tapes_spark.pipeline import run_pipeline

        df = spark.createDataFrame(
            [(0, "the assistant replied at length"), (1, "short")],
            "doc_id long, text string",
        )
        tx = sse_to_transcripts(
            reduce_sse(sse_events(make_sse_recordings(df)))
        )
        res = run_pipeline(spark, tx, persist=False)
        assert res.sinks["conversation_tape"].count() == 2
        texts = {
            r["conv_id"]: r["response_preview"]
            for r in res.sinks["conversation_tape"].collect()
        }
        assert "assistant replied" in texts["sse-0"]
