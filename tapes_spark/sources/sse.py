"""SSE wire-stream reducer (P3/P4) — fold recorded streaming responses
back into their one-shot messages.

The reference's capture tier records provider responses as SSE streams
and its dedup contract hinges on the reducer producing output
byte-identical to the equivalent one-shot response (reference
pkg/capture/anthropic.go:57-224; public recordings at
fixtures/recordings/*/response.sse).  This module rebuilds that contract
over the PUBLIC streaming event vocabulary (message_start,
content_block_start, content_block_delta with text_delta /
input_json_delta, content_block_stop, message_delta, message_stop,
ping) as an optional backfill source feeding the existing transcript
path:

  sse_events   — wire text -> one row per event.  Pure native Column
                 work (split on the blank-line block separator +
                 regexp_extract), whole-stage codegen, no Python.
  reduce_sse   — the stateful fold: groupBy(turn).applyInPandas, one
                 output row per turn with the assembled text, tool-use
                 input JSON, usage counters and stop reason.  Events
                 within a turn are folded in event_idx (wire) order.
  sse_to_transcripts — reduced messages in the transcript schema, so a
                 recorded wire corpus backfills through run_pipeline
                 exactly like transcript JSONL (S9).
  make_sse_recordings — deterministic wire-shaped fixture generator
                 (chunks source text into text_delta events, seeded per
                 conversation): the byte-equality gate re-assembles the
                 original text exactly, with no external data.

Scale notes: parsing is codegen-native; only the per-turn fold crosses
to Python (Arrow-batched, one group per turn — a turn's event count is
bounded by response length, so groups are small and numerous; the
applyInPandas per-group overhead is acceptable for a BACKFILL source,
which runs once per recording, not per query).
"""

from __future__ import annotations

import json
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SSE_EVENT_TYPES = (
    "message_start",
    "content_block_start",
    "content_block_delta",
    "content_block_stop",
    "message_delta",
    "message_stop",
    "ping",
)


def sse_events(
    df: DataFrame,
    sse_col: str = "sse",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Wire text -> (keys..., event_idx, event_type, data_json), one row
    per SSE event.  Events are blank-line-separated blocks of
    ``event: <type>`` / ``data: <json>`` lines; JSON string escaping
    guarantees a data line never contains a literal newline, so the
    block split is exact.  All native expressions (codegen)."""
    block = F.split(F.col(sse_col), r"\n\n")
    out = (
        df.select(
            *key_cols,
            F.posexplode(block).alias("event_idx", "raw_event"),
        )
        .withColumn(
            "event_type",
            F.regexp_extract("raw_event", r"(?m)^event:\s*([\w.]+)", 1),
        )
        .withColumn(
            "data_json",
            F.regexp_extract("raw_event", r"(?m)^data:\s*(.*)$", 1),
        )
        .filter(F.col("event_type") != "")
        .drop("raw_event")
    )
    return out


def _reduce_schema(events: DataFrame, key_cols: tuple[str, ...]) -> StructType:
    key_fields = [f for f in events.schema.fields if f.name in key_cols]
    return StructType(
        key_fields
        + [
            StructField("model", StringType()),
            StructField("role", StringType()),
            StructField("stop_reason", StringType()),
            StructField("text", StringType()),
            StructField("tool_name", StringType()),
            StructField("tool_input_json", StringType()),
            StructField("input_tokens", LongType()),
            StructField("output_tokens", LongType()),
            StructField("n_events", LongType()),
        ]
    )


def reduce_sse(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """The P3 stateful fold: one output message per turn, text assembled
    from text_delta events and tool input from input_json_delta events in
    wire order — the reducer half of the reducer/one-shot byte-equality
    contract (anthropic.go:57-224).  Unknown event types are ignored
    (forward-compatible, like the reference's default arm)."""
    schema = _reduce_schema(events, key_cols)
    keys = [f.name for f in schema.fields if f.name in key_cols]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_idx")
        model = role = stop_reason = tool_name = None
        input_tokens = output_tokens = None
        blocks: dict[int, dict] = {}
        n = 0
        for etype, data in zip(pdf["event_type"], pdf["data_json"]):
            n += 1
            if etype == "ping" or not data:
                continue
            try:
                d = json.loads(data)
            except ValueError:
                continue  # a damaged event never poisons the fold
            if etype == "message_start":
                msg = d.get("message", {})
                model = msg.get("model")
                role = msg.get("role")
                input_tokens = (msg.get("usage") or {}).get("input_tokens")
            elif etype == "content_block_start":
                idx = d.get("index", 0)
                cb = d.get("content_block", {})
                blocks[idx] = {
                    "type": cb.get("type", "text"),
                    "text": [cb.get("text", "") or ""],
                    "json": [cb.get("partial_json", "") or ""],
                    "name": cb.get("name"),
                }
            elif etype == "content_block_delta":
                idx = d.get("index", 0)
                blk = blocks.setdefault(
                    idx, {"type": "text", "text": [], "json": [], "name": None}
                )
                delta = d.get("delta", {})
                if delta.get("type") == "text_delta":
                    blk["text"].append(delta.get("text", ""))
                elif delta.get("type") == "input_json_delta":
                    blk["json"].append(delta.get("partial_json", ""))
            elif etype == "message_delta":
                delta = d.get("delta", {})
                stop_reason = delta.get("stop_reason", stop_reason)
                usage = d.get("usage") or {}
                if "output_tokens" in usage:
                    output_tokens = usage["output_tokens"]
        text = "".join(
            "".join(blk["text"])
            for _, blk in sorted(blocks.items())
            if blk["type"] == "text"
        )
        tool_json = None
        for _, blk in sorted(blocks.items()):
            if blk["type"] == "tool_use":
                tool_name = blk["name"]
                tool_json = "".join(blk["json"])
                break
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out.update(
            {
                "model": [model],
                "role": [role],
                "stop_reason": [stop_reason],
                "text": [text],
                "tool_name": [tool_name],
                "tool_input_json": [tool_json],
                "input_tokens": [input_tokens],
                "output_tokens": [output_tokens],
                "n_events": [n],
            }
        )
        return pd.DataFrame(out)

    return events.groupBy(*keys).applyInPandas(fold, schema)


def sse_to_transcripts(reduced: DataFrame) -> DataFrame:
    """Reduced messages in the transcript schema (conv_id, turn_idx,
    role, text, tool, ts) — the backfill bridge into run_pipeline.  ts is
    NULL (a wire recording carries no capture clock here; the idempotent
    ingest stamps arrival order downstream, P12)."""
    return reduced.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.coalesce(F.col("role"), F.lit("assistant")).alias("role"),
        F.col("text"),
        F.coalesce(F.col("tool_name"), F.lit("")).alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def encode_sse_message(
    text: str,
    msg_id: str,
    model: str = "model-x",
    seed: int = 42,
    input_tokens: int = 100,
) -> str:
    """One deterministic wire-shaped SSE stream for *text* — the fixture
    encoder for the byte-equality gate (chunk sizes seeded, pings
    interleaved; JSON escaping keeps data lines newline-free)."""
    rng = random.Random(seed)
    events: list[tuple[str, dict]] = [
        (
            "message_start",
            {
                "type": "message_start",
                "message": {
                    "id": msg_id,
                    "type": "message",
                    "role": "assistant",
                    "model": model,
                    "content": [],
                    "stop_reason": None,
                    "usage": {"input_tokens": input_tokens},
                },
            },
        ),
        (
            "content_block_start",
            {
                "type": "content_block_start",
                "index": 0,
                "content_block": {"type": "text", "text": ""},
            },
        ),
    ]
    pos = 0
    while pos < len(text):
        n = rng.randint(1, 9)
        events.append(
            (
                "content_block_delta",
                {
                    "type": "content_block_delta",
                    "index": 0,
                    "delta": {"type": "text_delta", "text": text[pos : pos + n]},
                },
            )
        )
        pos += n
        if rng.random() < 0.1:
            events.append(("ping", {"type": "ping"}))
    events += [
        ("content_block_stop", {"type": "content_block_stop", "index": 0}),
        (
            "message_delta",
            {
                "type": "message_delta",
                "delta": {"stop_reason": "end_turn", "stop_sequence": None},
                "usage": {"output_tokens": max(1, len(text) // 4)},
            },
        ),
        ("message_stop", {"type": "message_stop"}),
    ]
    return "".join(
        f"event: {t}\ndata: {json.dumps(d, ensure_ascii=False)}\n\n"
        for t, d in events
    )


def make_sse_recordings(
    texts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """(conv_id, turn_idx, sse) wire recordings for a table of texts —
    deterministic per id (the generator seed folds the row id), produced
    distributed via mapInPandas so no corpus ever collects to the
    driver."""
    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", LongType()),
            StructField("sse", StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sses = [
                encode_sse_message(
                    str(t) if t is not None else "",
                    msg_id=f"msg_{i}",
                    seed=seed * 1_000_003 + int(i),
                )
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "conv_id": [f"sse-{i}" for i in pdf[id_col]],
                    "turn_idx": [0] * len(pdf),
                    "sse": sses,
                }
            )

    return texts.select(id_col, text_col).mapInPandas(gen, out_schema)
