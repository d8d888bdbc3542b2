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
  reduce_sse   — the stateful fold: one output row per turn with the
                 assembled text, tool-use input JSON, usage counters and
                 stop reason, events folded in event_idx (wire) order —
                 expressed as native ordered aggregations (one from_json
                 per event + array_sort/array_join collect_lists), so
                 the whole reducer stays JVM-side.
  sse_to_transcripts — reduced messages in the transcript schema, so a
                 recorded wire corpus backfills through run_pipeline
                 exactly like transcript JSONL (S9).
  make_sse_recordings — deterministic wire-shaped fixture generator
                 (chunks source text into text_delta events, seeded per
                 conversation): the byte-equality gate re-assembles the
                 original text exactly, with no external data.

Scale notes: the entire parse+reduce path is native (no Python stage at
all — a per-turn applyInPandas fold was measured ~6x slower from group
overhead alone); aggregations key on (turn, block) then (turn), so the
reduction is map-side-partial, whole-stage-codegen where expressions
allow, and AQE-skew-splittable like every other aggregate.
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
    keep_dataonly: bool = False,
) -> DataFrame:
    """Wire text -> (keys..., event_idx, event_type, data_json), one row
    per SSE event.  Events are blank-line-separated blocks of
    ``event: <type>`` / ``data: <json>`` lines; JSON string escaping
    guarantees a data line never contains a literal newline, so the
    block split is exact.  All native expressions (codegen).

    *keep_dataonly* also keeps blocks that carry a ``data:`` line with no
    ``event:`` field name — the OpenAI Responses path needs it (the
    chatgpt.com/codex backend emits data-only SSE frames; the reference
    sniffs for either field name, openai_responses.go:62-79); the event
    type is then recovered from the payload's own ``type`` field by the
    reducer."""
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
    )
    keep = F.col("event_type") != ""
    if keep_dataonly:
        keep = keep | (F.col("data_json") != "")
    return out.filter(keep).drop("raw_event")


def reduce_sse(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """The P3 stateful fold: one output message per turn, text assembled
    from text_delta events and tool input from input_json_delta events in
    wire order — the reducer half of the reducer/one-shot byte-equality
    contract (anthropic.go:57-224).  Unknown event types are ignored
    (forward-compatible, like the reference's default arm).

    Expressed as NATIVE ordered aggregations, no Python in the fold:
    one from_json per event (Jackson unescapes \\n/\\uXXXX/surrogate
    pairs exactly), then per-block ordered concatenation via
    array_join(array_sort(collect_list(struct(event_idx, text)))) and a
    turn-level assembly in block-index order.  Earlier cuts of this fold
    were a per-turn applyInPandas: ~0.5ms/group x one group per turn
    plus per-event Python made the reducer the slowest query in the
    bench (13s at sf0.1 vs ~2s here); the fold is a deterministic
    order-respecting reduction, which ordered collect_list aggregation
    expresses exactly — so Spark executes it map-side-partial,
    whole-stage, and skew-splittable like every other aggregate.
    """
    keys = [c for c in events.columns if c in key_cols]

    # ONE JVM-side parse per event into a typed struct; damaged JSON
    # parses to a NULL struct — the event contributes nothing, never
    # poisons the fold (the reference's default arm).  (A per-field
    # get_json_object variant re-parses per extraction — JsonToStructs
    # is CodegenFallback, no common-subexpression elimination.)
    event_ddl = (
        "message struct<model:string,role:string,"
        "usage:struct<input_tokens:bigint,"
        "cache_creation_input_tokens:bigint,"
        "cache_read_input_tokens:bigint>>, "
        "index int, "
        "content_block struct<type:string,text:string,name:string>, "
        "delta struct<type:string,text:string,partial_json:string,"
        "stop_reason:string>, "
        "usage struct<output_tokens:bigint>"
    )
    j = F.from_json(F.col("data_json"), event_ddl)
    e = events.select(
        *keys,
        "event_idx",
        "event_type",
        j.alias("j"),
    ).select(
        *keys,
        "event_idx",
        "event_type",
        F.coalesce(F.col("j.index"), F.lit(0)).alias("bidx"),
        F.col("j.content_block.type").alias("cb_type"),
        F.col("j.content_block.text").alias("cb_text"),
        F.col("j.content_block.name").alias("cb_name"),
        F.col("j.delta.type").alias("d_type"),
        F.col("j.delta.text").alias("d_text"),
        F.col("j.delta.partial_json").alias("d_pj"),
        F.col("j.delta.stop_reason").alias("d_stop"),
        F.col("j.message.model").alias("m_model"),
        F.col("j.message.role").alias("m_role"),
        # prompt tokens fold cache-creation + cache-read into input — the
        # reference reducer's totalInput (anthropic.go:111-113); a
        # message_start without a usage block stays NULL, never a fake 0
        F.when(
            F.col("j.message.usage").isNotNull(),
            F.coalesce(F.col("j.message.usage.input_tokens"), F.lit(0))
            + F.coalesce(
                F.col("j.message.usage.cache_creation_input_tokens"), F.lit(0)
            )
            + F.coalesce(
                F.col("j.message.usage.cache_read_input_tokens"), F.lit(0)
            ),
        ).alias("m_in_tok"),
        F.col("j.usage.output_tokens").alias("m_out_tok"),
    )
    etype = F.col("event_type")
    is_start = etype == "content_block_start"
    is_delta = etype == "content_block_delta"

    def _ordered_concat(cond, idx_col: str, val):
        # concat of *val* over rows matching *cond*, in *idx_col* order:
        # collect_list drops the when()'s NULLs, array_sort orders by the
        # struct's leading (unique) index field
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            cond,
                            F.struct(
                                F.col(idx_col).alias("i"),
                                F.coalesce(val, F.lit("")).alias("t"),
                            ),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            "",
        )

    # per-(turn, block): type/name/initial-text from the first
    # content_block_start, deltas concatenated in event order
    blocks = (
        e.filter(is_start | is_delta)
        .groupBy(*keys, "bidx")
        .agg(
            F.min(
                F.when(
                    is_start,
                    F.struct("event_idx", "cb_type", "cb_text", "cb_name"),
                )
            ).alias("start"),
            _ordered_concat(
                is_delta & (F.col("d_type") == "text_delta"),
                "event_idx", F.col("d_text"),
            ).alias("dtext"),
            _ordered_concat(
                is_delta & (F.col("d_type") == "input_json_delta"),
                "event_idx", F.col("d_pj"),
            ).alias("djson"),
        )
        .select(
            *keys,
            "bidx",
            F.coalesce(F.col("start.cb_type"), F.lit("text")).alias("btype"),
            F.concat(
                F.coalesce(F.col("start.cb_text"), F.lit("")), F.col("dtext")
            ).alias("btext"),
            F.col("start.cb_name").alias("bname"),
            "djson",
        )
    )
    # turn-level: text blocks concatenated in block-index order; ALL
    # tool_use blocks collected in block order (the reference reducer
    # accumulates the full block list, anthropic.go's content slice) —
    # the transcript bridge reads the first, but a multi-tool_use turn
    # must not silently drop trailing tool inputs
    per_turn = blocks.groupBy(*keys).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("btype") == "text",
                            F.struct(
                                F.col("bidx").alias("i"),
                                F.col("btext").alias("t"),
                            ),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            "",
        ).alias("text"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("btype") == "tool_use",
                    F.struct(
                        F.col("bidx").alias("bidx"),
                        F.col("bname").alias("name"),
                        F.col("djson").alias("input_json"),
                    ),
                )
            )
        ).alias("tool_blocks"),
    )
    # turn-level headers; message_delta fields take the LAST non-null
    # value (max over (event_idx, value) structs)
    headers = e.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.max(
            F.when(etype == "message_start", F.col("m_model"))
        ).alias("model"),
        F.max(
            F.when(etype == "message_start", F.col("m_role"))
        ).alias("role"),
        F.max(
            F.when(etype == "message_start", F.col("m_in_tok"))
        ).alias("input_tokens"),
        F.max(
            F.when(
                (etype == "message_delta") & F.col("d_stop").isNotNull(),
                F.struct("event_idx", "d_stop"),
            )
        )["d_stop"].alias("stop_reason"),
        F.max(
            F.when(
                (etype == "message_delta") & F.col("m_out_tok").isNotNull(),
                F.struct("event_idx", "m_out_tok"),
            )
        )["m_out_tok"].alias("output_tokens"),
    )
    # try_element_at: ANSI mode makes plain element_at THROW on the empty
    # array a tool-less turn folds to
    tool0 = F.try_element_at(F.col("tool_blocks"), F.lit(1))
    return headers.join(per_turn, keys, "left").select(
        *keys,
        "model",
        "role",
        "stop_reason",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        tool0["name"].alias("tool_name"),
        tool0["input_json"].alias("tool_input_json"),
        # the FULL ordered block list (name, input_json per tool_use) —
        # consumers that pair multi-tool turns read this, the one-tool
        # transcript bridge reads tool_name/tool_input_json above
        F.transform(
            F.coalesce(
                F.col("tool_blocks"),
                F.array().cast(
                    "array<struct<bidx:int,name:string,input_json:string>>"
                ),
            ),
            lambda b: F.struct(
                b["name"].alias("name"), b["input_json"].alias("input_json")
            ),
        ).alias("tool_blocks"),
        F.col("input_tokens").cast("long").alias("input_tokens"),
        F.col("output_tokens").cast("long").alias("output_tokens"),
        "n_events",
    )


# --------------------------------------------------------------- OpenAI

# The Responses output-item union (message / function_call / reasoning —
# hosted-tool items parse their `type` and keep the other fields null,
# the forward-compatible default arm).  Shared by the terminal Response
# object, the accumulated output_item.done frames, and the one-shot form.
_RESPONSES_ITEM_DDL = (
    "struct<type:string,role:string,"
    "content:array<struct<type:string,text:string,refusal:string>>,"
    "call_id:string,name:string,arguments:string,"
    "summary:array<struct<type:string,text:string>>,"
    "encrypted_content:string>"
)
_RESPONSES_OBJECT_DDL = (
    "struct<id:string,object:string,created_at:bigint,status:string,"
    f"model:string,output:array<{_RESPONSES_ITEM_DDL}>,"
    "usage:struct<input_tokens:bigint,output_tokens:bigint,"
    "total_tokens:bigint,"
    "input_tokens_details:struct<cached_tokens:bigint>>,"
    "incomplete_details:struct<reason:string>>"
)

OPENAI_TERMINAL_EVENTS = (
    "response.completed",
    "response.incomplete",
    "response.failed",
)


def _responses_stop_reason(resp) -> F.Column:
    """Status -> canonical stop-reason vocabulary (the reference's
    responsesStopReason, openai_responses.go:340-352): completed turns
    say "stop", incomplete turns surface the API's own reason, anything
    else carries the status verbatim."""
    return (
        F.when(resp["status"] == "completed", F.lit("stop"))
        .when(
            resp["status"] == "incomplete",
            F.coalesce(
                F.nullif(resp["incomplete_details"]["reason"], F.lit("")),
                F.lit("incomplete"),
            ),
        )
        .otherwise(resp["status"])
    )


def _responses_text(items) -> F.Column:
    """Concatenated output_text parts of message items, in item order —
    the text half of responsesOutputContent (openai_responses.go:243-258)."""
    return F.array_join(
        F.flatten(
            F.transform(
                F.filter(items, lambda i: i["type"] == "message"),
                lambda i: F.transform(
                    F.filter(
                        F.coalesce(
                            i["content"],
                            F.array().cast(
                                "array<struct<type:string,text:string,"
                                "refusal:string>>"
                            ),
                        ),
                        lambda c: c["type"] == "output_text",
                    ),
                    lambda c: F.coalesce(c["text"], F.lit("")),
                ),
            )
        ),
        "",
    )


def _responses_tools(items) -> F.Column:
    """function_call items -> ordered (name, input_json) structs — the
    tool_use mapping of responsesOutputContent (openai_responses.go:259-275;
    arguments arrive as a complete JSON string, not deltas)."""
    return F.transform(
        F.filter(items, lambda i: i["type"] == "function_call"),
        lambda i: F.struct(
            i["name"].alias("name"), i["arguments"].alias("input_json")
        ),
    )


def reduce_sse_openai(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """The P4 OpenAI Responses reducer (reference
    pkg/capture/openai_responses.go:27-36,106-170), same native-fold
    machinery as :func:`reduce_sse` with the Responses event vocabulary:

      * the terminal ``response.completed/incomplete/failed`` event
        carries the COMPLETE Response object — the happy path maps that
        single payload, no delta replay;
      * ``response.output_item.done`` items accumulate in event order —
        the terminal event's output array is EMPTY on the codex backend,
        so accumulated items are the record there;
      * ``response.output_text.delta`` text accumulates as last-line
        salvage for a stream torn down mid-item (``partial`` = true,
        ``reducer_error`` says why — the reference's partialResponse).

    Event types are recovered from the payload's ``type`` field when the
    frame had no ``event:`` line (data-only SSE; feed events from
    ``sse_events(..., keep_dataonly=True)``).  Output schema matches
    :func:`reduce_sse` (so :func:`sse_to_transcripts` takes either) plus
    ``partial``/``reducer_error``."""
    keys = [c for c in events.columns if c in key_cols]
    env_ddl = (
        f"type string, delta string, item {_RESPONSES_ITEM_DDL}, "
        f"response {_RESPONSES_OBJECT_DDL}"
    )
    # ONE parse per event: project the parsed struct as a single column
    # first, extract fields in a SECOND select.  Extracting fields inline
    # in one select hands Catalyst four independent from_json expressions
    # which the JSON schema-pruning rule specializes per field — four
    # full lexes of the same payload per event (JsonToStructs is
    # CodegenFallback, no CSE).  With the struct aliased and referenced
    # more than once, CollapseProject keeps the boundary and the parse
    # runs once (same pattern as reduce_sse above; plan-audited in
    # PLANS.md round 5).
    j = F.from_json(F.col("data_json"), env_ddl)
    e = events.select(
        *keys, "event_idx", "event_type", j.alias("j")
    ).select(
        *keys,
        "event_idx",
        # data-only frames: the envelope's own type field IS the event type
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("")), F.col("j.type")
        ).alias("etype"),
        F.col("j.delta").alias("delta"),
        F.col("j.item").alias("item"),
        F.col("j.response").alias("resp"),
    )
    etype = F.col("etype")
    per_turn = e.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        # LAST terminal event wins (max over event_idx-led struct)
        F.max(
            F.when(
                etype.isin(*OPENAI_TERMINAL_EVENTS) & F.col("resp").isNotNull(),
                F.struct("event_idx", "resp"),
            )
        )["resp"].alias("terminal"),
        F.max(
            F.when(etype.isin(*OPENAI_TERMINAL_EVENTS), F.col("etype"))
        ).alias("terminal_etype"),
        F.min(
            F.when(etype == "response.created", F.struct("event_idx", "resp"))
        )["resp"].alias("created"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        (etype == "response.output_item.done")
                        & F.col("item").isNotNull(),
                        F.struct("event_idx", "item"),
                    )
                )
            ),
            lambda s: s["item"],
        ).alias("done_items"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            etype == "response.output_text.delta",
                            F.struct(
                                F.col("event_idx").alias("i"),
                                F.coalesce(F.col("delta"), F.lit("")).alias(
                                    "t"
                                ),
                            ),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            "",
        ).alias("delta_text"),
    )
    terminal = F.col("terminal")
    has_terminal = terminal.isNotNull()
    # codex backend: terminal event with an EMPTY output array -> the
    # accumulated output_item.done items are the only complete record
    items = F.when(
        has_terminal & (F.size(F.coalesce(terminal["output"], F.array())) > 0),
        terminal["output"],
    ).otherwise(F.col("done_items"))
    text = F.when(
        has_terminal | (F.size(F.col("done_items")) > 0),
        _responses_text(items),
    ).otherwise(F.col("delta_text"))
    tools = _responses_tools(items)
    tool0 = F.try_element_at(tools, F.lit(1))
    # prompt tokens: Responses usage.input_tokens already INCLUDES cached
    # tokens (input_tokens_details.cached_tokens is a breakdown, not an
    # addend — unlike Anthropic's cache_*_input_tokens)
    return per_turn.select(
        *keys,
        F.coalesce(terminal["model"], F.col("created")["model"]).alias(
            "model"
        ),
        F.lit("assistant").alias("role"),
        F.when(has_terminal, _responses_stop_reason(terminal)).alias(
            "stop_reason"
        ),
        F.coalesce(text, F.lit("")).alias("text"),
        tool0["name"].alias("tool_name"),
        tool0["input_json"].alias("tool_input_json"),
        tools.alias("tool_blocks"),
        terminal["usage"]["input_tokens"].cast("long").alias("input_tokens"),
        terminal["usage"]["output_tokens"].cast("long").alias(
            "output_tokens"
        ),
        "n_events",
        (~has_terminal).alias("partial"),
        F.when(
            ~has_terminal,
            F.lit("stream ended before terminal response event"),
        ).alias("reducer_error"),
    )


def reduce_responses_oneshot(
    df: DataFrame,
    json_col: str = "body",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """The one-shot (non-streamed) Responses form — one full Response
    JSON per row (openai_responses.go:83-99: same mapping as the
    terminal event, no fold at all)."""
    keys = [c for c in df.columns if c in key_cols]
    resp = F.from_json(F.col(json_col), _RESPONSES_OBJECT_DDL)
    out = df.select(*keys, resp.alias("resp")).filter(
        F.col("resp")["object"] == "response"
    )
    r = F.col("resp")
    items = F.coalesce(
        r["output"], F.array().cast(f"array<{_RESPONSES_ITEM_DDL}>")
    )
    tools = _responses_tools(items)
    tool0 = F.try_element_at(tools, F.lit(1))
    return out.select(
        *keys,
        r["model"].alias("model"),
        F.lit("assistant").alias("role"),
        _responses_stop_reason(r).alias("stop_reason"),
        F.coalesce(_responses_text(items), F.lit("")).alias("text"),
        tool0["name"].alias("tool_name"),
        tool0["input_json"].alias("tool_input_json"),
        tools.alias("tool_blocks"),
        r["usage"]["input_tokens"].cast("long").alias("input_tokens"),
        r["usage"]["output_tokens"].cast("long").alias("output_tokens"),
        F.lit(1).cast("long").alias("n_events"),
        F.lit(False).alias("partial"),
        F.lit(None).cast("string").alias("reducer_error"),
    )


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
    parts = [
        f"event: {t}\ndata: {json.dumps(d, ensure_ascii=False)}\n\n"
        for t, d in events
    ]
    # the delta loop dominates the fixture's cost (one event per ~5 chars
    # of corpus); emit it from a template that is byte-identical to
    # json.dumps of the nested dict (default ", "/": " separators) but
    # only pays the C string-escape per chunk, not a dict encode
    pos = 0
    while pos < len(text):
        n = rng.randint(1, 9)
        parts.append(
            "event: content_block_delta\n"
            'data: {"type": "content_block_delta", "index": 0, "delta": '
            '{"type": "text_delta", "text": '
            + json.dumps(text[pos : pos + n], ensure_ascii=False)
            + "}}\n\n"
        )
        pos += n
        if rng.random() < 0.1:
            parts.append('event: ping\ndata: {"type": "ping"}\n\n')
    tail: list[tuple[str, dict]] = [
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
    parts += [
        f"event: {t}\ndata: {json.dumps(d, ensure_ascii=False)}\n\n"
        for t, d in tail
    ]
    return "".join(parts)


def encode_responses_sse(
    text: str,
    msg_id: str,
    model: str = "model-r",
    seed: int = 42,
    input_tokens: int = 100,
    codex_style: bool = False,
    truncate_after_deltas: bool = False,
    tool: tuple[str, str] | None = None,
    status: str = "completed",
    incomplete_reason: str | None = None,
) -> str:
    """A deterministic OpenAI-Responses-shaped SSE stream for *text* —
    the fixture encoder for the P4 reducer gates.  *codex_style* sends
    the terminal event with an EMPTY output array (the chatgpt.com/codex
    backend shape — accumulated output_item.done frames are the record);
    *truncate_after_deltas* tears the stream down before any item or
    terminal event (the partial-salvage path); *tool* adds a
    function_call output item (name, arguments_json)."""
    rng = random.Random(seed)
    message_item = {
        "type": "message",
        "role": "assistant",
        "content": [{"type": "output_text", "text": text}],
    }
    output = [message_item]
    if tool is not None:
        output.append(
            {"type": "function_call", "call_id": "call_1",
             "name": tool[0], "arguments": tool[1]}
        )
    events: list[dict] = [
        {
            "type": "response.created",
            "response": {"id": msg_id, "object": "response",
                         "created_at": 1700000000, "status": "in_progress",
                         "model": model, "output": []},
        }
    ]
    # pre-serialized delta frames (see encode_sse_message: byte-identical
    # to json.dumps of the dict, one string escape per chunk)
    delta_frames: list[str] = []
    pos = 0
    while pos < len(text):
        n = rng.randint(1, 9)
        delta_frames.append(
            '{"type": "response.output_text.delta", "delta": '
            + json.dumps(text[pos : pos + n], ensure_ascii=False)
            + "}"
        )
        pos += n
    if not truncate_after_deltas:
        for item in output:
            events.append({"type": "response.output_item.done", "item": item})
        resp = {
            "id": msg_id,
            "object": "response",
            "created_at": 1700000000,
            "status": status,
            "model": model,
            "output": [] if codex_style else output,
            "usage": {
                "input_tokens": input_tokens,
                "output_tokens": max(1, len(text) // 4),
                "total_tokens": input_tokens + max(1, len(text) // 4),
                "input_tokens_details": {"cached_tokens": 0},
            },
        }
        if incomplete_reason is not None:
            resp["incomplete_details"] = {"reason": incomplete_reason}
        events.append({"type": f"response.{status}", "response": resp})
    # the Responses wire writes `event: <type>` lines on api.openai.com
    # but DATA-ONLY frames on the codex backend — encode both shapes.
    # events[0] is response.created; the pre-serialized delta frames sit
    # between it and the item/terminal events appended above.
    head, rest = events[:1], events[1:]
    if codex_style:
        return "".join(
            [f"data: {json.dumps(d, ensure_ascii=False)}\n\n" for d in head]
            + [f"data: {s}\n\n" for s in delta_frames]
            + [f"data: {json.dumps(d, ensure_ascii=False)}\n\n" for d in rest]
        )
    return "".join(
        [
            f"event: {d['type']}\ndata: "
            f"{json.dumps(d, ensure_ascii=False)}\n\n"
            for d in head
        ]
        + [
            "event: response.output_text.delta\ndata: " + s + "\n\n"
            for s in delta_frames
        ]
        + [
            f"event: {d['type']}\ndata: "
            f"{json.dumps(d, ensure_ascii=False)}\n\n"
            for d in rest
        ]
    )


def make_responses_recordings(
    texts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """(conv_id, turn_idx, sse) Responses-shaped wire recordings for a
    table of texts — the P4 analog of :func:`make_sse_recordings`,
    produced distributed via mapInPandas."""
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
                encode_responses_sse(
                    str(t) if t is not None else "",
                    msg_id=f"resp_{i}",
                    seed=seed * 1_000_003 + int(i),
                    # alternate the codex data-only/empty-terminal shape
                    # so both reduction arms stay under the byte gate
                    codex_style=bool(int(i) % 2),
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
