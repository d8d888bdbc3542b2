"""Wire-trace bundle reader (S8) — replay on-disk capture bundles.

The reference's paperd proxy records every provider call as a bundle
directory ``turn-<ns-timestamp>-<seq>/`` holding ``request.json`` (method,
url, headers, base64 body, capture ts), ``response.sse`` (the raw SSE
bytes, gzip'd when the provider sent Content-Encoding: gzip) and
``meta.json`` (status, content type/encoding); its backfill walks the
bundles, gunzips, reduces the stream and re-posts ingest envelopes
(reference pkg/backfill/wiretrace.go:26-49,219-339; public recordings at
fixtures/recordings/*/turn-*/).

This module is the Spark-native loader for that PUBLIC layout:

  read_wire_bundles       — bundle dirs -> one row per turn with decoded
                            request fields, session identity from the
                            captured x-tapes-* headers, the gunzip'd SSE
                            text, and the reference's skip ladder
                            (non-/v1/messages, truncated body, empty
                            body) applied as a `skip_reason` column —
                            counted, never silently dropped.
  wire_trace_transcripts  — the full S8 composition: bundles ->
                            sse_events -> reduce_sse -> transcript rows
                            (conv_id = harness session id, turn order =
                            the bundle's capture sequence, ts = the
                            bundle's request timestamp, P12) ready for
                            run_pipeline.

Scale notes: the glob (`turn-*/request.json` etc.) is resolved by
Spark's file index once; per-bundle JSON parse is native from_json and
the only Python is the gzip inflate (stdlib, Arrow-batched mapInPandas —
Spark has no native gunzip expression for a BINARY column).  Each
bundle is independent, so the whole replay partitions freely; at a real
deployment the bundles land in object storage and the same globs apply.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from tapes_spark.sources.sse import reduce_sse, sse_events

_REQ_DDL = (
    "method string, url string, headers array<array<string>>, "
    "body_b64 string, body_truncated boolean, ts string"
)
_META_DDL = (
    "status int, content_type string, content_encoding string, "
    "response_bytes bigint, duration_ms double"
)
# request-body fields the envelope surfaces (model, stream flag)
_BODY_DDL = "model string, stream boolean"


def _turn_dir(path_col) -> F.Column:
    return F.regexp_extract(path_col, r"(turn-[^/]+)/[^/]+$", 1)


def _uri(captures_dir: str) -> str:
    """Scheme-qualify bare local paths: Hadoop's glob resolution needs an
    explicit filesystem for a glob in a parent path component (a bare
    /path/turn-*/x fails the default-FS file-existence probe)."""
    return (
        captures_dir
        if "://" in captures_dir
        else f"file://{captures_dir}"
    )


def _header(headers, name: str) -> F.Column:
    """Case-insensitive single-header lookup over the captured
    ``[[name, value], ...]`` pair list."""
    pair = F.try_element_at(
        F.filter(headers, lambda h: F.lower(h[0]) == name.lower()),
        F.lit(1),
    )
    return pair[1]


def read_wire_bundles(spark: SparkSession, captures_dir: str) -> DataFrame:
    """One row per ``turn-*`` bundle under *captures_dir*.

    Columns: turn_dir, turn_seq (the trailing sequence number — capture
    order), ts_request, session_id / agent_name / thread parent (from the
    x-tapes-* headers), model, stream, status, content_type,
    content_encoding, request_json (decoded body), sse (gunzip'd stream
    text, NULL when the bundle has none — a call that never completed),
    skip_reason (NULL = replayable; the reference's ladder:
    not_messages_call / body_truncated / empty_body,
    wiretrace.go:233-255)."""
    reqs = (
        spark.read.text(
            f"{_uri(captures_dir)}/turn-*/request.json", wholetext=True
        )
        .select(
            _turn_dir(F.input_file_name()).alias("turn_dir"),
            F.from_json("value", _REQ_DDL).alias("req"),
        )
    )
    metas = (
        spark.read.text(f"{_uri(captures_dir)}/turn-*/meta.json", wholetext=True)
        .select(
            _turn_dir(F.input_file_name()).alias("turn_dir"),
            F.from_json("value", _META_DDL).alias("meta"),
        )
    )
    # response.sse is RAW BYTES (gzip when the provider compressed) and a
    # bundle may legitimately lack one (client abort) -> left join below
    resps = (
        spark.read.format("binaryFile")
        .load(f"{_uri(captures_dir)}/turn-*/response.sse")
        .select(
            _turn_dir(F.col("path")).alias("turn_dir"),
            F.col("content").alias("resp_bytes"),
        )
    )
    headers = F.col("req.headers")
    body = F.unbase64(F.col("req.body_b64")).cast("string")
    url_path = F.regexp_extract(F.col("req.url"), r"^[a-z]+://[^/]+([^?]*)", 1)
    bundles = (
        reqs.join(metas, "turn_dir", "left")
        .join(resps, "turn_dir", "left")
        .select(
            "turn_dir",
            F.regexp_extract("turn_dir", r"-(\d+)$", 1)
            .cast("long")
            .alias("turn_seq"),
            F.to_timestamp(F.col("req.ts")).alias("ts_request"),
            _header(headers, "x-tapes-harness-session-id").alias("session_id"),
            _header(headers, "x-tapes-harness-id").alias("harness_id"),
            _header(headers, "x-tapes-agent-name").alias("agent_name"),
            _header(headers, "x-tapes-parent-harness-session-id").alias(
                "parent_session_id"
            ),
            F.col("req.method").alias("method"),
            url_path.alias("url_path"),
            body.alias("request_json"),
            F.get_json_object(body, "$.model").alias("model"),
            F.get_json_object(body, "$.stream").alias("stream"),
            F.col("meta.status").alias("status"),
            F.col("meta.content_type").alias("content_type"),
            F.col("meta.content_encoding").alias("content_encoding"),
            F.col("req.body_truncated").alias("body_truncated"),
            "resp_bytes",
        )
        .withColumn(
            "skip_reason",
            # the reference's replay ladder, as data instead of control
            # flow: counted, auditable, never silently dropped
            F.when(
                ~F.col("url_path").endswith("/v1/messages"),
                F.lit("not_messages_call"),
            )
            .when(F.col("body_truncated"), F.lit("body_truncated"))
            .when(
                F.coalesce(F.length("request_json"), F.lit(0)) == 0,
                F.lit("empty_body"),
            ),
        )
    )
    # gunzip: stdlib inflate per bundle, Arrow-batched (no native Spark
    # gunzip expression exists); non-gzip bytes pass through as utf-8
    out_schema = StructType(
        [
            StructField("turn_dir", StringType()),
            StructField("sse", StringType()),
        ]
    )

    def inflate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            texts = []
            for raw, enc in zip(pdf["resp_bytes"], pdf["content_encoding"]):
                if raw is None:
                    texts.append(None)
                    continue
                b = bytes(raw)
                if (
                    enc
                    and "gzip" in str(enc).lower()
                    and b[:2] == b"\x1f\x8b"
                ):
                    try:
                        b = gzip.decompress(b)
                    except OSError:
                        pass  # damaged member: keep raw bytes, the event
                        # parser yields nothing and the turn counts raw-only
                texts.append(b.decode("utf-8", errors="replace"))
            yield pd.DataFrame({"turn_dir": pdf["turn_dir"], "sse": texts})

    inflated = bundles.select(
        "turn_dir", "content_encoding", "resp_bytes"
    ).mapInPandas(inflate, out_schema)
    return bundles.drop("resp_bytes").join(inflated, "turn_dir", "left")


def wire_trace_transcripts(
    spark: SparkSession, captures_dir: str
) -> DataFrame:
    """Bundles -> transcript rows: the reduced assistant message per
    replayable turn, keyed by the captured harness session id, ordered by
    the bundle's capture sequence, stamped with the bundle's request
    timestamp (P12: capture time is the resolution clock).  Turns whose
    stream reduces to nothing (no response.sse, damaged stream) produce
    no row — the raw-only arm; audit them via read_wire_bundles."""
    bundles = read_wire_bundles(spark, captures_dir)
    replayable = bundles.filter(
        F.col("skip_reason").isNull() & F.col("sse").isNotNull()
    ).select(
        F.coalesce(F.col("session_id"), F.lit("wire-unknown")).alias(
            "conv_id"
        ),
        F.col("turn_seq").cast("int").alias("turn_idx"),
        "ts_request",
        "sse",
    )
    reduced = reduce_sse(
        sse_events(replayable, key_cols=("conv_id", "turn_idx"))
    )
    ts = replayable.select("conv_id", "turn_idx", "ts_request")
    return (
        reduced.join(ts, ["conv_id", "turn_idx"], "left")
        .filter(F.col("n_events") > 0)
        .select(
            F.col("conv_id").cast("string"),
            F.col("turn_idx").cast("int"),
            F.coalesce(F.col("role"), F.lit("assistant")).alias("role"),
            "text",
            F.coalesce(F.col("tool_name"), F.lit("")).alias("tool"),
            F.col("ts_request").cast("timestamp").alias("ts"),
        )
    )
