"""Transcript JSONL backfill source (SURVEY.md §2.1 S9, §2.2 P9).

Reads harness transcript files (one JSON object per line) and normalizes
them to the canonical transcripts schema
(conv_id, turn_idx, role, text, tool, ts).  Field aliases follow the
reference's transcript parser renames (tapes pkg/derive/transcript.go:
121-228: name->tool_name, id->tool_use_id) — we accept both spellings and
coalesce.  Malformed lines survive as quarantine rows (role='_corrupt')
rather than being dropped: "a turn that fails provider parsing is still
captured" (ingest.go:374-385).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSCRIPT_JSON_SCHEMA = (
    "conv_id string, session_id string, turn_idx int, idx int, "
    "role string, type string, text string, content string, "
    "tool string, tool_name string, name string, ts string, timestamp string"
)


def read_transcript_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL transcript dir/file -> canonical transcripts frame.

    Unknown fields are ignored (the raw line is not retained here — at
    real scale the raw layer is the ingest tape; this source feeds it).
    Rows missing a turn index are assigned one by arrival order per conv
    (the capture-order stamp, O1).
    """
    raw = spark.read.schema(TRANSCRIPT_JSON_SCHEMA).option(
        "mode", "PERMISSIVE"
    ).json(path)
    norm = raw.select(
        F.coalesce(F.col("conv_id"), F.col("session_id")).alias("conv_id"),
        F.coalesce(F.col("turn_idx"), F.col("idx")).alias("turn_idx_raw"),
        F.coalesce(F.col("role"), F.col("type")).alias("role"),
        F.coalesce(F.col("text"), F.col("content"), F.lit("")).alias("text"),
        F.coalesce(
            F.col("tool"), F.col("tool_name"), F.col("name"), F.lit("")
        ).alias("tool"),
        F.coalesce(
            F.to_timestamp(F.col("ts")), F.to_timestamp(F.col("timestamp"))
        ).alias("ts"),
    ).filter(F.col("conv_id").isNotNull())
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx_raw").asc_nulls_last(), F.col("ts").asc_nulls_last()
    )
    return (
        norm.withColumn(
            "turn_idx",
            F.coalesce(
                F.col("turn_idx_raw"), F.row_number().over(w) - F.lit(1)
            ).cast("int"),
        )
        .withColumn("role", F.coalesce(F.col("role"), F.lit("_corrupt")))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
