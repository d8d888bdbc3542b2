"""Structured Streaming front-end for the derive pipeline (ST1-ST7).

Two surfaces:

  start_streaming_derive — file-source readStream over a transcripts
      directory; every micro-batch marks its conversations dirty and
      re-derives them THROUGH THE SAME batch pipeline via foreachBatch
      + IncrementalDeriver.  This is the reference's worker poll loop
      (deriveworker.go:46-52: poll 5s) with Spark's trigger as the poll;
      the debounce/max-lag knobs map to the trigger interval.  Exactly
      like the reference (ST7), there is NO event-time watermark dropping:
      a late turn re-dirties its conversation and the full per-session
      re-derive reflows it — no data is ever late-dropped.

  streaming_conv_stats — a pure Structured Streaming windowed aggregate
      over the turn stream (counts/tokens per conv per window) for
      dashboards; stateful, watermark-bounded, APPEND-mode safe.  This is
      the A7 stats surface as a live stream rather than a batch query.

Both use the same parse/normalize column stack as the batch path — one
shared normalization module used by batch and streaming (the reference's
P7 lesson: "a capture contract implemented twice ... drift while both
stay green").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def batch_fingerprint(batch_df: DataFrame) -> str:
    """Order-insensitive content hash over all columns: XOR of per-row
    xxhash64 + a multiplicity-sensitive SUM of the same hashes
    (decimal(38,0) — ANSI-safe, no overflow below ~10^19 rows) + row
    count.  XOR alone cancels even multiplicities (two batches whose rows
    all pair up XOR to 0 and would collide whenever counts match — after
    checkpoint loss such a NEW batch reusing a seen batch_id would be
    misread as a replay and silently dropped); the sum term breaks that
    class.  One tiny agg job per micro-batch."""
    cols = [F.col(c).cast("string") for c in batch_df.columns]
    h = F.xxhash64(*cols)
    row = batch_df.agg(
        F.bit_xor(h).alias("x"),
        F.sum(h.cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    return (
        f"{(row['x'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
        f"s{int(row['s'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}n{row['n']}"
    )


def start_streaming_derive(
    spark: SparkSession,
    input_dir: str,
    sink_base_dir: str,
    trigger_seconds: int = 5,
    query_name: str = "tapes-derive",
) -> StreamingQuery:
    """readStream(files) -> foreachBatch(mark dirty + incremental derive).

    Each micro-batch appends its rows to the input TapeTable (the
    immutable raw layer) and runs one IncrementalDeriver pass — so the
    streaming path and a later batch backfill produce byte-identical
    sinks (ST6).
    """
    from tapes_spark.tapelog import IncrementalDeriver, SinkWriter, TapeTable

    input_tape = TapeTable(spark, f"{sink_base_dir}/_raw_input")
    writer = SinkWriter(spark, sink_base_dir)
    deriver = IncrementalDeriver(spark, input_tape, writer)

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    # foreachBatch is at-least-once: a crash between input_tape.append and
    # the streaming checkpoint commit replays the micro-batch.  The raw
    # append must therefore be idempotent per DELIVERY — every append is
    # stamped with a run_id of (batch_id, content fingerprint) and skipped
    # when that exact delivery was already recorded (the derive pass still
    # runs; it is itself idempotent via the dirty-conv model, covering a
    # crash between append and derive).  Keying on batch_id ALONE would be
    # lossy after checkpoint deletion/recreation: batch numbering restarts
    # and files re-bucket, so NEW rows arriving under an already-seen
    # batch_id would be silently dropped.  With the fingerprint in the
    # key, a re-bucketed batch whose content differs is appended (raw is
    # at-least-once under checkpoint loss — overlap duplicates are handled
    # by the first-capture dedup, J1 — and never lossy), while a true
    # replay (same id, same rows) is skipped exactly as before.
    seen_runs: set[str] = {
        m.get("lineage", {}).get("run_id") for m in input_tape.snapshots()
    }

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run_id = f"stream-batch-{batch_id}-{batch_fingerprint(batch_df)}"
        if run_id not in seen_runs:
            # conv_id bucket stats ride the manifest so the deriver's
            # per-page drain scans prune raw file groups
            input_tape.append(
                batch_df, lineage={"run_id": run_id},
                partition_col="conv_id",
            )
            seen_runs.add(run_id)
        deriver.process(run_id)

    return (
        stream.writeStream.queryName(query_name)
        .foreachBatch(process_batch)
        .option("checkpointLocation", f"{sink_base_dir}/_stream_checkpoint")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def streaming_conv_stats(
    spark: SparkSession,
    input_dir: str,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed per-conversation stats stream (A7 live).

    Unlike the derive path, this is a classic streaming aggregate with
    state eviction — appropriate for dashboards where a bounded-lateness
    approximation is acceptable.  The authoritative numbers remain the
    batch/incremental sinks (ST7 deviation documented here on purpose).
    """
    from tapes_spark.operators.parse import with_parsed_features

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL).parquet(input_dir)
    )
    parsed = with_parsed_features(stream)
    return (
        parsed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("conv_id"))
        .agg(
            F.count("*").alias("turn_count"),
            F.sum("input_tokens").alias("input_tokens"),
            F.sum("output_tokens").alias("output_tokens"),
            F.count(F.when(F.col("stop_reason") == "error", 1)).alias(
                "error_count"
            ),
        )
    )
