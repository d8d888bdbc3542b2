"""Structured Streaming gates: the streaming derive must produce sinks
byte-identical to the batch path over the same rows (ST6), and the
windowed stats stream must run stateful aggregation with a watermark."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tapes_spark.fixtures import ARROW_SCHEMA, generate_transcripts
from tapes_spark.pipeline import run_pipeline
from tapes_spark.streaming import start_streaming_derive, streaming_conv_stats
from tapes_spark.tapelog import SinkWriter


def _write_chunks(dirpath: str, n_chunks: int = 3) -> int:
    """Write the unit corpus as n parquet files (arriving 'micro-batches')."""
    import pyarrow as pa

    os.makedirs(dirpath, exist_ok=True)
    rows = generate_transcripts(8, 12, 42)
    per = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        cols = list(zip(*chunk))
        table = pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, ARROW_SCHEMA)],
            schema=ARROW_SCHEMA,
        )
        pq.write_table(table, os.path.join(dirpath, f"chunk-{i}.parquet"))
    return len(rows)


def _comparable(df):
    cols = [
        F.to_json(F.col(f.name)).alias(f.name)
        if f.dataType.typeName() in ("map", "array", "struct")
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(cols)


@pytest.mark.slow
def test_streaming_derive_matches_batch(spark, transcripts, tmp_path):
    input_dir = str(tmp_path / "arrivals")
    sink_dir = str(tmp_path / "stream_sinks")
    n_rows = _write_chunks(input_dir, n_chunks=3)

    q = start_streaming_derive(spark, input_dir, sink_dir, trigger_seconds=1)
    try:
        deadline = time.time() + 120
        writer = SinkWriter(spark, sink_dir)
        while time.time() < deadline:
            q.processAllAvailable()
            sid = writer.tables["conversation_tape"].current_snapshot_id()
            if sid:
                from tapes_spark.tapelog import TapeTable

                raw = TapeTable(spark, f"{sink_dir}/_raw_input")
                if raw.read().count() == n_rows:
                    # one more pass in case the last batch landed raw rows
                    # but the derive of them is in flight
                    q.processAllAvailable()
                    break
            time.sleep(1)
    finally:
        q.stop()

    writer = SinkWriter(spark, sink_dir)
    batch = run_pipeline(spark, transcripts)
    for name in ("conversation_tape", "tool_tape", "error_tape",
                 "conv_aggregates"):
        got = _comparable(writer.read(name))
        want = _comparable(batch.sinks[name])
        assert got.exceptAll(want).count() == 0, name
        assert want.exceptAll(got).count() == 0, name


@pytest.mark.slow
def test_streaming_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: losing the streaming checkpoint and
    replaying every micro-batch must NOT duplicate raw rows (the appends
    are idempotent per batch_id via lineage run_id)."""
    import shutil

    from tapes_spark.tapelog import TapeTable

    input_dir = str(tmp_path / "arrivals3")
    sink_dir = str(tmp_path / "stream_sinks3")
    n_rows = _write_chunks(input_dir, n_chunks=2)

    def run_once():
        q = start_streaming_derive(spark, input_dir, sink_dir, trigger_seconds=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    raw = TapeTable(spark, f"{sink_dir}/_raw_input")
    assert raw.read().count() == n_rows
    writer = SinkWriter(spark, sink_dir)
    before = sorted(
        (r["conv_id"], r["turn_count"])
        for r in writer.read("conv_aggregates").collect()
    )

    # simulate the crash-before-checkpoint-commit replay: wipe the
    # checkpoint so every batch (same ids, same rows) is re-delivered
    shutil.rmtree(f"{sink_dir}/_stream_checkpoint")
    run_once()
    assert raw.read().count() == n_rows  # no duplicate appends

    after = sorted(
        (r["conv_id"], r["turn_count"])
        for r in writer.read("conv_aggregates").collect()
    )
    assert after == before  # downstream rollups not double-counted


@pytest.mark.slow
def test_checkpoint_loss_with_new_files_loses_nothing(spark, tmp_path):
    """After checkpoint deletion batch numbering RESTARTS, so new files can
    arrive under an already-seen batch_id.  The replay skip keys on
    (batch_id, content fingerprint), so a re-bucketed batch whose content
    differs is appended — keying on batch_id alone silently dropped the
    new rows (raw is at-least-once under checkpoint loss, never lossy;
    overlap duplicates are J1 first-capture's job)."""
    import pyarrow as pa
    import shutil

    from tapes_spark.tapelog import TapeTable

    input_dir = str(tmp_path / "arrivals4")
    sink_dir = str(tmp_path / "stream_sinks4")
    n_rows = _write_chunks(input_dir, n_chunks=1)

    def run_once():
        q = start_streaming_derive(spark, input_dir, sink_dir,
                                   trigger_seconds=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    raw = TapeTable(spark, f"{sink_dir}/_raw_input")
    assert raw.read().count() == n_rows

    # checkpoint gone + a NEW conversation lands: the restarted stream
    # re-buckets everything into fresh batch ids starting at 0
    shutil.rmtree(f"{sink_dir}/_stream_checkpoint")
    new_rows = [
        ("late-" + r[0],) + tuple(r[1:]) for r in generate_transcripts(2, 6, 99)
    ]
    cols = list(zip(*new_rows))
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, ARROW_SCHEMA)],
            schema=ARROW_SCHEMA,
        ),
        os.path.join(input_dir, "late-chunk.parquet"),
    )
    run_once()
    # every new row is in raw; old rows appear at least once (duplicates
    # from re-bucketed overlap are allowed and deduped downstream)
    got = raw.read()
    assert got.count() >= n_rows + len(new_rows)
    new_convs = {r[0] for r in new_rows}
    got_new = got.filter(F.col("conv_id").isin(list(new_convs))).count()
    assert got_new == len(new_rows)


@pytest.mark.slow
def test_streaming_conv_stats_runs(spark, tmp_path):
    input_dir = str(tmp_path / "arrivals2")
    _write_chunks(input_dir, n_chunks=2)
    stats = streaming_conv_stats(spark, input_dir, "5 minutes", "10 minutes")
    q = (
        stats.writeStream.format("memory")
        .queryName("conv_stats_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode emits only watermark-closed windows; the final
        # windows stay open, so just assert the query ran and state exists
        assert q.lastProgress is not None
        n_state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert n_state > 0
    finally:
        q.stop()


def test_batch_fingerprint_is_multiplicity_sensitive(spark):
    """XOR alone cancels even multiplicities: two batches whose rows all
    pair up XOR to 0 and collide whenever counts match — after checkpoint
    loss a NEW batch under a seen batch_id would be misread as a replay
    and silently dropped.  The sum term must separate them."""
    from tapes_spark.streaming.stream import batch_fingerprint

    schema = "conv_id string, turn_idx int"
    a = spark.createDataFrame([("a", 0), ("a", 0)], schema)
    b = spark.createDataFrame([("b", 7), ("b", 7)], schema)
    fa, fb = batch_fingerprint(a), batch_fingerprint(b)
    assert fa != fb
    # identical content (any row order) still fingerprints identically
    assert batch_fingerprint(spark.createDataFrame([("a", 0), ("a", 0)], schema)) == fa
