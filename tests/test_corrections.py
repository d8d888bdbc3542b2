"""J9 attribution-correction overlay gates: latest-wins semantics, raw
immutability (overlay at read, never edit), re-derive reflects the fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators.corrections import apply_corrections, latest_corrections
from tapes_spark.pipeline import run_pipeline

CORR_DDL = (
    "conv_id string, turn_idx int, corrected_conv_id string, "
    "correction_seq int"
)


class TestOverlay:
    def test_latest_wins(self, spark):
        corr = spark.createDataFrame(
            [
                ("c1", 0, "wrong", 1),
                ("c1", 0, "right", 2),  # later correction supersedes
                ("c1", 3, "other", 1),
            ],
            CORR_DDL,
        )
        got = {
            (r["_raw_conv_id"], r["_raw_turn_idx"]): r["corrected_conv_id"]
            for r in latest_corrections(corr).collect()
        }
        assert got == {("c1", 0): "right", ("c1", 3): "other"}

    def test_overlay_preserves_schema_and_rows(self, spark, transcripts):
        corr = spark.createDataFrame(
            [("conv-000000", 0, "conv-000001", 1)], CORR_DDL
        )
        out = apply_corrections(transcripts, corr)
        # original schema preserved, plus the src_conv_id tie-break the
        # partition-sensitive folds use on (conv_id, turn_idx) collisions
        assert out.columns == transcripts.columns + ["src_conv_id"]
        assert out.count() == transcripts.count()
        # the corrected turn now sits beside conv-000001's own turn 0
        twin = transcripts.filter(
            (F.col("conv_id") == "conv-000001") & (F.col("turn_idx") == 0)
        ).count()
        moved = out.filter(
            (F.col("conv_id") == "conv-000001") & (F.col("turn_idx") == 0)
        ).count()
        assert moved == twin + 1
        assert out.filter(
            (F.col("conv_id") == "conv-000000") & (F.col("turn_idx") == 0)
        ).count() == 0

    def test_rederive_reflects_correction(self, spark, transcripts):
        """Moving ALL of conv-000000's turns to a new conv id must show up
        in conv_aggregates — and the raw input is untouched."""
        turns = [
            r["turn_idx"]
            for r in transcripts.filter(
                F.col("conv_id") == "conv-000000"
            ).select("turn_idx").collect()
        ]
        corr = spark.createDataFrame(
            [("conv-000000", t, "conv-fixed", 1) for t in turns], CORR_DDL
        )
        res = run_pipeline(spark, transcripts, corrections=corr)
        aggs = {r["conv_id"]: r["turn_count"]
                for r in res.sinks["conv_aggregates"].collect()}
        assert "conv-000000" not in aggs
        assert aggs["conv-fixed"] == len(turns)
        # raw unchanged (overlay at read, not an edit)
        assert transcripts.filter(
            F.col("conv_id") == "conv-000000"
        ).count() == len(turns)

    def test_no_corrections_is_identity(self, spark, transcripts):
        empty = spark.createDataFrame([], CORR_DDL)
        out = apply_corrections(transcripts, empty).drop("src_conv_id")
        assert out.exceptAll(transcripts).count() == 0
        assert transcripts.exceptAll(out).count() == 0

    def test_collision_fold_is_deterministic(self, spark, transcripts):
        """A correction that lands a turn on an occupied (conv_id,
        turn_idx) must still produce run-stable chain hashes and
        first-capture flags: the folds tie-break on src_conv_id (the
        pre-overlay attribution), giving a total order where (conv_id,
        turn_idx) alone is ambiguous."""
        corr = spark.createDataFrame(
            [("conv-000000", t, "conv-000001", 1) for t in range(5)],
            CORR_DDL,
        )

        def chain_sig():
            res = run_pipeline(spark, transcripts, corrections=corr,
                               persist=False)
            rows = res.sinks["chain_tape"].filter(
                F.col("conv_id") == "conv-000001"
            ).collect()
            return sorted(
                (r["conv_id"], r["turn_idx"], r["node_hash"]) for r in rows
            )

        first = chain_sig()
        assert first  # the merged conversation exists
        for _ in range(2):  # re-run: shuffle layouts differ, hashes must not
            assert chain_sig() == first
