"""IncrementalDeriver — the derive-queue / dirty-session model (ST1-ST7).

The reference's streaming semantics, mapped to snapshot-based batch
increments over a TapeTable input:

  ST1 dirty-mark trigger  -> new input snapshots since the checkpoint
  ST3 per-session lock    -> partition-by-conv_id (one task owns a key)
  ST4 re-dirty safety     -> checkpoint advances only after a successful
                             commit; a turn landing mid-derive appears in
                             a later snapshot and re-dirties its conv
  ST6 at-least-once + idempotent -> re-deriving a conv overwrites its
                             partition with byte-identical rows (D2/D3)
  ST7 late data           -> a late turn re-dirties its conversation and
                             the WHOLE conversation re-derives (no
                             watermark drops — no data is ever late-dropped)

The unit of incremental recompute is one conversation: new snapshots
tell us WHICH conv_ids are dirty; we re-derive those conversations from
the FULL input (their complete history, not just the delta — derivation
is a pure function of the whole conversation) and overwrite exactly
those partitions in every sink.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tapes_spark.pipeline import run_pipeline
from tapes_spark.tapelog.table import TapeTable
from tapes_spark.tapelog.writer import SinkWriter


class IncrementalDeriver:
    def __init__(
        self, spark: SparkSession, input_tape: TapeTable, writer: SinkWriter
    ):
        self.spark = spark
        self.input_tape = input_tape
        self.writer = writer
        self._ckpt_path = os.path.join(writer.base_dir, "_checkpoint.json")

    # ------------------------------------------------------- checkpoint

    def checkpoint(self) -> int | None:
        try:
            with open(self._ckpt_path) as f:
                return json.load(f)["input_snapshot_id"]
        except FileNotFoundError:
            return None

    def _save_checkpoint(self, snapshot_id: int) -> None:
        tmp = self._ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"input_snapshot_id": snapshot_id}, f)
        os.replace(tmp, self._ckpt_path)

    # ------------------------------------------------------------ steps

    def dirty_conversations(self) -> list[str]:
        """conv_ids with raw activity since the checkpoint (the derive
        queue, ST1)."""
        delta = self.input_tape.read_incremental(self.checkpoint())
        if delta is None:
            return []
        return [r["conv_id"] for r in delta.select("conv_id").distinct().collect()]

    def process(self, run_id: str) -> dict:
        """One derive pass: re-derive dirty conversations, overwrite their
        partitions in every sink, advance the checkpoint.  Safe to call
        repeatedly; a pass with no new input is a no-op."""
        target_snapshot = self.input_tape.current_snapshot_id()
        ckpt = self.checkpoint()
        if target_snapshot is None or (ckpt or 0) >= target_snapshot:
            return {"dirty": 0, "skipped": True}
        dirty = self.dirty_conversations()
        if not dirty:
            self._save_checkpoint(target_snapshot)
            return {"dirty": 0, "skipped": True}
        full_input = self.input_tape.read()
        scoped = full_input.filter(F.col("conv_id").isin(dirty))
        result = run_pipeline(self.spark, scoped)
        fingerprint = f"in:{target_snapshot}"
        written = self.writer.write_all(
            result.sinks, run_id, fingerprint, conv_ids=dirty
        )
        # checkpoint advances ONLY after every sink committed (ST4)
        self._save_checkpoint(target_snapshot)
        return {
            "dirty": len(dirty),
            "skipped": False,
            "input_snapshot": target_snapshot,
            "snapshots": written,
        }
