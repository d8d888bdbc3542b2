"""Attribution-correction overlay (J9).

The raw layer is append-only and immutable; a mis-attributed capture is
fixed by APPENDING a correction row, never by editing raw.  Every raw
scan applies the overlay: for each raw turn, the LATEST correction (max
correction_seq) wins and its non-null fields replace the raw values —
the Spark form of the reference's LEFT JOIN LATERAL ... ORDER BY id DESC
LIMIT 1 + COALESCE read (tapes
pkg/storage/postgres/queries/raw_turns.sql:24-55).

Corrections schema: (conv_id, turn_idx, corrected_conv_id,
correction_seq).  The key addresses the raw turn; corrected_conv_id is
the attribution fix (the harness_session_id analog in the flattened
shape).

Scale: corrections are rare (human-filed); the overlay join broadcasts
them, so the raw scan stays a map-only stage — no shuffle added to the
read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_corrections(corrections: DataFrame) -> DataFrame:
    """One row per raw-turn key: the highest-seq correction wins."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("correction_seq").desc()
    )
    return (
        corrections.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("conv_id").alias("_raw_conv_id"),
            F.col("turn_idx").alias("_raw_turn_idx"),
            "corrected_conv_id",
        )
    )


def apply_corrections(
    transcripts: DataFrame, corrections: DataFrame
) -> DataFrame:
    """The overlayed raw scan: same schema as *transcripts*, with
    attribution rewritten where a correction exists."""
    latest = F.broadcast(latest_corrections(corrections))
    joined = transcripts.join(
        latest,
        (transcripts["conv_id"] == latest["_raw_conv_id"])
        & (transcripts["turn_idx"] == latest["_raw_turn_idx"]),
        "left",
    )
    out_cols = [
        F.coalesce(F.col("corrected_conv_id"), F.col("conv_id")).alias(
            "conv_id"
        )
        if c == "conv_id"
        else F.col(c)
        for c in transcripts.columns
    ]
    # src_conv_id (the pre-overlay attribution) is the stable tie-break
    # the partition-sensitive folds need: a corrected turn keeps its
    # original turn_idx, so it can collide with an existing (conv_id,
    # turn_idx) in the target conversation — sorts by (conv_id, turn_idx)
    # alone would then be shuffle-nondeterministic (chain hashes,
    # first-capture flags differing between runs).  cluster_sorted /
    # with_first_capture append this column to their ordering whenever it
    # is present.  Uncorrected rows sort before corrected ones at the
    # same index only through src_conv_id's lexicographic order — what
    # matters is that SOME total order is stable.
    return joined.select(
        *out_cols, F.col("conv_id").alias("src_conv_id")
    )
