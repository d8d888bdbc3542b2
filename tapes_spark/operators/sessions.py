"""Session-level folds: derived title, display name, session hierarchy.

  derived title  — the title-gen shadow call's response IS the session's
                   display title (reference pkg/derive/fold.go:18-48):
                   extract {"title": ...} tolerating prose around the
                   JSON, trim, cap at 255.  A re-derive that no longer
                   produces a title clears the stale value (the fold
                   yields NULL, never a leftover — derive.go:324-339).
  display name   — the read-side degrade ladder (session_reads.go:73,
                   UpdateSessionDisplayName): user rename > derived
                   title > the session id itself.
  hierarchy      — parent_conv_id from the envelope side-channel
                   (sessions.sql:124-154).  A parent named before its
                   own first turn lands gets a minimal PLACEHOLDER row
                   so the link never dangles; the real row back-fills
                   naturally on a later derive (InsertSessionPlaceholder
                   semantics).

The transcripts input shape has no envelope, so parent claims arrive as
a side table (conv_id, parent_conv_id[, display_name]) — the same
adaptation as the attribution-correction overlay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_TITLE_LEN = 255  # fold.go:17 maxFoldedTitleLen


def derived_titles(enriched: DataFrame) -> DataFrame:
    """conv_id -> derived_title from the LAST parseable title call.

    The JSON object may be wrapped in prose (fold.go:28-31: first '{' to
    last '}'); a call whose blob doesn't parse or has an empty title
    contributes nothing.
    """
    blob = F.regexp_extract(F.col("text"), r"(?s)(\{.*\})", 1)
    title = F.btrim(F.get_json_object(blob, "$.title"))
    title = F.substring(title, 1, MAX_TITLE_LEN)
    candidates = enriched.filter(F.col("call_kind") == "title").select(
        "conv_id", "turn_idx", title.alias("t")
    ).filter(F.col("t").isNotNull() & (F.col("t") != ""))
    return candidates.groupBy("conv_id").agg(
        F.max_by("t", "turn_idx").alias("derived_title")
    )


def with_titles(conv_aggs: DataFrame, enriched: DataFrame) -> DataFrame:
    """Fold derived_title into conv_aggregates and compute display_name
    (degrade ladder without a rename side input: title > conv_id)."""
    titled = conv_aggs.join(derived_titles(enriched), "conv_id", "left")
    return titled.withColumn(
        "display_name", F.coalesce(F.col("derived_title"), F.col("conv_id"))
    )


def with_hierarchy(
    conv_aggs: DataFrame, session_meta: DataFrame
) -> DataFrame:
    """Attach parent_conv_id and materialize placeholder rows for parents
    that have no conversation of their own yet.

    *session_meta*: (conv_id, parent_conv_id[, display_name]).  The
    optional display_name is the user-rename rung of the ladder and wins
    over the derived title.
    """
    meta = session_meta.select(
        "conv_id",
        F.col("parent_conv_id"),
        *(
            [F.col("display_name").alias("renamed_to")]
            if "display_name" in session_meta.columns
            else [F.lit(None).cast("string").alias("renamed_to")]
        ),
    )
    linked = conv_aggs.join(meta, "conv_id", "left")
    if "display_name" in conv_aggs.columns:
        linked = linked.withColumn(
            "display_name",
            F.coalesce(
                F.nullif(F.col("renamed_to"), F.lit("")),
                F.col("display_name"),
            ),
        )
    linked = linked.drop("renamed_to")

    # placeholder rows: parents referenced but absent from conv_aggs
    known = conv_aggs.select("conv_id")
    missing_parents = (
        meta.select(F.col("parent_conv_id").alias("conv_id"))
        .filter(F.col("conv_id").isNotNull())
        .distinct()
        .join(known, "conv_id", "left_anti")
    )
    placeholders = missing_parents
    for f in linked.schema.fields:
        if f.name == "conv_id":
            continue
        if f.name == "is_placeholder":
            continue
        placeholders = placeholders.withColumn(
            f.name, F.lit(None).cast(f.dataType)
        )
    return (
        linked.withColumn("is_placeholder", F.lit(False))
        .unionByName(placeholders.withColumn("is_placeholder", F.lit(True)))
    )
