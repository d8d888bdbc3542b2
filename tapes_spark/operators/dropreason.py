"""Drop-reason taxonomy (C8) — WHY a turn is not derivable.

The reference specifies drop reasons as a closed, ORDERED vocabulary of
wire-visible strings, one fixture case per reason, where the order is
part of the contract because a turn can satisfy several reasons at once
(tapes pkg/capture/dropreason.go; fixtures/drop-reason/cases/).  Its
capture-policy half (upstream_status, non_turn_request, request_decode,
empty_response, unknown_provider, ...) guards what is capturable from
wire traffic; the transport half (sem_full, client_disconnect,
ingest_timeout, ...) is deliberately left to each deployment.

This is the derive-tier analog for the flattened transcript shape: the
reasons say what makes a row DERIVABLE at all, in the order a row meets
them.  Like the reference, the strings are the contract — they label
metrics rows and the quarantine tape.

  missing_attribution  conv_id null/empty: no conversation to attribute
                       to (the missing harness_session_id analog)
  missing_order        turn_idx null/negative: no position in the chain
                       (capture order is the derive substrate, O1)
  missing_role         role null/empty: the row has no speaker at all
  unknown_role         a speaker no reducer claims (the unknown_provider
                       analog: a coverage gap, not traffic damage)
  empty_turn           no text AND no tool: nothing to reduce (the
                       empty_response analog)

A derivable row carries reason NULL.  Quarantined rows are COUNTED and
kept (C6: never dropped from raw), with per-reason metrics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_ROLES = ("user", "assistant", "tool", "system")

# closed vocabulary, in ladder order (the order IS the contract)
DROP_REASONS = (
    "missing_attribution",
    "missing_order",
    "missing_role",
    "unknown_role",
    "empty_turn",
)

# Transport-tier analogs (the reference's capture-policy half leaves these
# to each deployment; dropreason.go's corpus pins them as wire-visible
# vocabulary).  For the flattened transcript shape the transport damage a
# collector sees is: a row with no capture time, a retransmitted capture
# of the SAME turn (identical payload under an identical key — distinct
# from J1's content re-SEND at a LATER turn_idx, which is conversation
# behavior, not transport damage), and a capture-order violation (a
# turn's ts earlier than an already-captured earlier turn).  They rank
# AFTER the derive-tier ladder: a row must first be attributable at all
# before its transport timing can be judged.
TRANSPORT_DROP_REASONS = (
    "missing_ts",
    "duplicate_capture",
    "ts_regression",
)

ALL_DROP_REASONS = DROP_REASONS + TRANSPORT_DROP_REASONS


def drop_reason_col() -> Column:
    """The ordered rule ladder as one native expression; NULL = derivable."""
    conv = F.col("conv_id")
    idx = F.col("turn_idx")
    role = F.col("role")
    return (
        F.when(conv.isNull() | (conv == ""), "missing_attribution")
        .when(idx.isNull() | (idx < 0), "missing_order")
        .when(role.isNull() | (role == ""), "missing_role")
        .when(~role.isin(*VALID_ROLES), "unknown_role")
        .when(
            (F.coalesce(F.col("text"), F.lit("")) == "")
            & (F.coalesce(F.col("tool"), F.lit("")) == ""),
            "empty_turn",
        )
        .otherwise(F.lit(None).cast("string"))
    )


def with_drop_reason(df: DataFrame) -> DataFrame:
    return df.withColumn("drop_reason", drop_reason_col())


def with_full_drop_reason(df: DataFrame) -> DataFrame:
    """The full 8-reason ladder: derive tier first, then transport tier.

    Transport reasons need per-conversation windows (one conv_id shuffle;
    the same clustering every pipeline stage reuses):

      missing_ts        ts null — no capture time at all
      duplicate_capture an identical (conv_id, turn_idx, role, text,
                        tool) payload was already captured (retransmit);
                        the FIRST capture by ts (tie: arbitrary-but-
                        stable xxhash64 order) stays clean
      ts_regression     ts earlier than a previously-captured earlier
                        turn's ts (wire-order violation)

    The derive pipeline itself quarantines only the derive tier —
    re-captures flow through to J1's first-capture dedup by design (C6:
    counted, never dropped) — so this full ladder is the OBSERVABILITY
    surface: feed it raw transcripts to audit transport damage.
    """
    from pyspark.sql import Window

    derive_reason = drop_reason_col()
    # tie-break (same ts) on a hash of ALL columns — including the ones
    # outside the dup key — so which retransmit stays "clean" is
    # deterministic across shuffles (a hash of only the partition keys is
    # constant within the partition and breaks no ties; fully identical
    # rows are interchangeable, so their relative order cannot matter)
    all_cols_hash = F.xxhash64(
        *[F.col(c).cast("string") for c in df.columns]
    )
    dup_w = Window.partitionBy(
        "conv_id", "turn_idx", "role", "text", "tool"
    ).orderBy(F.col("ts").asc_nulls_last(), all_cols_hash)
    is_dup = F.row_number().over(dup_w) > 1
    # max ts over strictly-earlier turn_idx rows in the conversation —
    # RANGE frame, not ROWS: a ROWS frame would include same-turn_idx
    # peers in an arbitrary (nondeterministic) order
    prev_w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    regressed = F.col("ts") < F.max("ts").over(prev_w)
    transport = (
        F.when(F.col("ts").isNull(), "missing_ts")
        .when(is_dup, "duplicate_capture")
        .when(F.coalesce(regressed, F.lit(False)), "ts_regression")
        .otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("drop_reason", F.coalesce(derive_reason, transport))


def transport_drop_histogram(df: DataFrame) -> dict:
    """Per-reason counts over the FULL ladder — the audit counter surface
    (reference: per-reason Prometheus counters, capture/metrics)."""
    rows = (
        with_full_drop_reason(df)
        .filter(F.col("drop_reason").isNotNull())
        .groupBy("drop_reason")
        .count()
        .collect()
    )
    return {r["drop_reason"]: r["count"] for r in rows}


def drop_reason_cases() -> list[tuple]:
    """One fixture row per reason (the fixtures/drop-reason/cases analog),
    plus one row that satisfies SEVERAL reasons at once — the ladder must
    answer with the FIRST (order contract), and one fully-derivable row.

    Rows: (case, conv_id, turn_idx, role, text, tool, expected_reason).
    """
    return [
        ("missing_attribution", None, 0, "user", "hi", "",
         "missing_attribution"),
        ("missing_attribution_empty", "", 0, "user", "hi", "",
         "missing_attribution"),
        ("missing_order", "c", None, "user", "hi", "", "missing_order"),
        ("missing_order_negative", "c", -1, "user", "hi", "",
         "missing_order"),
        ("missing_role", "c", 0, None, "hi", "", "missing_role"),
        ("unknown_role", "c", 0, "alien", "hi", "", "unknown_role"),
        ("empty_turn", "c", 0, "assistant", "", "", "empty_turn"),
        ("empty_turn_null_text", "c", 0, "assistant", None, None,
         "empty_turn"),
        # several at once: no attribution AND unknown role AND empty —
        # the ladder answers missing_attribution, the first it meets
        ("multi_reason", None, None, "alien", "", "",
         "missing_attribution"),
        ("derivable", "c", 0, "user", "hi", "", None),
        ("derivable_tool_only", "c", 1, "assistant", "", "Bash", None),
    ]


def transport_drop_cases() -> list[tuple]:
    """Transport-tier case corpus: each row of one small wire capture,
    with its expected FULL-ladder reason (None = clean).  Pins the order
    contract across tiers: derive-tier reasons always win, and within
    the transport tier missing_ts > duplicate_capture > ts_regression.

    Rows: (case, conv_id, turn_idx, role, text, tool, ts_offset_sec,
    expected_reason); ts_offset None = no capture time.
    """
    return [
        # conv "d": a clean capture, a retransmit of it, normal progress,
        # then a capture-order violation
        ("clean_first_capture", "d", 0, "user", "hi", "", 0, None),
        ("duplicate_capture", "d", 0, "user", "hi", "", 5,
         "duplicate_capture"),
        ("clean_progress", "d", 1, "assistant", "ok", "", 10, None),
        ("ts_regression", "d", 2, "user", "next", "", 3, "ts_regression"),
        # same content re-SENT at a later turn_idx is conversation
        # behavior (J1 first-capture territory), NOT transport damage
        ("resend_not_duplicate", "d", 3, "user", "hi", "", 20, None),
        # no capture time at all — and it outranks duplicate_capture
        # even though the payload also matches turn 0 (transport ladder)
        ("missing_ts_beats_duplicate", "d", 0, "user", "hi", "", None,
         "missing_ts"),
        # derive tier always wins over transport (cross-tier ladder)
        ("derive_tier_first", None, 0, "user", "hi", "", None,
         "missing_attribution"),
        ("empty_turn_beats_missing_ts", "d", 4, "assistant", "", "", None,
         "empty_turn"),
    ]
