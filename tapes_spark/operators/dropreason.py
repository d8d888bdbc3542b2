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
