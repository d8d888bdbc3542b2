"""C8 drop-reason gates: the full case corpus pinned (one case per
reason + the several-at-once order contract), mirroring the reference's
fixtures/drop-reason/cases layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from tapes_spark.operators.dropreason import (
    ALL_DROP_REASONS,
    DROP_REASONS,
    TRANSPORT_DROP_REASONS,
    drop_reason_cases,
    transport_drop_cases,
    transport_drop_histogram,
    with_drop_reason,
    with_full_drop_reason,
)

_CASE_SCHEMA = StructType(
    [
        StructField("case", StringType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("expected", StringType()),
    ]
)


def test_case_corpus_pinned(spark):
    df = spark.createDataFrame(drop_reason_cases(), _CASE_SCHEMA)
    got = {
        r["case"]: r["drop_reason"] for r in with_drop_reason(df).collect()
    }
    want = {c[0]: c[-1] for c in drop_reason_cases()}
    assert got == want


def test_every_reason_has_a_case():
    covered = {c[-1] for c in drop_reason_cases() if c[-1] is not None}
    assert covered == set(DROP_REASONS)


def test_vocabulary_is_closed_and_ordered():
    # the order is the contract (dropreason.go: "two implementations that
    # report different reasons for the same turn have produced two
    # different answers")
    assert DROP_REASONS == (
        "missing_attribution",
        "missing_order",
        "missing_role",
        "unknown_role",
        "empty_turn",
    )


def _transport_df(spark):
    from datetime import datetime, timedelta, timezone

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        (c, conv, idx, role, text, tool,
         None if off is None else t0 + timedelta(seconds=off), exp)
        for (c, conv, idx, role, text, tool, off, exp)
        in transport_drop_cases()
    ]
    return spark.createDataFrame(
        rows,
        "case string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp, expected string",
    )


def test_transport_case_corpus_pinned(spark):
    df = _transport_df(spark)
    got = {
        r["case"]: r["drop_reason"]
        for r in with_full_drop_reason(df).collect()
    }
    want = {c[0]: c[-1] for c in transport_drop_cases()}
    assert got == want


def test_transport_vocabulary_is_closed_and_ordered():
    assert TRANSPORT_DROP_REASONS == (
        "missing_ts",
        "duplicate_capture",
        "ts_regression",
    )
    # cross-tier order: derive tier first, then transport
    assert ALL_DROP_REASONS == DROP_REASONS + TRANSPORT_DROP_REASONS


def test_every_transport_reason_has_a_case():
    covered = {c[-1] for c in transport_drop_cases() if c[-1] is not None}
    assert covered >= set(TRANSPORT_DROP_REASONS)


def test_transport_histogram(spark):
    hist = transport_drop_histogram(_transport_df(spark))
    assert hist == {
        "duplicate_capture": 1,
        "ts_regression": 1,
        "missing_ts": 1,
        "missing_attribution": 1,
        "empty_turn": 1,
    }


def test_full_ladder_is_deterministic_on_ties(spark):
    """Two retransmits with IDENTICAL ts: exactly one stays clean and
    which one is run-stable (xxhash64 tiebreak), so re-derives agree."""
    from datetime import datetime, timezone

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("d", 0, "user", "hi", "", t0), ("d", 0, "user", "hi", "", t0)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    for _ in range(3):
        got = [
            r["drop_reason"] for r in with_full_drop_reason(df).collect()
        ]
        assert got.count("duplicate_capture") == 1
        assert got.count(None) == 1


def test_tie_break_is_stable_across_shuffles(spark):
    """Retransmits sharing a ts but DIFFERING in a non-key column: which
    row stays clean must not depend on shuffle order.  The tie-break
    hashes ALL columns (a hash of only the window's partition keys is
    constant within the partition and breaks no ties)."""
    from datetime import datetime, timezone

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("d", 0, "user", "hi", "", t0, f"src-{i}") for i in range(6)
    ]
    base = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, source string",
    )
    winners = set()
    for n_parts in (1, 3, 8):
        out = with_full_drop_reason(base.repartition(n_parts)).collect()
        clean = [r["source"] for r in out if r["drop_reason"] is None]
        assert len(clean) == 1
        winners.add(clean[0])
    assert len(winners) == 1, f"tie winner varied with partitioning: {winners}"


def test_metrics_tape_covers_full_ladder(spark):
    """run_metrics with the raw stream emits per-reason counters for the
    FULL 8-reason ladder: derive tier zero-filled from quarantine,
    transport tier audited over the raw capture stream."""
    from tapes_spark.pipeline import run_metrics, run_pipeline

    raw = _transport_df(spark).drop("case", "expected")
    res = run_pipeline(spark, raw, persist=False)
    rows = {
        r["metric"]: r["value"]
        for r in run_metrics(spark, res, "run-t", raw_transcripts=raw).collect()
    }
    assert {f"drop_reason_{r}": rows[f"drop_reason_{r}"]
            for r in ALL_DROP_REASONS} == {
        "drop_reason_missing_attribution": 1.0,
        "drop_reason_missing_order": 0.0,
        "drop_reason_missing_role": 0.0,
        "drop_reason_unknown_role": 0.0,
        "drop_reason_empty_turn": 1.0,
        "drop_reason_missing_ts": 1.0,
        "drop_reason_duplicate_capture": 1.0,
        "drop_reason_ts_regression": 1.0,
    }
    # without the raw stream, transport counters are omitted (unaudited
    # is never reported as zero) while derive-tier counters remain
    no_raw = {
        r["metric"]
        for r in run_metrics(spark, res, "run-t2").collect()
    }
    assert "drop_reason_missing_ts" not in no_raw
    assert "drop_reason_empty_turn" in no_raw


def test_pipeline_reports_reason_histogram(spark, transcripts):
    from tapes_spark.pipeline import derive_report, run_pipeline

    res = run_pipeline(spark, transcripts)
    report = derive_report(res)
    hist = report["drop_reason_histogram"]
    assert sum(hist.values()) == report["quarantined_count"]
    assert set(hist) <= set(DROP_REASONS)
    assert hist.get("unknown_role", 0) >= 1  # the fixture's alien row
