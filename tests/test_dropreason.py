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
    DROP_REASONS,
    drop_reason_cases,
    with_drop_reason,
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


def test_pipeline_reports_reason_histogram(spark, transcripts):
    from tapes_spark.pipeline import derive_report, run_pipeline

    res = run_pipeline(spark, transcripts)
    report = derive_report(res)
    hist = report["drop_reason_histogram"]
    assert sum(hist.values()) == report["quarantined_count"]
    assert set(hist) <= set(DROP_REASONS)
    assert hist.get("unknown_role", 0) >= 1  # the fixture's alien row
