"""Engine-invariant audits.

1. No per-row Python UDFs anywhere in the package (BASELINE.json
   input_hint: "vectorized pandas/Arrow UDFs (no per-row Python)");
   enforced by scanning the source for `F.udf(` / `@udf` registrations
   and by checking every built plan for BatchEvalPython (the row-at-a-time
   eval node — Arrow paths show ArrowEvalPython / FlatMapGroupsInPandas).
2. The derive report (A8) caps its samples.
"""

from __future__ import annotations

import os
import re

import pytest

import tapes_spark
from tapes_spark.pipeline import derive_report, run_pipeline

PKG_DIR = os.path.dirname(tapes_spark.__file__)

ROW_UDF_PATTERNS = (
    re.compile(r"\bF\.udf\s*\("),
    re.compile(r"^\s*@udf\b"),
    re.compile(r"\bspark\.udf\.register\b"),
    re.compile(r"\bUserDefinedFunction\s*\("),
)


def test_no_row_at_a_time_udf_in_source():
    offenders = []
    for root, _, files in os.walk(PKG_DIR):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    for pat in ROW_UDF_PATTERNS:
                        if pat.search(line):
                            offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, "row-at-a-time UDFs found:\n" + "\n".join(offenders)


def test_no_iterrows_in_source():
    """iterrows inside a pandas-UDF body is the same per-row-Python
    violation in spirit: ~50x the cost of column access.  Batch bodies
    must use column .tolist()/.values or numpy segment ops."""
    offenders = []
    for root, _, files in os.walk(PKG_DIR):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if ".iterrows()" in line:
                        offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, "iterrows found:\n" + "\n".join(offenders)


def test_no_batch_eval_python_in_plans(spark, transcripts):
    res = run_pipeline(spark, transcripts)
    for name, df in res.sinks.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, (
            f"{name} plan contains row-at-a-time Python eval"
        )


def test_derive_report_caps_samples(spark, transcripts):
    res = run_pipeline(spark, transcripts)
    report = derive_report(res)
    assert report["sample_cap"] == 20
    assert len(report["quarantined_samples"]) <= 20
    assert report["quarantined_count"] == 1
    assert report["verdicts_total"] == 1
    assert report["verdicts_unattached"] == 0
    assert report["web_attachments_count"] == 1
    assert report["plan_attachments_count"] == 1
    assert report["call_kind_histogram"]["main"] == 392
