"""tapes_spark — a PySpark-native agent-telemetry log pipeline.

A from-scratch rebuild of the capabilities of papercomputeco/tapes
(reference analyzed in SURVEY.md) as an idiomatic Spark
parse -> enrich -> route -> aggregate pipeline over a table of
multi-turn agent transcripts:

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

Design rules (BASELINE.json north_rule):
  * DataFrame/SQL only; no RDDs.
  * Vectorized pandas/Arrow UDFs only where native Column expressions
    cannot express the op (iterative nested tag-strip, ordered
    stateful per-conversation folds). Never per-row Python UDFs.
  * Deterministic ids + idempotent sink writes (re-run == no-op).
  * Explicit skew handling (two-phase salted aggregation) and
    broadcast joins for dimension lookups.
"""

__version__ = "0.1.0"
