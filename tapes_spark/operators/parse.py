"""Parse stage — vectorized feature extraction from turn text.

Rebuilds the reference's request/response parsing surface (SURVEY.md §2.2)
for the transcripts input shape: turns arrive pre-reduced as ``text`` with
embedded markers, so parsing is pure ``regexp_extract`` / ``get_json_object``
column work — JVM-side, inside whole-stage codegen, no Python in the hot
path.

Extracted features (all nullable columns added to the frame):
  model          — model marker, then N6-normalized join key ``model_norm``
  input_tokens / output_tokens / cache_read_tokens / cache_write_tokens
                 — usage marker (mirrors tapes' usage JSONB,
                   pkg/llm/response.go:40-61)
  stop_reason    — stop marker (pkg/merkle/node.go:60)
  verdict_*      — ``<block>yes|no`` verdict extraction
                   (pkg/derive/verdict.go:14-57, regex at :22)
  error_signature— normalized error head from failing tool results
  is_git_activity— Bash tool_use containing git commit/push
                   (pkg/sessions/content.go:82-106)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tapes_spark.functions.normalize import normalize_model_col

# model names may themselves carry a "[1m]" marker (normalized away by N6),
# so the capture allows one bracketed suffix before the closing bracket
MODEL_RE = r"\[model: ([^\[\]]+(?:\[1m\])?)\]"
USAGE_RE = (
    r"\[usage: in=(\d+) out=(\d+) cache_read=(\d+) cache_write=(\d+)\]"
)
STOP_RE = r"\[stop_reason: ([a-z_]+)\]"
# reference blockVerdictPattern: (?i)<block>\s*(yes|no)  (verdict.go:22)
VERDICT_RE = r"(?i)<block>\s*(yes|no)"
# error signature: the error head up to the first ':'-terminated clause
ERROR_HEAD_RE = r"^error: ([a-z][a-z0-9 _-]*)"
GIT_ACTIVITY_RE = r"git (commit|push)"


def _extract_long(c: Column, pattern: str, group: int) -> Column:
    s = F.regexp_extract(c, pattern, group)
    return F.when(s == "", None).otherwise(s.cast("long"))


def _usage_field(
    parts: Column, idx: int, key: str, body: Column, pattern: str
) -> Column:
    """One usage integer: fast path splits the (short) usage body on
    spaces and reads field *idx* when it carries the expected ``key=``
    prefix in well-formed order; any malformed/reordered body falls back
    to the exact regex, so results are bit-identical to the regex-only
    form (r6 bench: 4 anchored splits ~2x cheaper than 4 regex scans of
    the body, and the fallback never fires on well-formed markers)."""
    el = F.try_element_at(parts, F.lit(idx))
    fast = F.when(
        el.startswith(key), F.substring_index(el, "=", -1).try_cast("long")
    )
    return F.coalesce(fast, _extract_long(body, pattern, 1))


def with_parsed_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add all parse-stage feature columns. Pure native expressions.

    The usage marker is located ONCE with a single regex over the full
    text; the four token fields then parse the short captured substring
    (one long-text scan instead of four).
    """
    t = F.col(text_col)
    # role-gate every text scan: model/usage/stop/verdict markers only occur
    # in assistant turns, error heads only in tool results — conditions test
    # the cheap `role` column so ~half the rows never regex-scan text at all
    is_assistant = F.col("role") == "assistant"
    is_tool_row = F.col("role") == "tool"
    empty = F.lit("")
    model = F.when(is_assistant, F.regexp_extract(t, MODEL_RE, 1)).otherwise(empty)
    verdict = F.lower(
        F.when(
            is_assistant & t.contains("<block>"),
            F.regexp_extract(t, VERDICT_RE, 1),
        ).otherwise(empty)
    )
    err = F.when(
        is_tool_row & t.startswith("error:"), F.regexp_extract(t, ERROR_HEAD_RE, 1)
    ).otherwise(empty)
    usage = F.when(
        is_assistant, F.regexp_extract(t, r"\[usage: ([^\]]+)\]", 1)
    ).otherwise(empty)
    return (
        df.withColumn("model", F.when(model == "", None).otherwise(model))
        .withColumn(
            "model_norm",
            F.when(model == "", None).otherwise(normalize_model_col(model)),
        )
        .withColumn("_usage", usage)
        .withColumn("_usage_parts", F.split(F.col("_usage"), " "))
        .withColumn(
            "input_tokens",
            _usage_field(
                F.col("_usage_parts"), 1, "in=", F.col("_usage"), r"in=(\d+)"
            ),
        )
        .withColumn(
            "output_tokens",
            _usage_field(
                F.col("_usage_parts"), 2, "out=", F.col("_usage"), r"out=(\d+)"
            ),
        )
        .withColumn(
            "cache_read_tokens",
            _usage_field(
                F.col("_usage_parts"), 3, "cache_read=",
                F.col("_usage"), r"cache_read=(\d+)",
            ),
        )
        .withColumn(
            "cache_write_tokens",
            _usage_field(
                F.col("_usage_parts"), 4, "cache_write=",
                F.col("_usage"), r"cache_write=(\d+)",
            ),
        )
        .drop("_usage", "_usage_parts")
        .withColumn(
            # nullif evaluates the extract ONCE — the when(extract != "",
            # extract) form relied on subexpression elimination to avoid a
            # second full-text regex scan per assistant row
            "stop_reason",
            F.when(
                is_assistant,
                F.nullif(F.regexp_extract(t, STOP_RE, 1), F.lit("")),
            ),
        )
        .withColumn(
            "verdict_disposition",
            F.when(verdict == "yes", "BLOCK")
            .when(verdict == "no", "ALLOW")
            .otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "error_signature", F.when(err == "", None).otherwise(err)
        )
        .withColumn(
            # harness sub-thread marker: rides on both a tool-carrying
            # call and the permission check that judges it (the agent-id
            # header analog, reference attach.go:80-84)
            "thread_id",
            F.when(
                t.contains("[thread: "),
                F.nullif(F.regexp_extract(t, r"\[thread: ([\w-]+)\]", 1), empty),
            ),
        )
        .withColumn(
            # stage-2 escalation checks run in the main harness process
            # (attach.go:39-44); default stage 1
            "check_stage",
            F.when(t.contains("[check-stage: 2]"), F.lit(2)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn(
            # contains() pair == rlike("git (commit|push)") exactly, at
            # plain-substring-scan cost instead of a regex matcher per row
            "is_git_activity",
            (F.col("role") == "assistant")
            & (F.col("tool").isin("Bash", "exec", "exec_command", "shell",
                                  "shell_command"))
            & (t.contains("git commit") | t.contains("git push")),
        )
    )
