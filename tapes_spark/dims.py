"""Lookup dimensions for broadcast-join enrichment.

These mirror the reference's in-process lookup maps (SURVEY.md §2.5
J10/J11): tool display-name normalization (tapes pkg/derive/spans.go:590-628),
web/task flags (pkg/derive/deriver.go:368, pkg/derive/tasks.go:67-83), and the
static model pricing table (pkg/sessions/pricing.go:24-71).  In Spark they are
tiny DataFrames joined with an explicit ``broadcast()`` hint — the canonical
lookup-enrich of the north_rule.

All rows are hand-pinned constants; there is no external data source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (tool, display_name, category, is_web, is_task)
# Codex aliases exec/exec_command/shell/shell_command display as "Bash"
# (reference spans.go:590-601); empty tool displays as "tool".
TOOL_DIM_ROWS = [
    ("Bash", "Bash", "shell", False, False),
    ("exec", "Bash", "shell", False, False),
    ("exec_command", "Bash", "shell", False, False),
    ("shell", "Bash", "shell", False, False),
    ("shell_command", "Bash", "shell", False, False),
    ("Read", "Read", "fs", False, False),
    ("Write", "Write", "fs", False, False),
    ("Edit", "Edit", "fs", False, False),
    ("Glob", "Glob", "fs", False, False),
    ("Grep", "Grep", "fs", False, False),
    ("WebSearch", "WebSearch", "web", True, False),
    ("WebFetch", "WebFetch", "web", True, False),
    ("Task", "Task", "agent", False, False),
    ("TaskCreate", "TaskCreate", "task", False, True),
    ("TaskUpdate", "TaskUpdate", "task", False, True),
    ("ExitPlanMode", "ExitPlanMode", "plan", False, False),
    ("Skill", "Skill", "agent", False, False),
    ("NotebookEdit", "NotebookEdit", "fs", False, False),
    ("KillShell", "KillShell", "shell", False, False),
    ("TodoWrite", "TodoWrite", "task", False, True),
]

TOOL_DIM_COLS = ["tool", "display_name", "category", "is_web", "is_task"]

# (role, is_conversation, side)
ROLE_DIM_ROWS = [
    ("user", True, "input"),
    ("assistant", True, "output"),
    ("tool", False, "output"),
    ("system", False, "input"),
]
ROLE_DIM_COLS = ["role", "is_conversation", "side"]

# (model, input_per_mtok, output_per_mtok, cache_read_per_mtok, cache_write_per_mtok)
# Keyed by NORMALIZED model name (tapes pricing.go:137-196 normalization:
# lowercase, date-suffix stripped).  Synthetic subset shaped like the
# reference's static table; values are fixture constants, not real prices.
PRICING_DIM_ROWS = [
    ("claude-opus-4", 15.0, 75.0, 1.5, 18.75),
    ("claude-sonnet-4", 3.0, 15.0, 0.3, 3.75),
    ("claude-sonnet-4.5", 3.0, 15.0, 0.3, 3.75),
    ("claude-haiku-4", 0.8, 4.0, 0.08, 1.0),
    ("gpt-5", 2.5, 10.0, 0.25, 3.125),
    ("gpt-5-mini", 0.3, 1.2, 0.03, 0.375),
    ("gemini-pro-3", 2.0, 8.0, 0.2, 2.5),
    ("llama-4-70b", 0.5, 1.5, 0.05, 0.625),
    ("qwen-3-coder", 0.4, 1.6, 0.04, 0.5),
    ("deepseek-v4", 0.6, 2.4, 0.06, 0.75),
]
PRICING_DIM_COLS = [
    "model",
    "input_per_mtok",
    "output_per_mtok",
    "cache_read_per_mtok",
    "cache_write_per_mtok",
]


def tool_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_DIM_ROWS, TOOL_DIM_COLS)


def role_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_DIM_ROWS, ROLE_DIM_COLS)


def pricing_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PRICING_DIM_ROWS, PRICING_DIM_COLS)
