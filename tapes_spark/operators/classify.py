"""Route stage rule table — per-turn call-kind classification.

Rebuilds the reference router ``ClassifyCall`` (SURVEY.md §2.4 C1;
tapes pkg/derive/classify.go:15-165) as one native ``when(...)`` ladder —
the route stage's rule column.  Exactly like the reference, nothing is
silently bucketed: the fallback is ``unknown`` (classify.go:160-165).

Adapted to the transcripts input shape: the reference classifies by
request-envelope tells (max_tokens, tools count, stream); our turns carry
the equivalent tells in ``text`` (FIXTURES.md §1):

  kind            reference rule                          our tell
  ------------    -----------------------------------     ---------------------
  check           security-monitor prompt + tiny budget   <block>yes|no verdict
  suggestion      "[SUGGESTION MODE" prefix               same prefix
  title           tool-less + '{"title"' system           text starts {"title"
  plan            <conversation> in request               <conversation> in text
  web             "Web page content:" / "Perform a web    same prefixes
                  search" prefix
  compaction      lead header + >=1 canonical section     same (C3 guard)
  main            streaming + tools>0                     assistant turn
  prompt/tool_result/system/injected                      by role
  unknown         anything else                           anything else
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KINDS = (
    "main",
    "check",
    "title",
    "plan",
    "suggestion",
    "web",
    "compaction",
    "prompt",
    "tool_result",
    "system",
    "injected",
    "unknown",
)

# C3 isCompactionSummary: lead header + >=1 of the canonical sections
# (classify.go:236-267, guards against prose quoting — reference issue #27).
COMPACTION_LEAD = "Primary Request and Intent"
COMPACTION_SECTIONS = (
    "Key Technical Concepts",
    "Files and Code Sections",
    "Errors and Fixes",
    "Problem Solving",
    "All User Messages",
    "Pending Tasks",
    "Current Work",
    "Next Step",
)

# C2 ClassifyInjected whole-message prefixes (classify.go:199-231).
# The mode-banner family is enumerated in full: classify.go:216-227 also
# matches the exited/heading variants and the [SYSTEM NOTIFICATION marker.
INJECTED_PREFIXES = (
    "# MCP Server Instructions",
    "The following skills are available",
    "<user_claude_md>",
    "Plan mode is active",
    "Exited Plan Mode",
    "## Exited Plan Mode",
    "## Exit Plan Mode",
    "## Plan Mode",
    "[SYSTEM NOTIFICATION",
)


def _is_compaction(t: Column) -> Column:
    any_section = F.lit(False)
    for s in COMPACTION_SECTIONS:
        any_section = any_section | t.contains(s)
    return t.contains(COMPACTION_LEAD) & any_section


def _is_injected(t: Column) -> Column:
    cond = F.lit(False)
    for p in INJECTED_PREFIXES:
        cond = cond | t.startswith(p)
    return cond


def call_kind_col(
    role: Column, text: Column, tool: Column
) -> Column:
    """The C1 rule ladder as one native column expression."""
    t = text
    is_assistant = role == "assistant"
    is_user = role == "user"
    return (
        # shadow kinds first — they must win over plain main/prompt.
        # the rlike is gated behind a cheap substring contains — regex scan
        # only runs on rows that can possibly match
        F.when(
            is_assistant
            & t.contains("<block>")
            & t.rlike(r"(?i)<block>\s*(yes|no)"),
            "check",
        )
        .when(is_assistant & t.startswith("[SUGGESTION MODE"), "suggestion")
        .when(is_assistant & t.startswith('{"title"'), "title")
        .when(is_assistant & _is_compaction(t), "compaction")
        .when(is_user & t.startswith("Web page content:"), "web")
        .when(is_user & t.startswith("Perform a web search"), "web")
        .when(is_user & t.contains("<conversation>"), "plan")
        .when(is_user & _is_injected(t), "injected")
        .when(is_assistant, "main")
        .when(is_user, "prompt")
        .when(role == "tool", "tool_result")
        .when(role == "system", "system")
        .otherwise("unknown")
    )


def with_call_kind(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "call_kind", call_kind_col(F.col("role"), F.col("text"), F.col("tool"))
    )
