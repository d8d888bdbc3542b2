"""Join operators — ordered dedup, tool pairing, as-of attaches, fuzzy
verdict attach.

Rebuilds SURVEY.md §2.5:

  J1  first-capture-wins ordered dedup — ``row_number`` over
      (hash, capture order), NOT ``dropDuplicates`` (which is
      order-nondeterministic across shuffles; tapes deriver.go:335-350
      mirrors ``ON CONFLICT DO NOTHING`` in capture order).
  J2  tool_use <-> tool_result pairing — each result attaches to the most
      recent preceding call with the same (conv_id, tool); each call keeps
      its FIRST result; error flag -> status; duration = result_ts -
      call_ts (tapes spans.go:632-652, 1132-1134).
  J4/J5  as-of attaches (web summary -> preceding WebFetch/WebSearch;
      plan -> preceding ExitPlanMode) — ``last(...) over rows unbounded
      preceding`` recency joins (tapes attach.go:114-177).
  J3  verdict fuzzy attach — grouped-map pandas fold per conv_id with
      consume-once semantics (tapes attach.go:38-274); the one-to-one
      consumption is inherently sequential per session, exactly the case
      grouped-map ``applyInPandas`` exists for.

Scale notes: every window here partitions by conv_id (+tool), so the only
shuffle is the hash partition on conv_id that the whole pipeline already
shares.  Skewed giant conversations are bounded by the window being a
single linear scan per partition group (no O(n^2)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def is_tool_call():
    return (F.col("role") == "assistant") & (F.col("tool") != "")


def with_first_capture(df: DataFrame, content_col: str = "text_norm") -> DataFrame:
    """J1: flag the first capture of each normalized-content hash per conv.

    Deterministic: ordered by turn_idx within (conv_id, content_hash).

    The hash is a WINDOW KEY only — deliberately not materialized as a
    column: nothing downstream consumes it, and a stored sha256 hex
    string was 38% of the staged table's bytes (incompressible random
    hex written and bussed once per run for no reader; re-derivable from
    text_norm at will).  r6: the key is xxhash64, not sha256 — it only
    has to group identical content within ONE conversation, so an 8-byte
    deterministic hash sorts ~8x cheaper than a 64-char hex string and
    skips the SHA rounds per row (collision odds within a conversation
    are ~n²/2⁶⁵ — vanishing at any real conversation size).
    """
    content_hash = F.xxhash64(F.col(content_col))
    # src_conv_id (present after the correction overlay) breaks (conv_id,
    # turn_idx) ties a conv-merging correction can create — without it the
    # first-capture pick is shuffle-nondeterministic on such rows
    order = [F.col("turn_idx")]
    if "src_conv_id" in df.columns:
        order.append(F.col("src_conv_id"))
    w = Window.partitionBy("conv_id", content_hash).orderBy(*order)
    return df.withColumn(
        "is_first_capture", F.row_number().over(w) == 1
    )


def with_resume_boundary(df: DataFrame) -> DataFrame:
    """A11: the resume-boundary fold (reference spans.go:480-490,
    lastFreshAssistantIdx).  A resumed/replayed session re-sends history;
    system-role turns arriving AFTER the conversation's last FRESH
    (first-capture) assistant turn are harness context replay, not
    conversation — the reference surfaces them as injected event spans.

    Adds ``is_system_insert`` (bool).  Requires is_first_capture
    (:func:`with_first_capture`).  A conversation with no fresh assistant
    turn marks every system turn (boundary = -inf), like the reference's
    synthetic-trace handling.
    """
    w = Window.partitionBy("conv_id")
    last_fresh = F.max(
        F.when(
            (F.col("role") == "assistant") & F.col("is_first_capture"),
            F.col("turn_idx"),
        )
    ).over(w)
    return df.withColumn(
        "is_system_insert",
        (F.col("role") == "system")
        & (F.col("turn_idx") > F.coalesce(last_fresh, F.lit(-1))),
    )


def pair_tool_calls(df: DataFrame) -> DataFrame:
    """J2: one row per tool CALL with its first result (if any).

    Returns columns: conv_id, turn_idx (call), tool, call_ts, call_text,
    result_turn_idx, result_ts, result_text, is_error, duration_ms.

    r6 shape: ONE window, no self-join, no second sort.  In the filtered
    (conv_id, tool) stream — only this tool's calls and results, ordered
    by turn_idx — every result belongs to the most recent preceding call,
    so a call's FIRST result (when it has one) is always the row
    IMMEDIATELY after it: any other same-tool call in between would own
    that result instead, and a result before any call can never directly
    follow a call.  ``lead(struct(...))``, gated on the led row being a
    result, therefore equals the old min-struct-over-group pick exactly.
    The previous forms cost either 2 Exchanges + a SortMergeJoin
    (self-join, r5) or two window sorts — (conv, tool, turn_idx) then
    (conv, tool, call_turn_idx) — per pass (early r6); this is one sort
    over the already conv_id-clustered input.  Only the five consumed
    columns enter the window sort (project-early, guide §2.3).
    """
    call = is_tool_call()
    # src_conv_id tie-break (same convention as with_first_capture /
    # cluster_sorted): a conv-merging correction can collide two rows on
    # (conv_id, turn_idx), and lead() adjacency — unlike the old
    # order-independent min-over-group — would otherwise pick a
    # shuffle-order-dependent neighbor on such rows
    order = [F.col("turn_idx")]
    extra_cols = []
    if "src_conv_id" in df.columns:
        order.append(F.col("src_conv_id"))
        extra_cols.append("src_conv_id")
    lw = Window.partitionBy("conv_id", "tool").orderBy(*order)
    nxt = F.lead(
        F.struct(
            F.col("role").alias("_role"),
            F.col("turn_idx").alias("result_turn_idx"),
            F.col("ts").alias("result_ts"),
            F.col("text").alias("result_text"),
        )
    ).over(lw)
    marked = (
        df.filter((F.col("tool") != "") & (call | (F.col("role") == "tool")))
        .select("conv_id", "turn_idx", "role", "tool", "ts", "text",
                *extra_cols)
        .withColumn("_first_res", nxt)
    )
    first_res = F.when(
        F.col("_first_res._role") == "tool", F.col("_first_res")
    )
    paired = (
        marked.filter(call)
        .select(
            "conv_id",
            "turn_idx",
            "tool",
            F.col("ts").alias("call_ts"),
            F.col("text").alias("call_text"),
            first_res["result_turn_idx"].alias("result_turn_idx"),
            first_res["result_ts"].alias("result_ts"),
            first_res["result_text"].alias("result_text"),
        )
    )
    return (
        paired.withColumn(
            "is_error",
            F.coalesce(F.col("result_text").startswith("error:"), F.lit(False)),
        )
        .withColumn(
            "duration_ms",
            (
                F.col("result_ts").cast("double") - F.col("call_ts").cast("double")
            ).cast("double")
            * 1000.0,
        )
    )


def attach_asof(
    df: DataFrame, attacher_kind: str, target_tools: list[str]
) -> DataFrame:
    """J4/J5: attach each *attacher_kind* turn to the most recent preceding
    tool call whose tool is in *target_tools* (recency heuristic,
    attach.go:151-177).  Consume-once: each target keeps its first attacher.

    Returns: conv_id, attacher_turn_idx, target_turn_idx, target_tool.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_target = is_tool_call() & F.col("tool").isin(target_tools)
    marked = df.withColumn(
        "target_turn_idx", F.last(F.when(is_target, F.col("turn_idx")), True).over(w)
    ).withColumn(
        "target_tool", F.last(F.when(is_target, F.col("tool")), True).over(w)
    )
    attachers = marked.filter(
        (F.col("call_kind") == attacher_kind) & F.col("target_turn_idx").isNotNull()
    )
    cw = Window.partitionBy("conv_id", "target_turn_idx").orderBy("turn_idx")
    return (
        attachers.withColumn("rn", F.row_number().over(cw))
        .filter(F.col("rn") == 1)
        .select(
            "conv_id",
            F.col("turn_idx").alias("attacher_turn_idx"),
            "target_turn_idx",
            "target_tool",
        )
    )


# --- J3: fuzzy verdict attach (grouped-map pandas fold) -------------------

_VERDICT_ATTACH_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("check_turn_idx", IntegerType()),
        StructField("tool_turn_idx", IntegerType()),
        StructField("disposition", StringType()),
        StructField("check_stage", IntegerType()),
    ]
)

_OVERLAP_LEN = 22  # reference attach.go matches by 22-char substring overlap


def _normalize_action(s: str) -> str:
    # attach.go:291-296 normalizeAction: lower + whitespace collapse
    return " ".join(s.lower().split())


def _attach_verdicts_rows(rows: list[dict]) -> list[tuple]:
    """Per-conversation consume-once matcher with stage grouping and
    thread-scoped matching (attach.go:38-108):

      * stage-1/stage-2 checks for the SAME judged action share one
        group (the group key is the action text); a non-empty member
        thread that disagrees starts its own group, and the group
        inherits the most specific thread id any member carries.
      * matching tries candidates from the group's thread FIRST, then
        falls back to the global pass (rows captured before thread
        markers existed).
      * the matched candidate is consumed exactly once; every member of
        the group attaches to it.

    A check's judged action is the ``<transcript>`` body of its latest
    preceding user turn; overlap is the normalized 22-char substring in
    either direction (attach.go:238-274).

    *rows* are one conversation's relevant rows in (turn_idx[,
    src_conv_id]) capture order (the partition sort guarantees it).
    """
    tool_calls: list[dict] = []  # unconsumed candidates, in order
    checks: list[dict] = []
    last_transcript: str | None = None
    for r in rows:
        if r["role"] == "assistant" and r["tool"]:
            tool_calls.append(
                {
                    "turn_idx": r["turn_idx"],
                    "key": _normalize_action(str(r["text"])),
                    "thread": r.get("thread_id") or "",
                }
            )
        if r["role"] == "user" and "<transcript>" in str(r["text"]):
            body = str(r["text"])
            start = body.find("<transcript>") + len("<transcript>")
            end = body.find("</transcript>", start)
            last_transcript = _normalize_action(
                body[start:end] if end != -1 else body[start:]
            )
        if r["call_kind"] == "check":
            checks.append(
                {
                    "conv": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "action": last_transcript or "",
                    "thread": r.get("thread_id") or "",
                    "disposition": r.get("verdict_disposition"),
                    "stage": r.get("check_stage"),
                }
            )

    out: list[tuple] = []
    # group stage-1/2 checks by action with thread compatibility
    groups: dict[str, list[dict]] = {}
    order: list[dict] = []
    for c in checks:
        if not c["action"]:
            out.append(
                (c["conv"], c["turn_idx"], None, c["disposition"], c["stage"])
            )
            continue
        g = None
        for cand in groups.setdefault(c["action"], []):
            if (
                c["thread"] == ""
                or cand["thread"] == ""
                or cand["thread"] == c["thread"]
            ):
                g = cand
                break
        if g is None:
            g = {"thread": c["thread"], "members": []}
            groups[c["action"]].append(g)
            order.append((c["action"], g))
        g["members"].append(c)
        if g["thread"] == "":
            g["thread"] = c["thread"]

    def find(action: str, thread: str, same_thread: bool) -> int | None:
        probe = action[:_OVERLAP_LEN]
        for i, cand in enumerate(tool_calls):
            if same_thread and cand["thread"] != thread:
                continue
            ck = cand["key"]
            if (probe and probe in ck) or (
                ck[:_OVERLAP_LEN] and ck[:_OVERLAP_LEN] in action
            ):
                return i
        return None

    for action, g in order:
        i = find(action, g["thread"], True) if g["thread"] else None
        if i is None:
            i = find(action, g["thread"], False)
        if i is None:
            for c in g["members"]:
                out.append(
                    (c["conv"], c["turn_idx"], None, c["disposition"],
                     c["stage"])
                )
            continue
        cand = tool_calls.pop(i)  # consume exactly once, shared by stages
        for c in g["members"]:
            out.append(
                (c["conv"], c["turn_idx"], cand["turn_idx"],
                 c["disposition"], c["stage"])
            )
    out.sort(key=lambda t: t[1])
    return out


_VERDICT_OUT_COLS = ["conv_id", "check_turn_idx", "tool_turn_idx",
                     "disposition", "check_stage"]


def _attach_verdicts_partition(batches):
    """mapInPandas fold: one ``to_dict("records")`` per Arrow batch, then
    a LINEAR conv-boundary scan calling the per-conversation matcher on
    plain row slices, with carry-over so a conversation straddling a
    batch boundary folds exactly once.  Earlier forms paid per-GROUP
    overhead (applyInPandas ~0.5 ms/group, then r5's pandas
    groupby.apply ~0.15 ms/group over 10^4-10^5 conversations); this
    pays one pandas conversion per BATCH and pure-python slicing per
    conversation (r6)."""
    import pandas as pd

    carry: list[dict] = []
    for pdf in batches:
        if pdf.empty:
            continue
        rows = pdf.to_dict("records")
        if carry and rows[0]["conv_id"] != carry[0]["conv_id"]:
            done = _attach_verdicts_rows(carry)
            carry = []
            if done:
                yield pd.DataFrame(done, columns=_VERDICT_OUT_COLS)
        rows = carry + rows
        results: list[tuple] = []
        start = 0
        for i in range(1, len(rows)):
            if rows[i]["conv_id"] != rows[start]["conv_id"]:
                results.extend(_attach_verdicts_rows(rows[start:i]))
                start = i
        carry = rows[start:]
        if results:
            yield pd.DataFrame(results, columns=_VERDICT_OUT_COLS)
    if carry:
        done = _attach_verdicts_rows(carry)
        if done:
            yield pd.DataFrame(done, columns=_VERDICT_OUT_COLS)


def attach_verdicts(df: DataFrame, pre_clustered: bool = False) -> DataFrame:
    """J3 entry: partitioned mapInPandas fold.

    Two narrowing steps keep the Arrow transfer proportional to the (rare)
    permission-check traffic: a semi-join on check-bearing conversations,
    then a row filter to only the rows the matcher reads — tool calls,
    ``<transcript>``-bearing user turns, and the check turns themselves.
    Rows are co-partitioned and sorted by (conv_id, turn_idx) so the fold
    sees each conversation contiguously in capture order.
    """
    has_check = df.filter(F.col("call_kind") == "check").select("conv_id").distinct()
    relevant = (
        ((F.col("role") == "assistant") & (F.col("tool") != ""))
        | ((F.col("role") == "user") & F.col("text").contains("<transcript>"))
        | (F.col("call_kind") == "check")
    )
    narrow = (
        df.filter(relevant)
        .join(has_check, "conv_id", "left_semi")
        .select(
            "conv_id", "turn_idx", "role", "tool", "text", "call_kind",
            "verdict_disposition", "thread_id", "check_stage",
            # overlay tie-break rides along when present (cluster_sorted
            # appends it to the partition sort)
            *(["src_conv_id"] if "src_conv_id" in df.columns else []),
        )
    )
    from tapes_spark.functions.partitioning import cluster_sorted

    narrow = cluster_sorted(
        narrow, "conv_id", "turn_idx", assume_clustered=pre_clustered
    )
    return narrow.mapInPandas(
        _attach_verdicts_partition, schema=_VERDICT_ATTACH_SCHEMA
    )
