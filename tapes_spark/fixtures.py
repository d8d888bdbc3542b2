"""Deterministic synthetic transcripts generator (FIXTURES.md).

Mirrors the reference's load-bearing test layer — full synthetic sessions
replayed as raw rows with pinned derive outputs (tapes fixtures/README.md;
pkg/derive/corpus_test.go; the synthetic-session generator pattern in
pkg/derive/giant_memory_test.go:47-90).  One fixed-seed generator produces
the input ``transcripts`` table; pytest pins per-sink outputs.

Schema (BASELINE.json input_hint — authoritative):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Everything is derived from ``random.Random(seed * 1_000_003 + conv_index)``
so any conversation regenerates identically regardless of how many others
are generated (embarrassingly parallel at scale).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

MODELS = [
    "Claude-Sonnet-4-5-20260203",
    "claude-opus-4-20260115",
    "claude-haiku-4",
    "GPT-5-2026-01-10",
    "gpt-5-mini",
    "gemini-pro-3",
    "llama-4-70b[1m]",
    "qwen-3-coder-20251220",
    "deepseek-v4",
    "claude-sonnet-4",
]

TOOLS = [
    "Bash",
    "Read",
    "Write",
    "Edit",
    "Glob",
    "Grep",
    "WebSearch",
    "WebFetch",
    "Task",
    "TaskCreate",
    "TaskUpdate",
    "ExitPlanMode",
    "Skill",
    "mcp__github__get_pr",
    "exec",
    "shell",
]

ERROR_MESSAGES = [
    "error: command not found: frob",
    "error: permission denied reading /etc/shadow",
    "error: timeout after 120s",
    "error: no such file or directory",
    "error: non-zero exit status 2",
]

USER_PROMPTS = [
    "Please refactor the parser to handle nested blocks.",
    "Why does the build fail on linux?",
    "Add a retry loop around the flaky network call.",
    "Summarize the changes in the last three commits.",
    "Fix the off-by-one in the pagination cursor.",
    "Write tests for the normalization module.",
    "Explain the shuffle boundary in this query plan.",
    "Migrate the config loader to the new format.",
]

ASSISTANT_REPLIES = [
    "I updated the parser and added nesting-aware tests.",
    "The build fails because of a missing header; patched.",
    "Added exponential backoff with three retries.",
    "The last three commits refactor the deriver pipeline.",
    "The cursor now compares (sort_col, id) tuples.",
    "Tests cover tag stripping and whitespace collapse.",
    "The exchange shuffles on conv_id before the window sort.",
    "Config loader now reads the v2 schema with fallback.",
]

COMPACTION_TEXT = (
    "Primary Request and Intent\n"
    "The user asked for a full pipeline refactor.\n"
    "Key Technical Concepts\n- windowed ordering\n- salted aggregation\n"
    "Files and Code Sections\n- pipeline.py\n"
    "Pending Tasks\n- none\n"
)

# usage marker embedded in assistant turns; the parse stage extracts it
# with one regexp (vectorized) — mirrors the reference's usage JSONB.
def _usage_marker(rng: random.Random) -> str:
    inp = rng.randint(200, 30000)
    out = rng.randint(20, 2000)
    cr = rng.randint(0, inp // 2)
    cw = rng.randint(0, inp // 4)
    return f"[usage: in={inp} out={out} cache_read={cr} cache_write={cw}]"


def _model_marker(rng: random.Random) -> str:
    return f"[model: {rng.choice(MODELS)}]"


def _stop_marker(rng: random.Random, failing: bool = False) -> str:
    if failing:
        return "[stop_reason: error]"
    return f"[stop_reason: {rng.choice(['end_turn', 'stop', 'tool_use'])}]"


def _tagged_noise(rng: random.Random) -> str:
    """Harness-tag noise injected into user/system turns (exercises N1/N2)."""
    choices = [
        "<system-reminder>Background task finished.</system-reminder>",
        "<system-reminder>Outer <status>inner nested</status> done.</system-reminder>",
        "<new-diagnostics>3 type errors</new-diagnostics>",
        "<task-notification>task 7 complete</task-notification>",
        "<environment_context>cwd=/repo</environment_context>",
        "<tool-use-id>tu_0042</tool-use-id>",
        "<output-file>/tmp/out.txt</output-file>",
    ]
    return rng.choice(choices)


def _assistant_text(rng: random.Random, failing: bool = False) -> str:
    return (
        f"{rng.choice(ASSISTANT_REPLIES)}\n"
        f"{_model_marker(rng)} {_usage_marker(rng)} {_stop_marker(rng, failing)}"
    )


class _Conv:
    """Builds one conversation's turn list with deterministic timestamps."""

    def __init__(self, conv_id: str, rng: random.Random, start: datetime):
        self.conv_id = conv_id
        self.rng = rng
        self.rows: list[tuple] = []
        self.ts = start

    def add(self, role: str, text: str, tool: str = "") -> None:
        # per-turn latency 100ms..120s, deterministic (FIXTURES.md §1)
        self.ts = self.ts + timedelta(milliseconds=self.rng.randint(100, 120_000))
        self.rows.append(
            (self.conv_id, len(self.rows), role, text, tool, self.ts)
        )

    def user(self, text: str) -> None:
        self.add("user", text)

    def assistant(self, text: str, tool: str = "") -> None:
        self.add("assistant", text, tool)

    def tool_result(self, tool: str, text: str) -> None:
        self.add("tool", text, tool)


TASK_SUBJECTS = ["fix parser", "add tests", "refactor loader", "update docs"]
TASK_STATUSES = ["in_progress", "done", "blocked", "deleted"]


def _tool_exchange(c: _Conv, rng: random.Random, tool: str | None = None,
                   error: bool = False, command: str | None = None,
                   thread: str | None = None) -> None:
    tool = tool or rng.choice(TOOLS)
    cmd = command or f'{{"arg": "value-{rng.randint(0, 999)}"}}'
    thread_marker = f" [thread: {thread}]" if thread else ""
    c.assistant(
        f"Using tool {tool}: {cmd}\n{_model_marker(rng)} {_usage_marker(rng)} "
        f"[stop_reason: tool_use]{thread_marker}",
        tool=tool,
    )
    if error:
        c.tool_result(tool, rng.choice(ERROR_MESSAGES))
    elif tool == "TaskCreate":
        tid = rng.randint(1, 6)
        c.tool_result(tool, f"ok: created task #{tid}: {rng.choice(TASK_SUBJECTS)}")
    elif tool == "TaskUpdate":
        tid = rng.randint(1, 6)
        c.tool_result(tool, f"ok: updated task #{tid} status={rng.choice(TASK_STATUSES)}")
    else:
        c.tool_result(tool, f"ok: produced {rng.randint(1, 500)} lines")


def _build_conv(idx: int, n_convs: int, median_turns: int, seed: int) -> list[tuple]:
    rng = random.Random(seed * 1_000_003 + idx)
    conv_id = f"conv-{idx:06d}"
    start = EPOCH + timedelta(seconds=idx * 37)
    c = _Conv(conv_id, rng, start)

    shape_roll = rng.random()
    # skew tail: last conv gets 60x median turns (exercises salting)
    is_skew = idx == n_convs - 1 and n_convs >= 8
    # one deterministic conv per corpus for each rare shape
    is_compaction = idx == 1
    is_git = idx == 2
    is_edge = idx == 3
    if idx == 4:
        shape_roll = 0.9  # always one shadow-flavored conv (route coverage)

    if is_skew:
        turns = median_turns * 60
        c.user("Long-running agent session kickoff.")
        c.assistant(_assistant_text(rng, failing=True))  # one stop_error
        while len(c.rows) < turns:
            if rng.random() < 0.5:
                _tool_exchange(c, rng, error=rng.random() < 0.08)
            else:
                c.assistant(_assistant_text(rng))
                c.user(rng.choice(USER_PROMPTS))
        return c.rows

    if is_edge:
        # empty-after-strip, duplicate re-sent text, unknown role, unicode cap
        c.user("<system-reminder>only a reminder</system-reminder>")
        c.assistant(_assistant_text(rng))
        dup = "please re-run the failing test"
        c.user(dup)
        c.assistant(_assistant_text(rng))
        c.user(dup)  # duplicate re-sent turn text (dedup J1)
        c.add("weird", "malformed row with unknown role")  # raw-only skip C6/C7
        c.user("café " + "é" * 200)  # multi-byte near preview cap
        c.assistant(_assistant_text(rng))
        return c.rows

    if is_compaction:
        c.user(rng.choice(USER_PROMPTS))
        c.assistant(_assistant_text(rng))
        c.assistant(COMPACTION_TEXT + f"\n{_model_marker(rng)} {_usage_marker(rng)} "
                    "[stop_reason: end_turn]")
        c.user("Continue from the summary.")
        c.assistant(_assistant_text(rng))
        return c.rows

    if is_git:
        c.user("Ship the fix.")
        _tool_exchange(c, rng, tool="Bash",
                       command='{"command": "git commit -m \'fix parser\'"}')
        _tool_exchange(c, rng, tool="Bash",
                       command='{"command": "git push origin main"}')
        c.assistant(_assistant_text(rng))
        return c.rows

    n_turns = max(4, int(rng.gauss(median_turns, median_turns / 4)))

    if shape_roll < 0.60:
        # plain: user -> assistant repeated; tagged noise on some user turns
        c.user(rng.choice(USER_PROMPTS))
        while len(c.rows) < n_turns:
            c.assistant(_assistant_text(rng, failing=rng.random() < 0.03))
            prompt = rng.choice(USER_PROMPTS)
            if rng.random() < 0.3:
                prompt = f"{_tagged_noise(rng)}\r\n\r\n{prompt}  \n\n\n"
            c.user(prompt)
    elif shape_roll < 0.85:
        # tool-loop
        c.user(rng.choice(USER_PROMPTS))
        while len(c.rows) < n_turns:
            _tool_exchange(c, rng, error=rng.random() < 0.12)
        c.assistant(_assistant_text(rng))
    else:
        # shadow-flavored: exercise every route branch (C1)
        c.user(rng.choice(USER_PROMPTS))
        c.assistant('{"title": "Parser refactor session"}\n'
                    f"{_model_marker(rng)} {_usage_marker(rng)} [stop_reason: end_turn]")
        # a Bash call the permission check below can fuzzy-match (J3):
        # the <transcript> body quotes the call text, so the 22-char
        # normalized substring overlap succeeds and consumes this call
        _tool_exchange(c, rng, tool="Bash",
                       command='{"command": "rm -rf build/"}',
                       thread="t-sub")
        c.user('<transcript>Using tool Bash: {"command": "rm -rf build/"}'
               "</transcript> allowed?")
        block = "yes" if (idx == 4 or rng.random() < 0.5) else "no"
        # stage-1 check fires from the action's sub-thread; the thread
        # marker rides on both sides (attach.go thread-scoped matching)
        c.assistant(f"<block>{block}</block>\n"
                    f"{_model_marker(rng)} {_usage_marker(rng)} "
                    "[stop_reason: end_turn] [thread: t-sub]")
        c.assistant("[SUGGESTION MODE] try running the linter\n"
                    f"{_model_marker(rng)} {_usage_marker(rng)} [stop_reason: end_turn]")
        # WebFetch call precedes the web-summary turn so the J4 as-of
        # attach has a genuine target; same for ExitPlanMode / J5
        _tool_exchange(c, rng, tool="WebFetch",
                       command='{"url": "https://spark.apache.org/aqe"}')
        c.user("Web page content: <title>Spark AQE docs</title> body text here")
        c.assistant(_assistant_text(rng))
        _tool_exchange(c, rng, tool="ExitPlanMode",
                       command='{"plan": "refactor pipeline"}')
        c.user("<conversation>plan: refactor pipeline</conversation>")
        c.assistant(_assistant_text(rng))
        while len(c.rows) < n_turns:
            _tool_exchange(c, rng, tool=rng.choice(["WebFetch", "ExitPlanMode",
                                                    "TaskCreate", "TaskUpdate"]))
    return c.rows


def generate_transcripts(
    n_convs: int = 8, median_turns: int = 12, seed: int = 42
) -> list[tuple]:
    rows: list[tuple] = []
    for i in range(n_convs):
        rows.extend(_build_conv(i, n_convs, median_turns, seed))
    return rows


def generate_giant_conv(
    n_turns: int = 100_000, seed: int = 42, conv_id: str = "conv-giant"
) -> list[tuple]:
    """One pathological conversation (the reference's
    giant_memory_test.go analog): a SINGLE trace — one opening prompt,
    then an unbroken tool loop — so every per-conversation and per-trace
    fold sees one partition-pinned group of ~n_turns rows.  This is the
    worst case for the sequential folds (chain hash, verdict matcher) and
    for export's per-trace collect_list; the skew gate pins that the
    pipeline completes with correct per-sink counts on it."""
    rng = random.Random(seed * 1_000_003 + 999_983)
    c = _Conv(conv_id, rng, EPOCH + timedelta(days=30))
    c.user("Massive autonomous refactor session — single prompt.")
    while len(c.rows) < n_turns - 1:
        _tool_exchange(c, rng, error=rng.random() < 0.05)
    c.assistant(_assistant_text(rng))
    return c.rows


def generate_session_meta(n_convs: int = 8, seed: int = 42) -> list[tuple]:
    """Deterministic envelope side-channel rows (conv_id, parent_conv_id,
    display_name): every odd conv forks from its predecessor; conv 2 (if
    present) claims a parent whose own turns never land (the placeholder
    path, sessions.sql:124-154); conv 1 carries a user rename."""
    rows: list[tuple] = []
    for i in range(n_convs):
        conv = f"conv-{i:06d}"
        parent = None
        if i % 2 == 1:
            parent = f"conv-{i - 1:06d}"
        if i == 2:
            parent = "conv-phantom"
        name = "renamed by user" if i == 1 else None
        if parent or name:
            rows.append((conv, parent, name))
    return rows


ARROW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us", tz="UTC")),
    ]
)


def write_transcripts(
    path: str,
    n_convs: int = 8,
    median_turns: int = 12,
    seed: int = 42,
    row_group_size: int = 50_000,
) -> int:
    """Write the transcripts table as parquet; returns row count.

    Data is written in conv_id order (the natural capture layout); at real
    scale this table would be Iceberg-partitioned by bucket(conv_id) +
    days(ts).  Row groups are kept small (50k rows ≈ 1.5 MB) so a local
    single-file read can still split across tasks — Spark parallelizes a
    parquet scan at row-group granularity.
    """
    rows = generate_transcripts(n_convs, median_turns, seed)
    cols = list(zip(*rows))
    table = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, ARROW_SCHEMA)],
        schema=ARROW_SCHEMA,
    )
    pq.write_table(table, path, row_group_size=row_group_size)
    return len(rows)
