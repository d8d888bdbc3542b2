"""Keyset (cursor) pagination over a tape (SURVEY.md §2.7 O3; tapes
pkg/storage/postgres/session_reads.go:26-159).

Tuple-compare cursor over (sort_col, id_col) with a dynamic ALLOWLISTED
sort column — never ORDER BY an attacker-controlled string — asc/desc,
default page 50, max 200 (api/openapi_routes.go:67-68).

Keyset beats OFFSET at scale for the same reason as in Postgres: the
predicate prunes before the sort, so page N costs the same as page 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LIMIT = 50
MAX_LIMIT = 200

# sessions-list sort allowlist (session_reads.go:36-58 analog)
SORT_ALLOWLIST = frozenset(
    {
        "last_seen_at",
        "started_at",
        "turn_count",
        "total_cost_usd",
        "total_input_tokens",
        "latency_ms_avg",
        "status",
        "conv_id",
    }
)


def keyset_page(
    df: DataFrame,
    sort_col: str,
    id_col: str = "conv_id",
    cursor: tuple | None = None,
    descending: bool = False,
    limit: int = DEFAULT_LIMIT,
) -> DataFrame:
    """One page after *cursor* = (sort_value, id_value); None = first page."""
    if sort_col not in SORT_ALLOWLIST:
        raise ValueError(
            f"sort column {sort_col!r} not in allowlist {sorted(SORT_ALLOWLIST)}"
        )
    limit = min(max(1, limit), MAX_LIMIT)
    s, i = F.col(sort_col), F.col(id_col)
    if cursor is not None:
        cs, ci = (F.lit(cursor[0]), F.lit(cursor[1]))
        if descending:
            df = df.filter((s < cs) | ((s == cs) & (i < ci)))
        else:
            df = df.filter((s > cs) | ((s == cs) & (i > ci)))
    order = [s.desc(), i.desc()] if descending else [s.asc(), i.asc()]
    return df.orderBy(*order).limit(limit)


def next_cursor(page_rows: list, sort_col: str, id_col: str = "conv_id"):
    """Cursor for the page after *page_rows* (None when page was empty)."""
    if not page_rows:
        return None
    last = page_rows[-1]
    return (last[sort_col], last[id_col])
