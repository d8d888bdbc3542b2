"""Per-span chunked embeddings (spanembed) — split oversized text into
embeddable pieces and search with a best-chunk-per-span collapse.

Mirrors the reference's spanembed layer:
  * splitParts (tapes pkg/spanembed/chunk.go:32-60): an oversized span is
    cut into ceil(tokens/8000) contiguous pieces of roughly equal rune
    length, each cut nudged to a nearby newline, with the invariant that
    the pieces concatenate back to the original text exactly.  Token
    counts are estimated at ~4 chars/token when unreported.
  * Search (store.go:568-612): nearest CHUNKS are over-fetched 4x, then
    collapsed DISTINCT-ON-span keeping each span's best-matching chunk,
    and the top-k spans returned.

Scale notes: chunking is a mapInPandas stage (per-doc string work inside
an Arrow batch — no per-row frame access); the chunk table is the unit
of embedding and of search, keyed (span_id, chunk_idx).  The search scan
below is the exact/brute path; at 100 TB the candidate scan swaps for
the hyperplane-LSH bucketing in operators/similarity.py — the collapse
and over-fetch logic is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tapes_spark.operators.similarity import cosine_col

CHUNK_TOKEN_BUDGET = 8000  # chunk.go:9
AVG_CHARS_PER_TOKEN = 4  # chunk.go:17
SEARCH_OVERFETCH = 4  # store.go:570


def estimate_tokens(text: str) -> int:
    return (len(text) + AVG_CHARS_PER_TOKEN - 1) // AVG_CHARS_PER_TOKEN


def _adjust_to_newline(text: str, lo: int, target: int, window: int) -> int:
    """chunk.go:83-108 adjustToNewline: *target* moved to just after the
    NEAREST newline within +-window (clamped to [lo, len]), ties toward
    the earlier newline; target unchanged when none is close.  Cutting
    after the newline keeps it as the tail of the current piece."""
    if window < 1:
        return target
    low = max(target - window, lo)
    high = min(target + window, len(text))
    best = -1
    best_dist = window + 1
    for i in range(low, high):
        if text[i] != "\n":
            continue
        dist = abs(i - target)
        if dist < best_dist:
            best_dist = dist
            best = i
    return target if best < 0 else best + 1


def split_parts(
    text: str,
    reported_tokens: int = 0,
    budget: int = CHUNK_TOKEN_BUDGET,
) -> list[str]:
    """chunk.go splitParts/splitRunesInto: n roughly-equal contiguous
    pieces, each cut nudged to the nearest newline within a dynamic
    window of (total/n)/8; pieces concatenate to *text* exactly.
    Returns [text] when it fits the budget.  Python strings index by
    code point, matching the reference's rune slicing."""
    tokens = reported_tokens or estimate_tokens(text)
    if tokens <= budget or len(text) < 2:
        return [text]
    n = max(2, (tokens + budget - 1) // budget)
    n = min(n, len(text))
    total = len(text)
    window = (total // n) // 8
    parts: list[str] = []
    start = 0
    for i in range(1, n + 1):
        if start >= total:
            break
        end = total
        if i < n:
            end = _adjust_to_newline(text, start + 1, i * total // n, window)
        if end <= start:
            end = start + 1
        end = min(end, total)
        parts.append(text[start:end])
        start = end
    return parts


_CHUNK_SCHEMA = StructType(
    [
        StructField("span_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_text", StringType()),
    ]
)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = CHUNK_TOKEN_BUDGET,
) -> DataFrame:
    """(span_id, chunk_idx, chunk_text) — the embedding unit table."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            texts: list[str] = []
            for sid, t in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                for j, part in enumerate(split_parts(str(t or ""), 0, budget)):
                    ids.append(sid)
                    idxs.append(j)
                    texts.append(part)
            yield pd.DataFrame(
                {"span_id": ids, "chunk_idx": idxs, "chunk_text": texts}
            )

    return docs.select(id_col, text_col).mapInPandas(compute, _CHUNK_SCHEMA)


def chunked_topk_spans(
    chunks: DataFrame,
    query_vec: list[float],
    k: int = 10,
    overfetch: int = SEARCH_OVERFETCH,
    span_col: str = "span_id",
    chunk_col: str = "chunk_idx",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k spans by their best-matching chunk (store.go:578-612).

    nearest = k*overfetch closest CHUNKS (TakeOrderedAndProject — no full
    sort); best = one row per span keeping the max-cosine chunk
    (the DISTINCT ON analog via max/max_by partial aggregation); the
    final top-k spans order by score with span id tie-break.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    nearest = (
        chunks.select(
            F.col(span_col).alias("span_id"),
            F.col(chunk_col).alias("chunk_idx"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("span_id"), F.col("chunk_idx"))
        .limit(k * overfetch)
    )
    w = Window.partitionBy("span_id").orderBy(
        F.col("cosine").desc(), F.col("chunk_idx").asc()
    )
    best = (
        nearest.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "span_id",
            F.col("chunk_idx").alias("best_chunk_idx"),
            F.col("cosine").alias("score"),
        )
    )
    return best.orderBy(F.col("score").desc(), F.col("span_id").asc()).limit(k)
