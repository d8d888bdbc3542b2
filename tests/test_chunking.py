"""spanembed chunking gates: splitParts invariants (chunk.go:32-60) and
the best-chunk-per-span search collapse (store.go:568-612)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators.chunking import (
    CHUNK_TOKEN_BUDGET,
    chunk_documents,
    chunked_topk_spans,
    split_parts,
)


class TestSplitParts:
    def test_small_text_is_one_chunk(self):
        assert split_parts("hello world") == ["hello world"]

    def test_pieces_concatenate_exactly(self):
        text = "\n".join(f"line {i} " + "x" * 80 for i in range(2000))
        parts = split_parts(text)
        assert len(parts) >= 2
        assert "".join(parts) == text

    def test_piece_count_tracks_budget(self):
        # ~25k estimated tokens -> 4 pieces (chunk.go:42-44)
        text = "y" * (25_000 * 4)
        parts = split_parts(text)
        assert len(parts) == (25_000 + CHUNK_TOKEN_BUDGET - 1) // CHUNK_TOKEN_BUDGET

    def test_cuts_nudge_to_newlines(self):
        text = "\n".join("z" * 100 for _ in range(1000))
        parts = split_parts(text)
        # every non-final piece ends exactly at a line break
        for p in parts[:-1]:
            assert p.endswith("\n")

    def test_reported_tokens_override(self):
        text = "a" * 100
        assert len(split_parts(text, reported_tokens=20_000)) == 3


class TestChunkDocuments:
    def test_roundtrip_and_indexing(self, spark):
        big = "\n".join("w" * 100 for _ in range(700))  # ~17.5k tokens
        df = spark.createDataFrame(
            [(1, "small doc"), (2, big)], "doc_id long, text string"
        )
        rows = chunk_documents(df).collect()
        by_span = {}
        for r in rows:
            by_span.setdefault(r["span_id"], []).append(
                (r["chunk_idx"], r["chunk_text"])
            )
        assert [c for c, _ in sorted(by_span[1])] == [0]
        idxs = [c for c, _ in sorted(by_span[2])]
        assert idxs == list(range(len(idxs))) and len(idxs) >= 2
        assert "".join(t for _, t in sorted(by_span[2])) == big


class TestBestChunkCollapse:
    @pytest.fixture()
    def chunks(self, spark):
        # span 10: chunks far from AND near the query; span 20: all near;
        # span 30: all far — one hit per span, scored by its best chunk
        rows = [
            (10, 0, [1.0, 0.0]),
            (10, 1, [0.0, 1.0]),   # best of span 10
            (20, 0, [0.1, 0.995]),
            (20, 1, [0.0, 0.9]),
            (30, 0, [1.0, -0.2]),
        ]
        return spark.createDataFrame(
            rows, "span_id long, chunk_idx int, embedding array<double>"
        )

    def test_one_hit_per_span_scored_by_best_chunk(self, chunks):
        hits = chunked_topk_spans(chunks, [0.0, 1.0], k=3).collect()
        assert [h["span_id"] for h in hits].count(10) == 1
        by_span = {h["span_id"]: h for h in hits}
        assert by_span[10]["best_chunk_idx"] == 1
        assert by_span[10]["score"] == 1.0
        # ordering: best span score first
        scores = [h["score"] for h in hits]
        assert scores == sorted(scores, reverse=True)

    def test_overfetch_fills_k_distinct_spans(self, spark):
        # ten chunks of ONE span outrank everything; with 4x over-fetch
        # the collapse still returns k distinct spans
        rows = [(1, i, [0.0, 1.0 - i * 0.001]) for i in range(10)]
        rows += [(s, 0, [0.5, 0.5]) for s in range(2, 6)]
        chunks = spark.createDataFrame(
            rows, "span_id long, chunk_idx int, embedding array<double>"
        )
        hits = chunked_topk_spans(chunks, [0.0, 1.0], k=3).collect()
        assert len({h["span_id"] for h in hits}) == 3
        assert hits[0]["span_id"] == 1 and hits[0]["best_chunk_idx"] == 0
