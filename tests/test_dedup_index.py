"""Gates for the persisted MinHash dedup index (operators/dedup_index.py):
the indexed pair sets must be bit-identical to the recompute path, and the
incremental decide() ladder must never recompute an unchanged signature."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators import dedup
from tapes_spark.operators.dedup_index import (
    MinHashIndexTape,
    SimHashIndexTape,
)

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _tape(spark, tmp_path) -> MinHashIndexTape:
    return MinHashIndexTape(spark, str(tmp_path / "mh_idx"))


def _pairset(df):
    return {(r["doc1"], r["doc2"], r["jaccard"]) for r in df.collect()}


class TestIndexedPairs:
    def test_indexed_pairs_match_recompute(self, spark, docs, tmp_path):
        idx = _tape(spark, tmp_path)
        idx.refresh(docs)
        got = _pairset(idx.pairs(docs, THRESHOLD))
        want = _pairset(dedup.minhash_lsh_pairs(docs, threshold=THRESHOLD))
        assert got == want and want

    def test_pairs_with_matches_filtered_full(self, spark, docs, tmp_path):
        """Batch-vs-corpus == the full pair set restricted to pairs
        touching the batch, bit-for-bit."""
        idx = _tape(spark, tmp_path)
        idx.refresh(docs)
        new_ids = docs.select("doc_id").filter(
            F.pmod(F.col("doc_id"), F.lit(7)) == 0
        )
        new_set = {r["doc_id"] for r in new_ids.collect()}
        got = _pairset(idx.pairs_with(docs, new_ids, THRESHOLD))
        full = _pairset(idx.pairs(docs, THRESHOLD))
        want = {
            p for p in full if p[0] in new_set or p[1] in new_set
        }
        assert got == want and want


class TestRefreshLadder:
    def test_idempotent_and_append_only_for_new(self, spark, docs, tmp_path):
        idx = _tape(spark, tmp_path)
        n = docs.count()
        first = idx.refresh(docs)
        assert first["mode"] == "full" and first["indexed"] == n
        second = idx.refresh(docs)
        assert second == {"mode": "incremental", "indexed": 0,
                          "up_to_date": n, "changed": 0}
        # new docs: only the batch is signed; existing rows untouched
        extra = docs.limit(4).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        third = idx.refresh(docs.unionByName(extra))
        assert third["indexed"] == 4 and third["changed"] == 0
        assert third["up_to_date"] == n
        assert idx.tape.read().count() == n + 4

    def test_changed_doc_reindexed(self, spark, docs, tmp_path):
        idx = _tape(spark, tmp_path)
        idx.refresh(docs)
        victim = docs.select("doc_id").first()["doc_id"]
        mutated = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") == victim, F.lit("entirely new words here")
            ).otherwise(F.col("text")),
        )
        res = idx.refresh(mutated)
        assert res["changed"] == 1 and res["indexed"] == 1
        assert idx.tape.read().count() == docs.count()
        # the stored band hashes for the victim match a fresh recompute
        got = idx.tape.read().filter(
            F.col("doc_id") == victim
        ).first()["bh"]
        want = dedup.minhash_band_hashes(mutated).filter(
            F.col("doc_id") == victim
        ).first()["bh"]
        assert got == want

    def test_config_change_rebuilds(self, spark, docs, tmp_path):
        idx = _tape(spark, tmp_path)
        idx.refresh(docs)
        idx2 = MinHashIndexTape(
            spark, str(tmp_path / "mh_idx"), num_perm=32, bands=8
        )
        res = idx2.refresh(docs)
        assert res["mode"] == "full"


class TestSimHashIndex:
    def test_indexed_pairs_match_recompute(self, spark, docs, tmp_path):
        idx = SimHashIndexTape(spark, str(tmp_path / "sh_idx"))
        idx.refresh(docs)
        got = {
            (r["doc1"], r["doc2"], r["hamming"])
            for r in idx.pairs(max_hamming=3).collect()
        }
        want = {
            (r["doc1"], r["doc2"], r["hamming"])
            for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
        }
        assert got == want and want

    def test_pairs_with_matches_filtered_full(self, spark, docs, tmp_path):
        idx = SimHashIndexTape(spark, str(tmp_path / "sh_idx"))
        idx.refresh(docs)
        new_ids = docs.select("doc_id").filter(
            F.pmod(F.col("doc_id"), F.lit(5)) == 0
        )
        new_set = {r["doc_id"] for r in new_ids.collect()}
        got = {
            (r["doc1"], r["doc2"], r["hamming"])
            for r in idx.pairs_with(new_ids, max_hamming=3).collect()
        }
        full = {
            (r["doc1"], r["doc2"], r["hamming"])
            for r in idx.pairs(max_hamming=3).collect()
        }
        want = {
            p for p in full if p[0] in new_set or p[1] in new_set
        }
        assert got == want and want

    def test_incremental_no_resign(self, spark, docs, tmp_path):
        idx = SimHashIndexTape(spark, str(tmp_path / "sh_idx"))
        n = docs.count()
        assert idx.refresh(docs)["mode"] == "full"
        assert idx.refresh(docs) == {
            "mode": "incremental", "indexed": 0,
            "up_to_date": n, "changed": 0,
        }
