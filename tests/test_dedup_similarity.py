"""Dedup + similarity operator gates over the driver documents/embeddings
tables (sf0.001): the LSH scale paths must agree with their brute-force
oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestExactDedup:
    def test_counts_conserved(self, docs):
        d = dedup.exact_dedup(docs).agg(
            F.sum("n_copies").alias("n"), F.count("*").alias("groups")
        ).collect()[0]
        assert d["n"] == docs.count()
        assert d["groups"] <= docs.count()

    def test_idempotent(self, docs):
        a = dedup.exact_dedup(docs)
        b = dedup.exact_dedup(docs)
        assert a.exceptAll(b).count() == 0


class TestMinHashLSH:
    def test_lsh_recall_vs_brute_force(self, docs):
        """Every brute-force pair at >=0.8 jaccard must be found by the
        LSH path (16 bands x 4 rows: P[candidate] at s=0.8 is
        1-(1-0.8^4)^16 ~ 0.9996 — on this corpus, exhaustive)."""
        brute = {
            (r["doc1"], r["doc2"])
            for r in dedup.jaccard_pairs(docs, threshold=0.8).collect()
        }
        lsh = {
            (r["doc1"], r["doc2"])
            for r in dedup.minhash_lsh_pairs(docs, threshold=0.8).collect()
        }
        assert brute, "fixture should contain at least one near-dup pair"
        missed = brute - lsh
        assert not missed, f"LSH missed {len(missed)} of {len(brute)}"
        # and LSH must never report a pair below threshold (exact verify)
        assert lsh <= brute

    def test_signatures_deterministic(self, docs):
        a = dedup.minhash_signatures(docs).orderBy("doc_id").collect()
        b = dedup.minhash_signatures(docs).orderBy("doc_id").collect()
        assert [r["signature"] for r in a] == [r["signature"] for r in b]

    def test_vectorized_fnv_matches_scalar(self):
        """The batch-vectorized FNV must be bit-identical to the scalar
        reference hash_token (unicode, empty-adjacent, shared vocab)."""
        import numpy as np

        toks = ["the", "fox", "a", "κόσμος", "日本語", "x" * 50, "fox"]
        got = dedup._fnv_hashes(np.array(toks, dtype=object))
        want = [dedup.hash_token(t) for t in toks]
        assert got.tolist() == want

    def test_batch_segments_and_empty_docs(self, spark):
        """Empty docs get the zero signature; segment boundaries must not
        leak tokens across docs (reduceat edge cases)."""
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, ""), (3, "gamma"), (4, "   ")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["signature"]
                for r in dedup.minhash_signatures(df, num_perm=8).collect()}
        assert rows[2] == [0] * 8 and rows[4] == [0] * 8
        solo = {r["doc_id"]: r["signature"]
                for r in dedup.minhash_signatures(
                    spark.createDataFrame(
                        [(1, "alpha beta"), (3, "gamma")],
                        "doc_id long, text string",
                    ), num_perm=8).collect()}
        assert rows[1] == solo[1] and rows[3] == solo[3]

    def test_null_text_signs_like_empty(self, spark):
        """split(NULL) -> NULL array must fold to an EMPTY token list, not
        crash the vectorized batch (len(None)); a null doc gets the same
        signature as an empty one on both signature paths."""
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        mh = {r["doc_id"]: r["signature"]
              for r in dedup.minhash_signatures(df, num_perm=8).collect()}
        assert mh[2] == mh[3] == [0] * 8
        sh = {r["doc_id"]: r["simhash"]
              for r in dedup.simhash_signatures(df).collect()}
        assert sh[2] == sh[3] == 0


class TestSimHash:
    def test_pairs_symmetric_and_bounded(self, docs):
        pairs = dedup.simhash_pairs(docs, max_hamming=3).collect()
        for r in pairs:
            assert r["doc1"] < r["doc2"]
            assert 0 <= r["hamming"] <= 3

    def test_identical_text_zero_hamming(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the quick brown fox")],
            "doc_id long, text string",
        )
        pairs = dedup.simhash_pairs(df, max_hamming=0).collect()
        assert [(p["doc1"], p["doc2"], p["hamming"])
                for p in pairs] == [(1, 2, 0)]


class TestCosineDupPairs:
    def test_lsh_recall_vs_brute(self, emb):
        dim = len(emb.first()["embedding"])
        brute = {
            (r["vec1"], r["vec2"])
            for r in similarity.cosine_dup_pairs_brute(emb, 0.9).collect()
        }
        lsh = {
            (r["vec1"], r["vec2"])
            for r in similarity.cosine_dup_pairs_lsh(emb, dim, 0.9).collect()
        }
        # exact re-check means no false positives; recall pytest-gated
        assert lsh <= brute
        if brute:
            recall = len(lsh & brute) / len(brute)
            assert recall >= 0.8, f"recall {recall}: {sorted(brute - lsh)[:5]}"

    def test_deterministic(self, emb):
        dim = len(emb.first()["embedding"])
        a = sorted(map(tuple, similarity.cosine_dup_pairs_lsh(emb, dim, 0.9).collect()))
        b = sorted(map(tuple, similarity.cosine_dup_pairs_lsh(emb, dim, 0.9).collect()))
        assert a == b


class TestCosineSimilarity:
    def test_lsh_topk_recall(self, emb):
        qvec = list(
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        )
        rest = emb.filter(F.col("vec_id") != 0)
        brute = [
            r["vec_id"]
            for r in similarity.brute_cosine_topk(rest, qvec, k=10).collect()
        ]
        ann = [
            r["vec_id"]
            for r in similarity.lsh_cosine_topk(
                rest, qvec, k=10, n_tables=12, bits=6
            ).collect()
        ]
        recall = len(set(brute) & set(ann)) / 10
        assert recall >= 0.6, f"ANN recall {recall} too low: {brute} vs {ann}"

    def test_brute_self_similarity(self, emb):
        qvec = list(
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        )
        top = similarity.brute_cosine_topk(emb, qvec, k=1).collect()[0]
        assert top["vec_id"] == 0
        assert abs(top["cosine"] - 1.0) < 1e-6
