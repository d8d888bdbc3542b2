"""Persisted ANN index tape gates: indexed queries must be bit-identical
to the recompute path on the same corpus snapshot, and maintenance must
be incremental (new ids appended, changed content re-indexed, untouched
vectors never recomputed) — the rebuild analog of the reference's
persisted vector store (spanembed/store.go:176-180, 568-612)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators import similarity
from tapes_spark.operators.ann_index import LshIndexTape

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture()
def dim(emb):
    return len(emb.first()["embedding"])


def _pairs(df):
    return sorted((r["vec1"], r["vec2"], r["cosine"]) for r in df.collect())


class TestIndexedQueriesMatchRecompute:
    def test_dup_pairs_identical(self, spark, emb, dim, tmp_path):
        idx = LshIndexTape(spark, str(tmp_path / "ann"), dim)
        idx.refresh(emb)
        got = _pairs(idx.dup_pairs(emb, threshold=0.9))
        want = _pairs(similarity.cosine_dup_pairs_lsh(emb, dim, 0.9))
        assert got == want

    def test_topk_identical(self, spark, emb, dim, tmp_path):
        idx = LshIndexTape(
            spark, str(tmp_path / "ann"), dim, n_tables=12, bits=6
        )
        idx.refresh(emb)
        qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        got = [(r["vec_id"], r["cosine"])
               for r in idx.topk(emb, qvec, k=10).collect()]
        want = [(r["vec_id"], r["cosine"])
                for r in similarity.lsh_cosine_topk(
                    emb, qvec, k=10, n_tables=12, bits=6).collect()]
        assert got == want


class TestIncrementalMaintenance:
    def test_refresh_ladder(self, spark, emb, dim, tmp_path):
        idx = LshIndexTape(spark, str(tmp_path / "ann"), dim)
        n = emb.count()
        first = idx.refresh(emb)
        assert first["mode"] == "full" and first["indexed"] == n
        # idempotent second pass: everything up to date, nothing indexed
        second = idx.refresh(emb)
        assert second == {"mode": "incremental", "indexed": 0,
                          "up_to_date": n, "changed": 0}
        # new ids -> appended, untouched rows not recomputed
        extra = emb.limit(3).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000
        )
        third = idx.refresh(emb.unionByName(extra))
        assert third["indexed"] == 3 and third["changed"] == 0
        assert third["up_to_date"] == n
        assert idx.read_buckets().count() == n + 3
        ops = [s["lineage"].get("op") for s in idx.tape.snapshots()]
        assert ops[0] == "full_build" and ops[-1] == "append_new"

    def test_changed_vector_reindexed(self, spark, emb, dim, tmp_path):
        idx = LshIndexTape(spark, str(tmp_path / "ann"), dim)
        idx.refresh(emb)
        # flip vec 0's content: same id, different vector
        mutated = emb.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") == 0,
                F.transform("embedding", lambda x: -x),
            ).otherwise(F.col("embedding")),
        )
        res = idx.refresh(mutated)
        assert res["changed"] == 1 and res["indexed"] == 1
        # exactly one row per id survives the partition overwrite
        assert idx.read_buckets().count() == emb.count()
        # and the stored codes now match a recompute on the mutated corpus
        got = {r["vec_id"]: r["buckets"]
               for r in idx.read_buckets().collect()}
        want = {r["vec_id"]: r["buckets"]
                for r in similarity.lsh_bucket_arrays(
                    mutated, dim).collect()}
        assert got == want

    def test_string_id_col_changed_path(self, spark, emb, dim, tmp_path):
        """The changed-vector reindex must derive the id TYPE from the
        corpus schema — a hardcoded `long` frame fails (or silently
        type-mismatches the joins) on string-keyed corpora."""
        s_emb = emb.select(
            F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
            "embedding",
        )
        idx = LshIndexTape(spark, str(tmp_path / "anns"), dim)
        idx.refresh(s_emb)
        mutated = s_emb.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") == "doc-0",
                F.transform("embedding", lambda x: -x),
            ).otherwise(F.col("embedding")),
        )
        res = idx.refresh(mutated)
        assert res["changed"] == 1 and res["indexed"] == 1
        assert idx.read_buckets().count() == s_emb.count()
        got = {r["vec_id"]: r["buckets"]
               for r in idx.read_buckets().collect()}
        want = {r["vec_id"]: r["buckets"]
                for r in similarity.lsh_bucket_arrays(
                    mutated, dim).collect()}
        assert got == want

    def test_config_change_forces_full_rebuild(self, spark, emb, dim, tmp_path):
        root = str(tmp_path / "ann")
        LshIndexTape(spark, root, dim, n_tables=12).refresh(emb)
        idx2 = LshIndexTape(spark, root, dim, n_tables=8)
        res = idx2.refresh(emb)
        assert res["mode"] == "full"
        assert idx2.read_buckets().first()["buckets"].__len__() == 8
