"""Persisted dedup indexes — signatures as first-class sinks.

At corpus scale, dedup is INCREMENTAL by nature: a training-data pipeline
receives batches of new documents and must dedupe each batch against a
corpus whose signatures were already paid for.  Recomputing MinHash or
SimHash over 100 TB per incoming batch is the one thing the design must
never do — the signature table IS the index (the same argument as the
vector index, ann_index.LshIndexTape; reference analog: the reference
persists derived artifacts keyed by content hash and re-derives only
dirty sessions, pkg/storage/postgres/derive.go:246-265,
pkg/spanembed/store.go:176-180).

Both tapes materialize their signature half into a snapshot-versioned
:class:`TapeTable`, content-hash-keyed per document (D4) and
incrementally maintained (D3/D5) with the decide() ladder:

  * a doc already indexed under the same text hash is skipped
    (``up_to_date`` — no tokenization, no signature);
  * a NEW doc_id gets its signature appended;
  * a CHANGED doc (same id, different text hash) gets its partition
    overwritten;
  * a CONFIG change invalidates the whole tape (signatures from
    different permutations/seeds are not comparable) and triggers a
    full rebuild.

Queries share the recompute path's halves (``pairs_from_band_hashes`` +
``verify_jaccard`` for MinHash; ``pairs_from_simhashes`` for SimHash),
so indexed and recomputed pair sets are bit-identical for the same
corpus snapshot.  ``pairs_with`` is the scale query: candidates are
generated from the BATCH's signature rows joined against the stored
corpus signatures — the batch side is O(batch) rows and broadcastable
when small (AQE picks it), the corpus side is a columnar scan of stored
longs, and no signature is ever recomputed.

Scale notes: refresh shuffles only the (doc_id, doc_hash) anti-join; the
only driver-side list is the CHANGED-id set handed to partition
overwrite (bounded by the delta, not the corpus — new ids take the
append path with no driver list at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tapes_spark.operators.dedup import (
    minhash_band_hashes,
    pairs_from_band_hashes,
    pairs_from_simhashes,
    simhash_signatures,
    verify_jaccard,
)
from tapes_spark.tapelog.table import TapeTable


def doc_content_hash(text_col: str) -> F.Column:
    """Deterministic 64-bit content hash of the document text (the
    change-detector key, D4).  NULL text folds to the empty-text hash —
    matching the signature paths, where both produce the empty token
    list."""
    return F.xxhash64(F.coalesce(F.col(text_col), F.lit("")))


class _DocIndexTape:
    """Shared incremental-maintenance machinery: subclasses provide
    ``config`` and ``_sign(docs) -> (doc_id, <signature cols>)``."""

    def __init__(
        self, spark: SparkSession, root: str, text_col: str = "text"
    ):
        self.spark = spark
        self.tape = TapeTable(spark, root)
        self.text_col = text_col

    def _sign(self, docs: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def _codes(self, docs: DataFrame) -> DataFrame:
        """Signatures stamped with the content hash — attached by an id
        equi-join so the signature stage stays (doc_id, toks)-narrow."""
        stamped = docs.select(
            "doc_id", doc_content_hash(self.text_col).alias("doc_hash")
        )
        return self._sign(docs).join(stamped, "doc_id")

    def stored_config(self) -> str | None:
        snaps = self.tape.snapshots()
        if not snaps:
            return None
        return snaps[-1].get("lineage", {}).get("config")

    def refresh(self, docs: DataFrame) -> dict:
        """One incremental maintenance pass; idempotent (a second call on
        the same corpus is a no-op).  Returns per-action counts — the
        decide() ladder for documents."""
        lineage = {"config": self.config}
        if self.stored_config() != self.config:
            self.tape.overwrite(
                self._codes(docs), {**lineage, "op": "full_build"}
            )
            return {"mode": "full", "indexed": self.tape.read().count(),
                    "up_to_date": 0, "changed": 0}
        current = self.tape.read().select("doc_id", "doc_hash")
        stamped = docs.select(
            "doc_id", doc_content_hash(self.text_col).alias("doc_hash")
        )
        todo_keys = stamped.join(
            current, ["doc_id", "doc_hash"], "left_anti"
        )
        n_todo = todo_keys.count()  # anti-join only — no signatures yet
        total = docs.count()
        if n_todo == 0:
            return {"mode": "incremental", "indexed": 0,
                    "up_to_date": total, "changed": 0}
        # changed = ids already indexed under a DIFFERENT text hash; this
        # driver-side list is bounded by the delta, not the corpus
        changed_ids = [
            r["doc_id"]
            for r in todo_keys.join(
                current.select("doc_id"), "doc_id", "left_semi"
            ).select("doc_id").collect()
        ]
        todo = docs.join(
            todo_keys.select("doc_id"), "doc_id", "left_semi"
        )
        codes = self._codes(todo)
        n_changed = len(changed_ids)
        if n_changed:
            from pyspark.sql.types import StructField, StructType

            changed_df = self.spark.createDataFrame(
                [(i,) for i in changed_ids],
                StructType(
                    [StructField(
                        "doc_id", docs.schema["doc_id"].dataType
                    )]
                ),
            )
            self.tape.overwrite_partitions(
                codes.join(changed_df, "doc_id", "left_semi"),
                "doc_id", changed_ids,
                {**lineage, "op": "reindex_changed"},
            )
            new_codes = codes.join(changed_df, "doc_id", "left_anti")
        else:
            new_codes = codes
        if n_todo - n_changed:
            self.tape.append(new_codes, {**lineage, "op": "append_new"})
        return {
            "mode": "incremental",
            "indexed": n_todo,
            "up_to_date": total - n_todo,
            "changed": n_changed,
        }


class MinHashIndexTape(_DocIndexTape):
    """Persisted MinHash band hashes: (doc_id, doc_hash, bh)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        num_perm: int = 64,
        bands: int = 16,
        seed: int = 42,
        text_col: str = "text",
    ):
        super().__init__(spark, root, text_col)
        self.num_perm = num_perm
        self.bands = bands
        self.seed = seed
        self.config = (
            f"minhash-v1:perms={num_perm}:bands={bands}:seed={seed}"
        )

    def _sign(self, docs: DataFrame) -> DataFrame:
        return minhash_band_hashes(
            docs, self.num_perm, self.bands, self.seed, self.text_col
        )

    # ---------------------------------------------------------- query

    def read_band_hashes(self) -> DataFrame:
        """(doc_id, bh) from the CURRENT index snapshot — no
        tokenization, no signature recompute: queries scan stored
        codes."""
        return self.tape.read().select("doc_id", "bh")

    def pairs(self, docs: DataFrame, threshold: float = 0.6) -> DataFrame:
        """Full near-dup pair set served from the persisted index
        (exact-Jaccard verify reads *docs* for token sets) —
        bit-identical to ``minhash_lsh_pairs`` on the same snapshot."""
        candidates = pairs_from_band_hashes(
            self.read_band_hashes(), self.bands
        )
        return verify_jaccard(candidates, docs, threshold, self.text_col)

    def pairs_with(
        self,
        docs: DataFrame,
        new_ids: DataFrame,
        threshold: float = 0.6,
    ) -> DataFrame:
        """Batch-vs-corpus dedup — THE incremental query: near-dup pairs
        touching at least one id in *new_ids* (a one-column doc_id
        frame), after the batch has been :meth:`refresh`-ed in.

        Only the batch's band rows explode on the probe side
        (O(batch x bands) rows; AQE broadcasts it when small), joined
        against the full stored band table; corpus-corpus pairs are
        never generated, and no signature is recomputed.  Equals
        ``pairs(docs).filter(doc1 in new or doc2 in new)`` bit-for-bit
        (gated in tests) at a fraction of the candidate volume.
        """
        bh = self.read_band_hashes()
        new_keys = new_ids.select("doc_id")
        probe = bh.join(new_keys, "doc_id", "left_semi")
        banded_probe = probe.select(
            F.col("doc_id").alias("doc1"), F.col("bh").alias("bh1"),
            F.posexplode("bh").alias("band_idx", "band_hash"),
        )
        flagged = bh.join(
            new_keys.withColumn("is_new", F.lit(True)), "doc_id", "left"
        )
        banded_all = flagged.select(
            F.col("doc_id").alias("doc2"), F.col("bh").alias("bh2"),
            F.coalesce("is_new", F.lit(False)).alias("is_new2"),
            F.posexplode("bh").alias("band_idx", "band_hash"),
        )
        # first-collision dedup across bands (same contract as
        # pairs_from_band_hashes); a new-new pair would surface from both
        # sides, so it additionally requires doc1 < doc2 — a new-old pair
        # surfaces only with the new doc on the probe side.
        collide_earlier = F.lit(False)
        for j in range(self.bands - 1):
            collide_earlier = collide_earlier | (
                (F.col("band_idx") > j)
                & (F.col("bh1")[j] == F.col("bh2")[j])
            )
        candidates = (
            banded_probe.join(banded_all, ["band_idx", "band_hash"])
            .filter(
                (F.col("doc1") != F.col("doc2"))
                & ~collide_earlier
                & (~F.col("is_new2") | (F.col("doc1") < F.col("doc2")))
            )
            .select(
                F.least("doc1", "doc2").alias("doc1"),
                F.greatest("doc1", "doc2").alias("doc2"),
            )
        )
        return verify_jaccard(candidates, docs, threshold, self.text_col)


class SimHashIndexTape(_DocIndexTape):
    """Persisted 64-bit SimHashes: (doc_id, doc_hash, simhash)."""

    def __init__(
        self, spark: SparkSession, root: str, text_col: str = "text"
    ):
        super().__init__(spark, root, text_col)
        # SimHash has no tunables (seedless FNV-1a, fixed 64 bits); the
        # version string still invalidates the tape on algorithm change.
        self.config = "simhash-v1:fnv64"

    def _sign(self, docs: DataFrame) -> DataFrame:
        return simhash_signatures(docs, self.text_col)

    # ---------------------------------------------------------- query

    def read_signatures(self) -> DataFrame:
        return self.tape.read().select("doc_id", "simhash")

    def pairs(self, max_hamming: int = 3) -> DataFrame:
        """Full near-dup pair set served from the persisted index —
        bit-identical to ``simhash_pairs`` on the same snapshot.  Fully
        index-resident: SimHash verification is a popcount on the stored
        signatures, so no document text is read at all."""
        return pairs_from_simhashes(self.read_signatures(), max_hamming)

    def pairs_with(
        self, new_ids: DataFrame, max_hamming: int = 3
    ) -> DataFrame:
        """Batch-vs-corpus near-dup pairs touching *new_ids* — probe side
        is only the batch's signatures; no corpus-corpus candidates, no
        text reads, no signature recompute."""
        sig = self.read_signatures()
        new_keys = new_ids.select("doc_id")
        probe = sig.join(new_keys, "doc_id", "left_semi")

        def _chunked(df: DataFrame, id_alias: str, sh_alias: str,
                     extra=None) -> DataFrame:
            cols = [
                F.col("doc_id").alias(id_alias),
                F.col("simhash").alias(sh_alias),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("chunk_idx"),
                                F.shiftright(F.col("simhash"), i * 16)
                                .bitwiseAND(F.lit(0xFFFF))
                                .alias("chunk"),
                            )
                            for i in range(4)
                        ]
                    )
                ).alias("c"),
            ]
            if extra is not None:
                cols.insert(2, extra)
            return df.select(*cols).select(
                "*", "c.chunk_idx", "c.chunk"
            ).drop("c")

        chunks_probe = _chunked(probe, "doc1", "sh1")
        flagged = sig.join(
            new_keys.withColumn("is_new", F.lit(True)), "doc_id", "left"
        )
        chunks_all = _chunked(
            flagged, "doc2", "sh2",
            extra=F.coalesce("is_new", F.lit(False)).alias("is_new2"),
        )

        def _chunk(col: str, j: int):
            return (
                F.shiftright(F.col(col), j * 16).bitwiseAND(F.lit(0xFFFF))
            )

        collide_earlier = F.lit(False)
        for j in range(3):
            collide_earlier = collide_earlier | (
                (F.col("chunk_idx") > j)
                & (_chunk("sh1", j) == _chunk("sh2", j))
            )
        hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
        return (
            chunks_probe.join(chunks_all, ["chunk_idx", "chunk"])
            .filter(
                (F.col("doc1") != F.col("doc2"))
                & ~collide_earlier
                & (~F.col("is_new2") | (F.col("doc1") < F.col("doc2")))
            )
            .withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select(
                F.least("doc1", "doc2").alias("doc1"),
                F.greatest("doc1", "doc2").alias("doc2"),
                "hamming",
            )
        )
