"""Deduplication operators over a documents table.

The dedup family a web-scale training-data pipeline needs, each with an
explicit scale story:

  exact_dedup        — hash-groupBy on sha256(text).  One shuffle on the
                       hash; partial agg makes the hot path map-side.
  fingerprint_dedup  — same, over the order-insensitive token-set
                       fingerprint (catches token-reordered copies).
  jaccard_pairs      — word-set Jaccard via shingle-explode + self-join.
                       The oracle-checkable BASELINE: O(sum_token df^2)
                       pairs — correct but quadratic in document frequency;
                       used to validate the LSH path on small data.
  minhash_lsh_pairs  — the SCALE path: vectorized numpy MinHash signatures
                       (mapInPandas, Arrow-batched), banded LSH bucketing,
                       candidate pairs from bucket equi-join (shuffle on
                       band-hash — bounded by bucket sizes, not n^2),
                       exact-Jaccard verification of candidates only.
  simhash_pairs      — 64-bit SimHash near-dup: hamming-ball candidates via
                       band equi-join on 4x16-bit chunks.

MinHash/SimHash signatures are deterministic (fixed hash seeds) so re-runs
are idempotent — the same correctness contract as the pipeline (D2).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapes_spark.operators.textstats import tokens_col, with_fingerprint

# -------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct text with the canonical (min)
    doc_id and the copy count."""
    h = F.sha2(F.col(text_col), 256)
    return (
        docs.groupBy(h.alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def fingerprint_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Dedup on the sorted-distinct-token fingerprint (catches reorders)."""
    fp = with_fingerprint(docs, text_col)
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("n_copies"),
    )


# ------------------------------------------------------------- jaccard

def _token_sets(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("token"),
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.6, text_col: str = "text"
) -> DataFrame:
    """Word-set Jaccard similarity pairs (doc1 < doc2, jaccard >= threshold).

    Brute-force baseline: explode distinct tokens, self-join on token,
    count shared, jaccard = shared / (|a|+|b|-shared).  At 100 TB this is
    the wrong plan (document frequency blows the join up) — use
    minhash_lsh_pairs; this exists as the small-scale oracle.
    """
    tok = _token_sets(docs, text_col)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    a = tok.select(F.col("doc_id").alias("doc1"), "token")
    b = tok.select(F.col("doc_id").alias("doc2"), "token")
    shared = (
        a.join(b, "token")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_tokens").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_tokens").alias("n2"))
    return (
        shared.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


# ------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame, num_perm: int = 64, seed: int = 42, text_col: str = "text"
) -> DataFrame:
    """doc_id -> array<bigint> MinHash signature, computed with vectorized
    numpy inside mapInPandas (no per-row Python)."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    a_params, b_params = _minhash_params(num_perm, seed)
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("signature", ArrayType(LongType())),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                toks = list({t for t in str(text).split() if t})
                if not toks:
                    sigs.append([0] * num_perm)
                    continue
                # stable 64-bit token hashes via numpy (vectorized mins)
                hashes = np.array(
                    [hash_token(t) for t in toks], dtype=np.uint64
                )
                # (a * h + b) mod p for all perms x tokens
                vals = (
                    np.outer(a_params, hashes) + b_params[:, None]
                ) % _MERSENNE
                sigs.append(vals.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "signature": sigs}
            )

    return docs.select("doc_id", text_col).mapInPandas(compute, out_schema)


def hash_token(tok: str) -> int:
    """Deterministic 61-bit token hash (FNV-1a), stable across processes
    (python's hash() is salted per-process — unusable for distributed
    determinism)."""
    h = 0xCBF29CE484222325
    for byte in tok.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % _MERSENNE


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """MinHash + banded LSH candidate generation, then exact-Jaccard
    verification of candidates only.

    rows_per_band = num_perm / bands tunes the S-curve; 16 bands x 4 rows
    targets ~0.6 similarity.  The candidate join shuffles on (band_idx,
    band_hash) — bucket-sized, never all-pairs.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, num_perm, seed, text_col)
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band_idx"),
                    F.sha2(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("signature")[i * rows_per_band + j]
                                for j in range(rows_per_band)
                            ],
                        ),
                        256,
                    ).alias("band_hash"),
                )
                for i in range(bands)
            ]
        )
    )
    banded = sig.select("doc_id", band_cols.alias("band")).select(
        "doc_id", "band.band_idx", "band.band_hash"
    )
    left = banded.select(
        F.col("doc_id").alias("doc1"), "band_idx", "band_hash"
    )
    right = banded.select(
        F.col("doc_id").alias("doc2"), "band_idx", "band_hash"
    )
    candidates = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    # exact verify candidates only
    tok = _token_sets(docs, text_col)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    t1 = tok.select(F.col("doc_id").alias("doc1"), "token")
    t2 = tok.select(F.col("doc_id").alias("t2_doc"), F.col("token").alias("token2"))
    shared = (
        candidates.join(t1, "doc1")
        .join(
            t2,
            (F.col("doc2") == F.col("t2_doc"))
            & (F.col("token") == F.col("token2")),
            "inner",
        )
        .groupBy("doc1", "doc2")
        .agg(F.countDistinct("token").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_tokens").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_tokens").alias("n2"))
    return (
        shared.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


# ------------------------------------------------------------- simhash

def simhash_signatures(
    docs: DataFrame, text_col: str = "text", seed: int = 42
) -> DataFrame:
    """64-bit SimHash per doc (vectorized numpy in mapInPandas)."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("simhash", LongType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = [t for t in str(text).split() if t]
                if not toks:
                    out.append(0)
                    continue
                hs = np.array(
                    [hash_token(t) for t in set(toks)], dtype=np.uint64
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                    np.int64
                )
                acc = np.where(bits.sum(axis=0) * 2 >= len(hs), 1, 0).astype(
                    np.uint64
                )
                val = int((acc << np.arange(64, dtype=np.uint64)).sum())
                # store as signed 64-bit
                out.append(val - (1 << 64) if val >= (1 << 63) else val)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "simhash": out})

    return docs.select("doc_id", text_col).mapInPandas(compute, out_schema)


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidates via 4x16-bit chunk equality (pigeonhole: any pair within
    hamming 3 shares at least one exact chunk), then exact popcount filter.
    """
    sig = simhash_signatures(docs, text_col)
    chunks = sig.select(
        "doc_id",
        "simhash",
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
    ).select("doc_id", "simhash", "c.chunk_idx", "c.chunk")
    left = chunks.select(
        F.col("doc_id").alias("doc1"), F.col("simhash").alias("sh1"),
        "chunk_idx", "chunk",
    )
    right = chunks.select(
        F.col("doc_id").alias("doc2"), F.col("simhash").alias("sh2"),
        "chunk_idx", "chunk",
    )
    cand = (
        left.join(right, ["chunk_idx", "chunk"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "sh1", "sh2")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )
