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

def _distinct_toks(text_col: str) -> F.Column:
    """JVM-side distinct tokens for the signature paths.  NULL text must
    fold to an EMPTY token list: split(NULL) -> NULL array, and a None
    element reaching the vectorized batch tokenizer crashes the whole
    mapInPandas stage (len(None)) — a null doc signs like an empty one."""
    return F.coalesce(
        F.array_distinct(tokens_col(F.col(text_col))),
        F.array().cast("array<string>"),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Explicit fan-out before mapInPandas: a single parquet file scans as
    ONE task (and a broadcast join never repartitions its stream side), so
    without this the signature generation AND every downstream stage of
    the LSH band join would run at parallelism 1.  Explicit count because
    AQE coalesces a bare repartition(col) to ~64MB advisory partitions.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, "doc_id")


def _spread_toks(docs: DataFrame, text_col: str) -> DataFrame:
    """Fan out the RAW text, tokenize AFTER the exchange.

    Projecting ``array_distinct(tokens_col(...))`` below ``_spread`` (the
    round-4 shape) ran the split+dedup in the SCAN stage — whose
    parallelism is bound by parquet file splits, not cores — and shuffled
    the token arrays instead of one string per doc.  Keeping the
    projection above the exchange runs tokenization at full parallelism
    in the same stage as the Arrow hand-off (measured 13-16% wall
    regression at sf0.1 the other way)."""
    spread = _spread(docs.select("doc_id", text_col))
    return spread.select(
        "doc_id", _distinct_toks(text_col).alias("toks")
    )


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


def hash_token(tok: str) -> int:
    """Deterministic 61-bit token hash (FNV-1a), stable across processes
    (python's hash() is salted per-process — unusable for distributed
    determinism).  Reference semantics for :func:`_fnv_hashes`; the hot
    path never calls this per token."""
    h = 0xCBF29CE484222325
    for byte in tok.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % _MERSENNE


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv_block(encoded: list[bytes], lens: np.ndarray) -> np.ndarray:
    """Padded-matrix FNV-1a over one near-uniform-length block: the hash
    state advances one byte POSITION per numpy op instead of one byte per
    Python op.  Callers bucket by length first so the pad stays bounded."""
    n = len(encoded)
    maxlen = int(lens.max())
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if maxlen > 0:
        flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        mask = np.arange(maxlen)[None, :] < lens[:, None]
        buf = np.zeros((n, maxlen), dtype=np.uint8)
        buf[mask] = flat  # boolean assignment fills row-major = concat order
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                m = mask[:, j]
                h[m] = (h[m] ^ buf[m, j]) * _FNV_PRIME
    return h


def _fnv_hashes(tokens) -> np.ndarray:
    """Vectorized FNV-1a over an array of strings — bit-identical to
    :func:`hash_token` but folded across whole length-buckets at once.

    Tokens are bucketed by length OCTAVE before padding: a flat padded
    matrix is O(n x max_token_len), so one pathological long token (a
    minified no-whitespace blob among thousands of short tokens) would
    inflate it to GBs; within an octave the pad waste is < 2x, keeping
    total work near O(total_bytes).  Tiny groups of extreme-length
    outliers fall back to the scalar reference hash (the per-position
    vector loop degenerates to per-byte numpy calls there).
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    encoded = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(e) for e in encoded), count=n, dtype=np.int64)
    out = np.empty(n, dtype=np.uint64)
    octave = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    if nz.any():
        # frexp exponent = floor(log2)+1: octave k covers [2^(k-1), 2^k)
        octave[nz] = np.frexp(lens[nz].astype(np.float64))[1]
    for o in np.unique(octave):
        idx = np.nonzero(octave == o)[0]
        blk_lens = lens[idx]
        maxlen = int(blk_lens.max())
        if maxlen > 1024 and len(idx) * 8 < maxlen:
            for i in idx:
                out[i] = hash_token(str(tokens[i]))  # already < _MERSENNE
            continue
        out[idx] = _fnv_block([encoded[i] for i in idx], blk_lens)
    return out % np.uint64(_MERSENNE)


def _batch_token_hashes(tok_lists) -> tuple[np.ndarray, np.ndarray]:
    """Distinct-token hashes for a whole Arrow batch of PRE-TOKENIZED
    docs (*tok_lists*: one distinct-token array per doc, produced
    JVM-side by ``array_distinct(tokens_col(...))`` — codegen split +
    dedup, no per-doc Python ``set(str.split())`` in the hot path, and
    the signature tokenizer is definitionally the same one the
    verify/oracle paths use).

    Returns (hashes, offsets): ``hashes[offsets[i]:offsets[i+1]]`` are the
    hashes of doc i's distinct tokens.  Each batch-distinct token is FNV'd
    exactly once (np.unique inverse mapping) — near-dup corpora share most
    of their vocabulary, so this is a large constant-factor win on top of
    the vectorized FNV.
    """
    n = len(tok_lists)
    lens = np.fromiter((len(t) for t in tok_lists), count=n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if offsets[-1] == 0:
        return np.empty(0, dtype=np.uint64), offsets
    all_toks = np.concatenate(
        [np.asarray(t, dtype=object) for t in tok_lists if len(t)]
    )
    uniq, inv = np.unique(all_toks, return_inverse=True)
    return _fnv_hashes(uniq)[inv], offsets


def minhash_signatures(
    docs: DataFrame, num_perm: int = 64, seed: int = 42, text_col: str = "text"
) -> DataFrame:
    """doc_id -> array<bigint> MinHash signature.

    Tokenization runs JVM-side (``array_distinct(tokens_col(...))``,
    whole-stage codegen) and only flat token arrays cross the Arrow
    boundary; inside mapInPandas everything is batch-vectorized numpy —
    one FNV pass over the batch vocabulary, then per permutation a
    single (a*h+b) mod p vector op over every token in the batch with a
    segmented min (np.minimum.reduceat) per doc.  No per-doc or
    per-token Python in the hot path (the round-1 per-token FNV loop —
    and the round-3 per-doc ``set(str.split())`` — were the serial
    residue at scale).
    """
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
            n = len(pdf)
            hashes, offsets = _batch_token_hashes(pdf["toks"])
            sig_mat = np.zeros((n, num_perm), dtype=np.int64)
            nonempty = offsets[:-1] < offsets[1:]
            starts = offsets[:-1][nonempty]
            if hashes.size:
                with np.errstate(over="ignore"):
                    for i in range(num_perm):
                        vals = (a_params[i] * hashes + b_params[i]) % np.uint64(
                            _MERSENNE
                        )
                        # empty segments were dropped from starts, so each
                        # reduceat span covers exactly one doc's tokens
                        sig_mat[nonempty, i] = np.minimum.reduceat(
                            vals, starts
                        ).astype(np.int64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "signature": list(sig_mat)}
            )

    return _spread_toks(docs, text_col).mapInPandas(compute, out_schema)


def minhash_band_hashes(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """doc_id -> ``bh`` array<bigint>: one 64-bit LSH band key per band.

    rows_per_band = num_perm / bands tunes the S-curve; 16 bands x 4 rows
    targets ~0.6 similarity.  64-bit band keys (xxhash64 of the band's
    signature slice, salted with the band index): bigint keys join far
    cheaper than sha256 strings, and a hash collision can only create a
    false CANDIDATE — the exact verify removes it.  This is the HALF the
    persisted dedup index stores (dedup_index.MinHashIndexTape); the
    recompute path (:func:`minhash_lsh_pairs`) composes the same halves,
    so indexed and recomputed answers are bit-identical.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, num_perm, seed, text_col)
    band_hashes = F.array(
        *[
            F.xxhash64(
                F.lit(i),
                *[
                    F.col("signature")[i * rows_per_band + j]
                    for j in range(rows_per_band)
                ],
            )
            for i in range(bands)
        ]
    )
    return sig.select("doc_id", band_hashes.alias("bh"))


def pairs_from_band_hashes(bh_df: DataFrame, bands: int) -> DataFrame:
    """Candidate (doc1, doc2) pairs from a (doc_id, bh) frame via the
    banded equi-join — shuffles on (band_idx, band_hash), bucket-sized,
    never all-pairs."""
    banded = bh_df.select(
        "doc_id",
        "bh",
        F.posexplode("bh").alias("band_idx", "band_hash"),
    )
    left = banded.select(
        F.col("doc_id").alias("doc1"), F.col("bh").alias("bh1"),
        "band_idx", "band_hash",
    )
    right = banded.select(
        F.col("doc_id").alias("doc2"), F.col("bh").alias("bh2"),
        "band_idx", "band_hash",
    )
    # a pair is emitted ONLY from the first band where it collides: no
    # earlier band j < band_idx has bh1[j] == bh2[j].  This replaces the
    # candidates.distinct() a naive banded join needs — on dense near-dup
    # corpora that distinct shuffles bands x pairs rows and dominates the
    # query; the first-collision filter runs inside the join stage and
    # nothing wider than the deduped pair set is ever shuffled.  Expressed
    # as a flat OR-chain of array-index comparisons (stays in whole-stage
    # codegen; slice/zip_with higher-order functions are interpreted
    # per-row and were measured 2x slower here).
    collide_earlier = F.lit(False)
    for j in range(bands - 1):
        collide_earlier = collide_earlier | (
            (F.col("band_idx") > j) & (F.col("bh1")[j] == F.col("bh2")[j])
        )
    return (
        left.join(right, ["band_idx", "band_hash"])
        .filter((F.col("doc1") < F.col("doc2")) & ~collide_earlier)
        .select("doc1", "doc2")
    )


def verify_jaccard(
    candidates: DataFrame,
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc1, doc2) pairs.

    Joins each side's distinct-token set, HASHED to 64-bit ids, and
    intersects natively.  This keeps verification at O(|candidates|) rows
    with per-row JVM array ops; the earlier explode-join form pushed
    O(|candidates| x tokens-per-doc) rows through a shuffle and dominated
    the query on dense corpora.  bigint intersects are several-fold
    cheaper than string intersects (Catalyst duplicates the intersect
    when it pushes the jaccard filter into the join condition, so
    per-eval cost matters twice over); a 64-bit collision changing a
    count is ~|toks|^2/2^64 — negligible.
    """
    tok_arrays = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(tokens_col(F.col(text_col)), lambda t: F.xxhash64(t))
        ).alias("toks"),
    )
    t1 = tok_arrays.select(
        F.col("doc_id").alias("doc1"), F.col("toks").alias("toks1")
    )
    t2 = tok_arrays.select(
        F.col("doc_id").alias("doc2"), F.col("toks").alias("toks2")
    )
    n1, n2 = F.size("toks1"), F.size("toks2")
    # exact-safe size prefilter: jaccard <= min(n1,n2)/max(n1,n2), so a
    # size-incompatible pair can never reach the threshold — rejected
    # before any intersect is computed.  The final filter compares the
    # 4dp-ROUNDED jaccard, so leave that half-ulp of slack here.
    t_eff = threshold - 0.00005
    size_compatible = (n1 >= F.lit(t_eff) * n2) & (n2 >= F.lit(t_eff) * n1)
    # NOTE (r6): a nondeterministic-sentinel "pushdown barrier" variant
    # meant to single-evaluate the intersect was tried and reverted — the
    # optimizer prunes the unused sentinel and pushes the threshold
    # filter into the join either way (both plans carry 3 array_intersect
    # occurrences; alternating warm A/B identical within noise).  The
    # duplication is bounded by Catalyst's own CSE at runtime; keep the
    # straightforward form.
    shared = F.size(F.array_intersect("toks1", "toks2"))
    return (
        candidates.join(t1, "doc1")
        .join(t2, "doc2")
        .filter(size_compatible)
        .withColumn("shared", shared)
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (n1 + n2 - F.col("shared")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """MinHash + banded LSH candidate generation, then exact-Jaccard
    verification of candidates only.  Composed from the three shareable
    halves (:func:`minhash_band_hashes` -> :func:`pairs_from_band_hashes`
    -> :func:`verify_jaccard`) so the persisted-index path
    (dedup_index.MinHashIndexTape) answers bit-identically.
    """
    bh = minhash_band_hashes(docs, num_perm, bands, seed, text_col)
    candidates = pairs_from_band_hashes(bh, bands)
    return verify_jaccard(candidates, docs, threshold, text_col)


# ------------------------------------------------------------- simhash

def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc (JVM-side tokenization, vectorized numpy
    majority vote in mapInPandas).  Deterministic by construction: the
    per-token hash is seedless FNV-1a, so there is no seed knob — the
    oracle SQL recomputes the identical function from first principles."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("simhash", LongType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batch-vectorized: one FNV pass over the batch vocabulary, then a
        # segmented per-doc majority vote per bit (np.add.reduceat) — no
        # per-doc or per-token Python loops
        for pdf in batches:
            n = len(pdf)
            hashes, offsets = _batch_token_hashes(pdf["toks"])
            acc = np.zeros(n, dtype=np.uint64)
            seg_lens = offsets[1:] - offsets[:-1]
            nonempty = seg_lens > 0
            starts = offsets[:-1][nonempty]
            if hashes.size:
                ne_lens = seg_lens[nonempty]
                acc_ne = np.zeros(int(nonempty.sum()), dtype=np.uint64)
                for j in range(64):
                    col = ((hashes >> np.uint64(j)) & np.uint64(1)).astype(
                        np.int64
                    )
                    ones = np.add.reduceat(col, starts)
                    bit = (2 * ones >= ne_lens).astype(np.uint64)
                    acc_ne |= bit << np.uint64(j)
                acc[nonempty] = acc_ne
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    # bit-reinterpret uint64 -> signed 64 (two's complement)
                    "simhash": acc.view(np.int64),
                }
            )

    return _spread_toks(docs, text_col).mapInPandas(compute, out_schema)


def pairs_from_simhashes(
    sig: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs from a (doc_id, simhash) frame — the query half the
    persisted index (dedup_index.SimHashIndexTape) shares with the
    recompute path, so indexed and recomputed answers are bit-identical.

    Candidates via 4x16-bit chunk equality (pigeonhole: any pair within
    hamming 3 shares at least one exact chunk), then exact popcount filter.
    """
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
    # a pair is emitted ONLY from the first chunk where it collides — the
    # same first-collision trick the MinHash band join uses: since both
    # full signatures ride the join, whether an EARLIER chunk j < chunk_idx
    # also matched is recomputable in place (shiftright+mask on sh1/sh2),
    # so the candidate set is exact-once without a (chunks x pairs)-wide
    # .distinct() shuffle.  Flat OR-chain (stays in whole-stage codegen).
    def _chunk(col: str, j: int):
        return (
            F.shiftright(F.col(col), j * 16).bitwiseAND(F.lit(0xFFFF))
        )

    collide_earlier = F.lit(False)
    for j in range(3):
        collide_earlier = collide_earlier | (
            (F.col("chunk_idx") > j) & (_chunk("sh1", j) == _chunk("sh2", j))
        )
    cand = (
        left.join(right, ["chunk_idx", "chunk"])
        .filter((F.col("doc1") < F.col("doc2")) & ~collide_earlier)
        .select("doc1", "doc2", "sh1", "sh2")
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming (signature
    generation + :func:`pairs_from_simhashes`)."""
    return pairs_from_simhashes(
        simhash_signatures(docs, text_col), max_hamming
    )
