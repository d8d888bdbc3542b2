"""Similarity search over an embedding column (array<float>).

Two paths, mirroring what a 100 TB pipeline needs:

  brute_cosine_topk — exact baseline: dot product via zip_with/aggregate
                      higher-order functions (JVM-side, no Python), full
                      scan + top-k.  Right answer, O(n) per query.
  lsh_cosine_topk   — scale path: random-hyperplane LSH (sign-bit bucket
                      per table), candidates from bucket equi-join, exact
                      re-rank of candidates only.  Deterministic planes
                      (seeded) => idempotent.

The query vector is broadcast as a literal array — never a driver-side
collect loop over rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to query_vec.

    Ties broken by id ascending for determinism.  The orderBy+limit is a
    TakeOrderedAndProject — no full sort materializes.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _planes(dim: int, n_tables: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, bits, dim))


def cosine_dup_pairs_brute(
    embeddings: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS, exact all-pairs baseline.

    O(n^2) — the sf0.01 oracle for the LSH path below, same role as
    dedup.jaccard_pairs vs minhash_lsh_pairs.
    """
    a = embeddings.select(
        F.col(id_col).alias("vec1"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec2"), F.col(vec_col).alias("_vb")
    )
    pairs = a.join(b, a["vec1"] < b["vec2"])
    return (
        pairs.withColumn(
            "cosine", F.round(cosine_col(F.col("_va"), F.col("_vb")), 4)
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec1", "vec2", "cosine")
    )


def lsh_bucket_arrays(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = 12,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, buckets array<long> of length n_tables) — the whole batch's
    sign-bit codes from ONE numpy matmul (n x dim) @ (dim x tables*bits)
    inside mapInPandas.  The per-row interpreted higher-order-function
    form costs tables*bits*dim multiplies PER ROW in Catalyst's
    interpreter; this is the vectorized equivalent for the pair-join path
    (same seeded planes, so both paths are deterministic)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    planes = _planes(dim, n_tables, bits, seed)
    # (dim, n_tables*bits), column t*bits+b = plane[t, b]
    proj = planes.reshape(n_tables * bits, dim).T.copy()
    weights = (1 << np.arange(bits, dtype=np.int64))[None, None, :]
    # id type derived from the corpus schema: a hardcoded long breaks the
    # Arrow batch (and every downstream join) on string-keyed corpora
    out_schema = StructType(
        [
            StructField(id_col, embeddings.schema[id_col].dataType),
            StructField("buckets", ArrayType(LongType())),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n:
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                signs = (mat @ proj > 0).reshape(n, n_tables, bits)
                codes = (signs * weights).sum(axis=2, dtype=np.int64)
                bucket_lists = list(codes)
            else:
                bucket_lists = []
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "buckets": bucket_lists}
            )

    n_parts = embeddings.sparkSession.sparkContext.defaultParallelism
    return (
        embeddings.select(id_col, vec_col)
        .repartition(n_parts, id_col)  # single parquet file = single task
        .mapInPandas(compute, out_schema)
    )


def pairs_from_buckets(
    bucketed: DataFrame,
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-dup pairs from a PRE-BUCKETED (id, buckets) frame — the query
    half shared by the recompute path (:func:`cosine_dup_pairs_lsh`) and
    the persisted index tape (operators/ann_index.py), so bucket codes
    have exactly one consumer-side implementation.

    The candidate join carries ONLY (id, buckets) — n_tables longs —
    never the embedding vectors: a pair is emitted from the FIRST table
    where it collides (no earlier j < table_idx has
    buckets1[j] == buckets2[j]), the same in-join dedup the MinHash band
    join uses, so no (tables x pairs)-wide dropDuplicates shuffle and no
    full float arrays riding the fat stage.  Vectors are re-joined once,
    for the deduped pair set only, for the exact cosine recheck.
    """
    exploded = bucketed.select(
        id_col,
        "buckets",
        F.posexplode("buckets").alias("table_idx", "bucket"),
    )
    left = exploded.select(
        F.col(id_col).alias("vec1"), F.col("buckets").alias("bk1"),
        "table_idx", "bucket",
    )
    right = exploded.select(
        F.col(id_col).alias("vec2"), F.col("buckets").alias("bk2"),
        "table_idx", "bucket",
    )
    collide_earlier = F.lit(False)
    for j in range(n_tables - 1):
        collide_earlier = collide_earlier | (
            (F.col("table_idx") > j) & (F.col("bk1")[j] == F.col("bk2")[j])
        )
    cand = (
        left.join(right, ["table_idx", "bucket"])
        .filter((F.col("vec1") < F.col("vec2")) & ~collide_earlier)
        .select("vec1", "vec2")
    )
    va = embeddings.select(
        F.col(id_col).alias("vec1"), F.col(vec_col).alias("_va")
    )
    vb = embeddings.select(
        F.col(id_col).alias("vec2"), F.col(vec_col).alias("_vb")
    )
    return (
        cand.join(va, "vec1")
        .join(vb, "vec2")
        .withColumn(
            "cosine", F.round(cosine_col(F.col("_va"), F.col("_vb")), 4)
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec1", "vec2", "cosine")
    )


def cosine_dup_pairs_lsh(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_tables: int = 12,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scale path: candidate pairs share an LSH bucket in ANY table
    (bucket equi-join, never all-pairs), then exact cosine re-check.

    Recall vs the brute baseline is pytest-gated; at 0.9 cosine the
    12-table x 8-bit configuration collides with probability
    1-(1-(1-theta/pi)^8)^12 ~ 0.97.

    Recomputes bucket codes from the raw vectors — right for one-shot
    queries; repeated queries over a slowly-changing corpus should read
    the persisted index tape instead (operators/ann_index.LshIndexTape),
    which shares :func:`pairs_from_buckets` for the query half.
    """
    bucketed = lsh_bucket_arrays(
        embeddings, dim, n_tables, bits, seed, vec_col, id_col
    )
    return pairs_from_buckets(
        bucketed, embeddings, threshold, n_tables, vec_col, id_col
    )


def probe_codes(
    query_vec: list[float], n_tables: int, bits: int, seed: int = 42
) -> list[tuple[int, int]]:
    """(table_idx, bucket) probe codes for one query vector — the same
    sign formula as :func:`lsh_bucket_arrays`, so probe and table agree
    bit-for-bit."""
    dim = len(query_vec)
    planes = _planes(dim, n_tables, bits, seed)
    proj = planes.reshape(n_tables * bits, dim).T
    signs = (np.asarray(query_vec, dtype=np.float64) @ proj > 0).reshape(
        n_tables, bits
    )
    weights = 1 << np.arange(bits, dtype=np.int64)
    return [(t, int((signs[t] * weights).sum())) for t in range(n_tables)]


def topk_from_buckets(
    bucketed: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_tables: int = 8,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k from a PRE-BUCKETED (id, buckets) frame: probe the
    query's bucket in each table, exact re-rank of the candidate union.
    Shared by the recompute path and the persisted index tape."""
    exploded = bucketed.select(
        id_col, F.posexplode("buckets").alias("table_idx", "bucket")
    )
    probe_df = embeddings.sparkSession.createDataFrame(
        probe_codes(query_vec, n_tables, bits, seed),
        "table_idx int, bucket long",
    )
    candidate_ids = (
        exploded.join(F.broadcast(probe_df), ["table_idx", "bucket"])
        .select(id_col)
        .distinct()
    )
    candidates = embeddings.join(candidate_ids, id_col, "left_semi")
    return brute_cosine_topk(candidates, query_vec, k, vec_col, id_col)


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_tables: int = 8,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: probe the query's bucket in each table, exact re-rank of
    the union of candidates.  Recall is tested against brute force in
    tests/test_similarity.py.

    Table-side codes come from the same numpy matmul path as the pair
    join (:func:`lsh_bucket_arrays`) — ONE bucketing implementation, and
    no per-row interpreted hyperplane dots on the scan.  The probe codes
    use the identical sign formula, so probe and table agree bit-for-bit.

    Recomputes table codes per call — for repeated queries use the
    persisted index tape (operators/ann_index.LshIndexTape), which reads
    stored codes and shares :func:`topk_from_buckets`.
    """
    dim = len(query_vec)
    bucketed = lsh_bucket_arrays(
        embeddings, dim, n_tables, bits, seed, vec_col, id_col
    )
    return topk_from_buckets(
        bucketed, embeddings, query_vec, k, n_tables, bits, seed,
        vec_col, id_col,
    )
