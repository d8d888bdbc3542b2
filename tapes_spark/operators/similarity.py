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


def with_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = 8,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add (table_idx, bucket) rows: one per hash table, bucket = the
    sign-bit code of `bits` random hyperplanes.  Pure column expressions —
    the planes are literals baked into the plan (tiny: tables*bits*dim)."""
    planes = _planes(dim, n_tables, bits, seed)
    tables = []
    for t in range(n_tables):
        code = F.lit(0).cast("long")
        for b in range(bits):
            plane = planes[t, b]
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(p)) for p in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            code = code + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        tables.append(
            F.struct(F.lit(t).alias("table_idx"), code.alias("bucket"))
        )
    return embeddings.select(
        "*", F.explode(F.array(*tables)).alias("_t")
    ).select("*", "_t.table_idx", "_t.bucket").drop("_t")


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
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
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

    The candidate join carries ONLY (id, buckets) — 12 longs — never the
    embedding vectors: a pair is emitted from the FIRST table where it
    collides (no earlier j < table_idx has buckets1[j] == buckets2[j]),
    the same in-join dedup the MinHash band join uses, so no
    (tables x pairs)-wide dropDuplicates shuffle and no full float arrays
    riding the fat stage.  Vectors are re-joined once, for the deduped
    pair set only, for the exact cosine recheck.
    """
    bucketed = lsh_bucket_arrays(
        embeddings, dim, n_tables, bits, seed, vec_col, id_col
    )
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
    tests/test_similarity.py."""
    dim = len(query_vec)
    planes = _planes(dim, n_tables, bits, seed)
    qv = np.array(query_vec)
    probe = [
        (t, int(sum((1 << b) for b in range(bits) if planes[t, b] @ qv > 0)))
        for t in range(n_tables)
    ]
    bucketed = with_lsh_buckets(
        embeddings, dim, n_tables, bits, seed, vec_col
    )
    probe_df = bucketed.sparkSession.createDataFrame(
        probe, "table_idx int, bucket long"
    )
    candidates = (
        bucketed.join(F.broadcast(probe_df), ["table_idx", "bucket"])
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
    )
    return brute_cosine_topk(candidates, query_vec, k, vec_col, id_col)
