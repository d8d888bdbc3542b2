"""Multimodal columns — binary payloads with typed metadata.

Images / audio / video ride as opaque ``binary`` columns next to a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The Spark-side plumbing (schema,
batch shape, partition sizing, deterministic fake codec for tests) is
real; the actual media decoding is STUBBED behind ``_decode_image`` —
this container ships no image/audio libraries, so the stub either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(test mode).  Swap the stub for PIL/torchaudio on a real cluster.

Scale notes: binary payloads dominate row size, so the batch size for
mapInPandas stages must be bounded by BYTES not rows —
``media_repartition`` sizes partitions by payload bytes (the analog of
``spark.sql.files.maxPartitionBytes`` for already-loaded media).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_sha256", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_image(payload: bytes, fake: bool):
    """STUB: real deployments decode with PIL/libvips here."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake_decode=True or install a codec backend"
        )
    # deterministic fake: a pseudo-pixel array seeded by content hash
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.rand(8, 8)  # tiny fake luminance plane


def extract_features(
    media: DataFrame, fake_decode: bool = False
) -> DataFrame:
    """decode -> pooled feature vector, Arrow-batched via mapInPandas.

    The returned feature is deterministic per payload (content-hash
    seeded), so downstream dedup/similarity over media features is
    idempotent like everything else (D2).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode is the one per-item boundary (a real codec decodes one
        # payload at a time); everything else — hashing, pooling — runs
        # over the whole batch (no iterrows / per-row frame access)
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            if payloads:
                planes = np.stack(
                    [_decode_image(p, fake_decode) for p in payloads]
                )
                # pooled features: per-plane row/col means, batched
                feats = np.concatenate(
                    [planes.mean(axis=1), planes.mean(axis=2)], axis=1
                ).astype(np.float32)[:, :FEATURE_DIM]
                feat_lists = list(feats)
            else:
                feat_lists = []
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "payload_bytes": [len(p) for p in payloads],
                    "feature": feat_lists,
                }
            )

    return media.select(
        "media_id", "kind", "payload"
    ).mapInPandas(compute, _FEATURE_SCHEMA)


def media_repartition(
    media: DataFrame, target_partition_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Byte-aware repartition: estimates total payload bytes and picks the
    partition count so each holds ~target bytes of media.  Rows-based
    defaults mis-size media tables by orders of magnitude."""
    stats = media.agg(
        F.sum(F.length("payload")).alias("total"), F.count("*").alias("n")
    ).collect()[0]
    total = stats["total"] or 0
    n_parts = max(1, int(total / target_partition_bytes) + 1)
    return media.repartition(n_parts, "media_id")


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup by payload content hash (no decode needed)."""
    h = F.sha2(F.col("payload"), 256)
    return media.groupBy(h.alias("payload_sha256")).agg(
        F.min("media_id").alias("canonical_media_id"),
        F.count("*").alias("n_copies"),
        F.first("kind").alias("kind"),
    )


def make_fake_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (no external data)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rng.choice(["image", "audio", "video"])
        # duplicate every 8th payload to exercise dedup (the repeat factor
        # must derive from the seed too, or the "copies" differ)
        payload_seed = i if i % 8 else 0
        payload = hashlib.sha256(str(payload_seed).encode()).digest() * (
            payload_seed % 3 + 1
        )
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                rng.randint(16, 256),
                rng.randint(16, 256),
                rng.randint(100, 60_000),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
