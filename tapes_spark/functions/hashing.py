"""Content hashing — block signatures and the cumulative chain hash.

  N7  block signature — sha256 over a canonical-form projection of one
      turn (tapes pkg/derive/transcript.go:236-257): canonical key order
      is guaranteed by FIXED struct field order inside to_json, the Spark
      equivalent of RFC-8785 canonicalization for a known schema.
  P11 turn-chain hash — per conversation, each turn's node hash links to
      its parent: ``h_i = sha256(h_{i-1} || sig_i)`` (tapes
      pkg/merkle/node.go:138-205, chain.go:45-118).  Strictly sequential
      per conversation, so it runs as a grouped-map pandas fold — the ONE
      shape where per-key sequential logic is idiomatic (SURVEY §7).
      Injected-context turns are side-branch nodes: they receive a hash
      but the spine hash BYPASSES them (chain.go:75-98).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def block_signature_col(
    role: Column, text_norm: Column, tool: Column
) -> Column:
    """N7: canonical signature of one projected turn.  Field order in the
    struct IS the canonical order — stable across runs and machines."""
    return F.sha2(
        F.to_json(
            F.struct(
                role.alias("role"),
                text_norm.alias("text"),
                tool.alias("tool"),
            )
        ),
        256,
    )


def with_block_signature(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "block_sig",
        block_signature_col(F.col("role"), F.col("text_norm"), F.col("tool")),
    )


_CHAIN_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("node_hash", StringType()),
        StructField("parent_hash", StringType()),
    ]
)


def _chain_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    out = []
    spine = ""  # root parent = empty (genesis)
    for _, r in pdf.iterrows():
        parent = spine
        h = hashlib.sha256(
            (parent + "|" + str(r["block_sig"])).encode()
        ).hexdigest()
        out.append((r["conv_id"], int(r["turn_idx"]), h, parent))
        if not bool(r["is_injected"]):
            # spine bypasses injected side-branch nodes (chain.go:75-98)
            spine = h
    return pd.DataFrame(
        out, columns=["conv_id", "turn_idx", "node_hash", "parent_hash"]
    )


def chain_hashes(df: DataFrame) -> DataFrame:
    """P11 entry: per-conversation cumulative chain hash.

    Input needs: conv_id, turn_idx, block_sig, and call_kind (injected
    detection).  Returns (conv_id, turn_idx, node_hash, parent_hash).
    """
    narrow = with_block_signature(df).select(
        "conv_id",
        "turn_idx",
        "block_sig",
        (F.col("call_kind") == "injected").alias("is_injected"),
    )
    return narrow.groupBy("conv_id").applyInPandas(
        _chain_fold, schema=_CHAIN_SCHEMA
    )
