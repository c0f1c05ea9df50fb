"""Sequence packing for LLM training-data pipelines.

Training consumes fixed-length sequences; documents have arbitrary token
counts.  Packing assigns each document a (shard, pack_id, pack_offset)
under a token ``budget`` per pack, so a downstream writer can concatenate
the documents of one pack into one training sequence.

Scale design: a single global running sum would be one unpartitioned
window — a straight serialization at 100 TB.  Instead rows are first
sharded by a deterministic md5-derived hash of the id (``n_shards`` ≫
cluster cores), and packing runs INDEPENDENTLY inside each shard: one
window shuffle on (partition_cols, shard), each shard's cumulative sum
sized ~corpus/n_shards.  Pack ids are only unique within
(partition_cols, shard) — the global pack key is the tuple, which is
exactly what a sharded sequence writer wants.

Determinism: shard, order, and therefore every pack assignment are pure
functions of the DATA (md5 of the id, ties broken by id) — identical
across runs, cluster layouts, and engines.  The DuckDB oracle computes
the same windows from the same hash.

The reference has nothing in this category (SURVEY §2.4); this is part
of the training-pipeline extension surface.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash64(col):
    """Shared 60-bit hash convention: Spark
    ``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
    ``('0x'||substr(md5(x),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 8,
    partition_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Assign each row to a pack: greedy contiguous fill in deterministic
    hash order.  A document belongs to the pack in which it STARTS
    (``pack_id = floor(start / budget)``, ``pack_offset = start %
    budget`` with ``start`` the shard-local cumulative token count before
    the document) — the standard streaming concatenation layout; a
    document longer than ``budget`` simply spans packs.

    Output: id, partition_cols..., n_tokens, shard, pack_id, pack_offset.
    One window shuffle; all expressions JVM-side integer arithmetic.
    """
    parts = [F.col(c) for c in (partition_cols or [])]
    h = _hash64(F.col(id_col))
    df = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(int(n_shards))).cast("int")
    )
    w = (
        Window.partitionBy(*parts, F.col("shard"))
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(tokens_col).cast("bigint")
    cum = F.sum(toks).over(w)
    out_cols = (
        [F.col(id_col)]
        + [F.col(c) for c in (partition_cols or [])]
        + [
            toks.alias("n_tokens"),
            F.col("shard"),
            F.floor((cum - toks) / F.lit(int(budget))).cast("bigint").alias("pack_id"),
            F.pmod(cum - toks, F.lit(int(budget))).cast("bigint").alias("pack_offset"),
        ]
    )
    return df.select(*out_cols)
