"""Sliding-window document chunking — pure JVM expression pipeline.

split → sequence → transform → posexplode: whole-stage codegen end to
end, no Python, no shuffle.  At 100 TB this is a map-only pass whose
output co-partitions with its input (chunks of a doc never leave the
doc's partition), so a downstream per-doc aggregation or embedding UDF
adds no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per sliding window of ``chunk_size`` whitespace tokens,
    advancing ``chunk_size - overlap`` tokens per step.

    Chunk count for an ``n``-token doc is ``ceil((n - overlap) / stride)``
    (≥1 for any non-empty doc): every token belongs to some chunk, and the
    last chunk may be short.  Empty/whitespace-only docs emit no rows.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    n_chunks = F.when(
        n <= 0, F.lit(0)
    ).otherwise(
        F.greatest(F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"))
    )
    starts = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, chunk_size), " "
        ),
    )
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
