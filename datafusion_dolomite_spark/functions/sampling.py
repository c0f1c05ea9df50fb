"""Deterministic sampling for training-data pipelines.

``df.sample``/``sampleBy`` depend on partition layout and seed plumbing —
re-running on a different cluster yields a different corpus.  These
samplers derive per-row ranks from md5(id), so the selected set is a pure
function of the DATA: reproducible across runs, clusters, and engines
(the DuckDB oracle computes the identical hash).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash64(col):
    """Shared 60-bit hash convention (see __spark_entry__ docstring):
    Spark ``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
    ``('0x'||substr(md5(x),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def stratified_sample(
    df: DataFrame,
    stratum_cols: Sequence[str],
    id_col: str,
    k: int = 100,
) -> DataFrame:
    """Keep the ``k`` rows with the smallest md5-hash of ``id_col`` per
    stratum (ties broken by id — total order, fully deterministic).

    One window shuffle on the strata; skew is bounded because only k rows
    survive any stratum.  Output columns = input columns.
    """
    w = Window.partitionBy(*[F.col(c) for c in stratum_cols]).orderBy(
        _hash64(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_sample_rn", F.row_number().over(w))
        .filter(F.col("_sample_rn") <= k)
        .drop("_sample_rn")
    )
