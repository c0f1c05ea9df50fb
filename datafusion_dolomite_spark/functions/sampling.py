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


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the k rows
    with the smallest priority ``(md5_60(id) + 1) / weight`` — Sequential
    Poisson / priority sampling (Ohlsson '98; Duffield-Lund-Thorup):
    inclusion probability is proportional to weight for the tail, and the
    selected set is a pure function of the data.

    Exactness across engines: the priority uses ONLY correctly-rounded
    IEEE-754 ops (int→double cast, one division) — unlike ``pow``/``ln``
    keys (Efraimidis-Spirakis), which go through libm and can differ in
    the last ulp between the JVM and DuckDB, silently flipping a
    near-tie.  Ties break on id (total order).

    Scale shape: a global top-k (TakeOrdered — per-partition heaps, no
    full sort); rows with weight ≤ 0 are excluded.
    """
    pr = (_hash64(F.col(id_col)) + F.lit(1)).cast("double") / F.col(
        weight_col
    ).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_pr", pr)
        .orderBy(F.col("_pr").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_pr")
    )


def resample_corpus(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights_tenths: dict,
    default_tenths: int = 10,
    copy_col: str = "copy",
) -> DataFrame:
    """EPOCH-WEIGHTED resampling (the mixture-upsampling step of corpus
    prep, per the data-mixture recipes of Pile/LLaMA-style training): a
    stratum weighted ``w`` contributes ⌊w⌋ copies of every document plus
    one extra copy for the hash-selected frac(``w``) share — weight 2.5
    means "2.5 epochs" of that source, 0.3 means a 30% downsample.

    Weights are INTEGER TENTHS (25 = 2.5) and the fractional share is a
    bucket comparison on the shared md5 hash, so the resampled multiset
    is a pure function of the data — identical across runs, clusters,
    and engines.

    100 TB shape: map-only — hash, CASE lookup, sequence+explode; ZERO
    shuffles, streams at scan speed.  Output = input columns + copy
    index (1..n, bigint).
    """
    w = None
    for k, v in sorted(weights_tenths.items()):
        v = int(v)
        w = (
            F.when(F.col(stratum_col) == k, v)
            if w is None
            else w.when(F.col(stratum_col) == k, v)
        )
    w10 = (w.otherwise(int(default_tenths)) if w is not None
           else F.lit(int(default_tenths))).cast("bigint")
    staged = df.withColumn("_w10", w10).withColumn(
        "_b", _hash64(F.col(id_col)) % 10
    ).withColumn(
        "_nc",
        F.expr("_w10 div 10 + if(_b < _w10 % 10, 1, 0)").cast("bigint"),
    )
    # the guard matters: sequence(1, 0) would generate a DESCENDING
    # two-element array, not an empty one; explode drops empty arrays
    return (
        staged.withColumn(
            copy_col,
            F.explode(
                F.expr("if(_nc >= 1, sequence(cast(1 as bigint), _nc), array())")
            ),
        )
        .drop("_w10", "_b", "_nc")
    )
