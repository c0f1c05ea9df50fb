"""Embedding map-ops: L2-normalize → matryoshka prefix truncation →
int8 quantization (the standard compress-the-index pipeline: 4 B float →
1 B int per dim).

TWO implementations of the identical arithmetic, cost-raced by the
optimizer (``LogicalEmbedQuantize`` → SQL vs pandas, VERDICT r6 item 6):

* ``embed_quantize_sql``    — higher-order-function lambdas.  Map-only
  JVM expressions, no Python — but Spark evaluates HOF lambdas
  INTERPRETED per array element, and this pipeline folds the vector
  several times per row, so the constant factor is high.
* ``embed_quantize_pandas`` — Arrow-batched ``mapInPandas``: one numpy
  pass per batch does the norm/truncate/quantize vectorized across
  rows.  Pays the JVM→Arrow→Python transfer once; wins when
  rows × dim is large (the ``PhysicalKnnPandas`` pattern).

BIT-EXACT equivalence (so both share one DuckDB oracle): the SQL norm is
a SEQUENTIAL left-to-right fold ``a + x*x`` in float64; the numpy path
reproduces that exact order by accumulating dimension-by-dimension
(vectorized across ROWS, sequential across DIMS) — every intermediate is
the same IEEE double either way.  Division, floor, clamp and the final
int cast are single IEEE ops with identical semantics in both engines.

Reference: wholly absent there (embedding ops are north-star extension
surface, SURVEY §2.4).
"""

from __future__ import annotations

__all__ = ["embed_quantize_sql", "embed_quantize_pandas"]


def _exprs(vec_col: str, prefix_dim: int):
    dv = f"transform({vec_col}, x -> cast(x as double))"
    norm = f"sqrt(aggregate({dv}, cast(0.0 as double), (a, x) -> a + x * x))"
    unit = f"slice(transform({dv}, x -> x / {norm}), 1, {prefix_dim})"
    quant = (
        f"transform({unit}, x -> "
        f"cast(greatest(-127.0D, least(127.0D, floor(x * 127.0D))) as int))"
    )
    return norm, quant


def embed_quantize_sql(df, id_col: str, vec_col: str, prefix_dim: int = 16):
    """→ (id_col, norm_1e6 bigint, q{prefix_dim} string)."""
    from pyspark.sql import functions as F

    norm, quant = _exprs(vec_col, prefix_dim)
    return df.select(
        F.col(id_col),
        F.expr(f"cast(floor({norm} * 1000000) as bigint)").alias("norm_1e6"),
        F.expr(
            f"array_join(transform({quant}, x -> cast(x as string)), ',')"
        ).alias(f"q{prefix_dim}"),
    )


def embed_quantize_pandas(df, id_col: str, vec_col: str, prefix_dim: int = 16):
    """Same output, Arrow/numpy path (see module docstring for the
    bit-exactness argument)."""
    import numpy as np
    import pandas as pd

    qcol = f"q{prefix_dim}"
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, norm_1e6 bigint, {qcol} string"
    pruned = df.select(id_col, vec_col)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # sequential fold over dims (vectorized over rows) — the
            # exact order of the SQL aggregate() lambda
            acc = np.zeros(len(m), dtype=np.float64)
            for j in range(m.shape[1]):
                acc = acc + m[:, j] * m[:, j]
            norm = np.sqrt(acc)
            unit = m[:, :prefix_dim] / norm[:, None]
            q = np.clip(np.floor(unit * 127.0), -127.0, 127.0).astype(
                np.int64
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "norm_1e6": np.floor(norm * 1e6).astype(np.int64),
                    qcol: [
                        ",".join(str(int(x)) for x in row) for row in q
                    ],
                }
            )

    return pruned.mapInPandas(run, schema=out_schema)
