"""Skew mitigation: salted two-stage aggregation.

When one group key holds a disproportionate share of rows (the classic
power-law user/url/token), a plain ``groupBy(key)`` sends the whole hot
key to ONE reducer — at 100 TB that single task runs for hours while the
rest of the cluster idles.  Salting splits each key into ``n_salts``
sub-keys for a partial aggregate, then combines the partials in a second
(tiny) aggregate.  Works for decomposable aggregates (count/sum/min/max).

Join-side skew is handled by AQE (``skewJoin.enabled``, session.py);
this helper covers aggregation skew, which AQE does not re-balance.
"""

from __future__ import annotations

from typing import Sequence

__all__ = [
    "salted_aggregate",
    "salted_broadcast_replicate_join",
    "range_partition_bounds",
]

_MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def salted_aggregate(
    df,
    keys: Sequence[str],
    aggs: Sequence[tuple],  # (func, col, alias), func ∈ count/sum/min/max
    n_salts: int = 32,
):
    """Two-stage skew-proof aggregate.

    ``aggs``: e.g. ``[("count", "*", "n"), ("sum", "value", "total")]``.
    Stage 1 groups by (keys + salt) — the hot key fans out over
    ``n_salts`` reducers; stage 2 merges partials by the true keys.
    """
    from pyspark.sql import functions as F

    for func, _c, _a in aggs:
        if func not in _MERGE:
            raise ValueError(
                f"{func} is not decomposable; salted_aggregate supports {sorted(_MERGE)}"
            )

    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial_aggs = []
    for func, c, alias in aggs:
        colexpr = F.lit(1) if c == "*" else F.col(c)
        partial_aggs.append(getattr(F, "count" if func == "count" else func)(colexpr).alias(f"_p_{alias}"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)

    final_aggs = [
        getattr(F, _MERGE[func])(F.col(f"_p_{alias}")).alias(alias)
        for func, _c, alias in aggs
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_replicate_join(
    left,
    right,
    left_key: str,
    right_key: str,
    salt_src: str,
    n_salts: int = 16,
):
    """Skew-proof equi-join: replicate the (small) RIGHT side across
    ``n_salts`` sub-keys and spread each hot left key over ``n_salts``
    reducers via a deterministic salt (``salt_src % n_salts``).  The
    standard remedy when one probe-side key dominates and the build side
    is too big to broadcast outright but small enough to replicate
    n_salts times.  Returns left ⋈ right with all columns of both sides.
    """
    from pyspark.sql import functions as F

    salted_left = left.withColumn(
        "__salt", (F.col(salt_src) % F.lit(n_salts)).cast("int")
    )
    replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(
        replicated,
        on=[salted_left[left_key] == replicated[right_key],
            salted_left["__salt"] == replicated["__salt"]],
        how="inner",
    )
    return out.drop("__salt")


def range_partition_bounds(
    df,
    value_col: str,
    id_col: str,
    nbounds: int = 16,
    bucket_expr: str | None = None,
):
    """EXACT equi-depth range-partition boundaries — what
    ``repartitionByRange`` needs, computed exactly instead of by
    sampling: boundary q (1..nbounds) is the value whose GLOBAL rank is
    ⌈q·N/nbounds⌉ under the total order (value, id).

    The global rank comes from the classic distributed order-statistics
    plan, never a single-node sort: rows land in ordered coarse buckets
    (``bucket_expr``, default ``value div 1e6`` — any monotone bucketing
    works), per-bucket counts (tiny) get a running-sum offset, and each
    row's rank is its bucket offset + its LOCAL row_number within the
    bucket.  One bucket-keyed window shuffle over the data; everything
    else is broadcast-sized.  A production planner would pick
    ``bucket_expr`` from a sample to equalize bucket populations.

    Returns (q bigint, boundary bigint) — ``value_col`` must already be
    integer-exact (e.g. cents).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    be = bucket_expr or f"{value_col} div 1000000"
    v = df.select(
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
        F.expr(be).alias("_bkt"),
    )
    counts = v.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    # running-sum offsets over the (tiny) bucket table — the single
    # unpartitioned window runs over #buckets rows, not the data
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_bkt").orderBy(
        F.col("_v").asc(), F.col("_id").asc()
    )
    ranked = (
        v.join(F.broadcast(offsets), "_bkt")
        .withColumn("_rnk", F.row_number().over(w_local) + F.col("_off"))
    )
    n = v.agg(F.count(F.lit(1)).alias("_n"))
    targets = (
        df.sparkSession.range(1, nbounds + 1)
        .select(F.col("id").alias("q"))
        .crossJoin(F.broadcast(n))
        .select(
            "q", F.expr(f"(q * _n + {nbounds - 1}) div {nbounds}").alias("_t")
        )
    )
    return (
        ranked.join(F.broadcast(targets), ranked._rnk == targets._t)
        .select(F.col("q").cast("bigint"), F.col("_v").alias("boundary"))
    )
