"""Interval-OVERLAP join: both sides are intervals, match when they
overlap — the temporal-join shape the point-in-interval range join
(``execute.py`` LogicalRangeJoin) does not cover.

Scale strategy (the standard bucketed decomposition): every interval
explodes to the fixed-width buckets it covers (map-side), candidates
meet in an EQUI-join on the bucket — never an inequality cross join —
and the residual overlap predicate filters exactly.  Multi-bucket
double-counting is eliminated with the FIRST-SHARED-BUCKET rule: a pair
is kept only in the bucket containing max(s1, s2); every overlapping
pair has that point inside both intervals, so each pair survives
exactly once, with zero post-hoc distinct.

Reference: no interval surface exists there (SURVEY §2.4); this extends
the as-of/range join family.
"""

from __future__ import annotations

__all__ = ["interval_overlap_join"]


def interval_overlap_join(left, right, s_col: str, e_col: str, width: int):
    """Join two interval tables on overlap (``s1 <= e2 AND s2 <= e1``,
    inclusive integer endpoints, e.g. epoch days).

    Returns all left columns suffixed ``_1`` and right columns suffixed
    ``_2``.  ``width`` is the bucket width in the endpoints' units —
    pick it near the typical interval length so intervals explode to
    O(1) buckets each.
    """
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    def prep(df, suffix):
        renamed = df.select(
            [F.col(c).alias(f"{c}{suffix}") for c in df.columns]
        )
        s, e = f"{s_col}{suffix}", f"{e_col}{suffix}"
        return renamed.withColumn(
            "_bkt", F.explode(F.expr(f"sequence({s} div {width}, {e} div {width})"))
        )

    lb = prep(ensure_min_parallelism(left), "_1")
    rb = prep(right, "_2")
    s1, e1 = f"{s_col}_1", f"{e_col}_1"
    s2, e2 = f"{s_col}_2", f"{e_col}_2"
    joined = lb.join(rb, "_bkt").filter(
        F.expr(
            f"{s1} <= {e2} AND {s2} <= {e1} "
            # first-shared-bucket: count each overlapping pair ONCE
            f"AND _bkt = greatest({s1} div {width}, {s2} div {width})"
        )
    )
    return joined.drop("_bkt")
