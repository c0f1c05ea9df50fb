"""Slowly-changing-dimension maintenance (SCD Type 2).

The standard dimension-history operator of a warehouse load: given the
current SCD2 state of a dimension (rows carry ``valid_from`` /
``valid_to`` / ``is_current``) and a NEW snapshot of the source, emit
the next SCD2 state — changed keys close their current row
(``valid_to`` = the new version, ``is_current`` = false) and open a
fresh one, brand-new keys insert, unchanged keys pass through
untouched.

Scale shape: ONE join between the *current* slice of the dimension and
the snapshot on the natural key — closed history rows never join
(filtered before, unioned back after), and the three output roles of a
joined row (closed / reopened / unchanged) are emitted in a SINGLE
pass via a conditional array + explode, so the join is executed once,
not three times.  Dimensions are the small side of a star schema;
against a delta-sized snapshot Catalyst broadcasts it.  The reference
has no SCD surface (it is an optimizer framework, SURVEY §2.4) — this
is extension surface, design-anchored on the canonical Kimball SCD2
merge.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    version,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    cur_col: str = "is_current",
    close_missing: bool = False,
) -> DataFrame:
    """Next SCD Type 2 state of ``target`` after absorbing ``source``.

    ``target`` columns: ``keys`` + ``tracked`` + ``from_col`` +
    ``to_col`` + ``cur_col``.  ``source`` columns: ``keys`` +
    ``tracked`` (a full snapshot of the dimension source).  ``version``
    stamps the transition: it becomes ``valid_to`` of every row closed
    by this load and ``valid_from`` of every row opened by it (use a
    load date, a batch id — any orderable literal; it is cast to the
    target's existing ``from_col`` type).  ``close_missing=True``
    additionally closes current rows whose key vanished from the
    snapshot (source-deletes); the default keeps them open, the common
    contract when the source extract may be partial.

    Tracked-value comparison is null-safe: NULL → value and value →
    NULL both count as changes, NULL → NULL does not.
    """
    keys = list(keys)
    tracked = list(tracked)
    from_t = target.schema[from_col].dataType
    to_t = target.schema[to_col].dataType
    ver_from = F.lit(version).cast(from_t)
    ver_to = F.lit(version).cast(to_t)
    null_to = F.lit(None).cast(to_t)

    hist = target.filter(~F.col(cur_col))
    cur = target.filter(F.col(cur_col))

    t = cur.select(
        *keys,
        *[F.col(c).alias(f"__t_{c}") for c in tracked],
        F.col(from_col).alias("__t_from"),
        F.lit(True).alias("__in_t"),
    )
    s = source.select(
        *keys,
        *[F.col(c).alias(f"__s_{c}") for c in tracked],
        F.lit(True).alias("__in_s"),
    )
    j = t.join(s, keys, "full_outer")

    in_t = F.col("__in_t").eqNullSafe(F.lit(True))
    in_s = F.col("__in_s").eqNullSafe(F.lit(True))
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(f"__t_{c}").eqNullSafe(F.col(f"__s_{c}"))
    changed = in_t & in_s & changed

    out_cols = keys + tracked + [from_col, to_col, cur_col]

    def _row(side: str, vfrom, vto, is_cur) -> F.Column:
        vals = (
            [F.col(k) for k in keys]
            + [F.col(f"__{side}_{c}") for c in tracked]
            + [vfrom, vto, F.lit(is_cur)]
        )
        return F.struct(*[v.alias(n) for v, n in zip(vals, out_cols)])

    closed_cond = changed | (F.lit(close_missing) & in_t & ~in_s)
    unchanged_cond = in_t & ~closed_cond
    new_cond = in_s & (changed | ~in_t)
    roles = F.array(
        F.when(closed_cond, _row("t", F.col("__t_from"), ver_to, False)),
        F.when(unchanged_cond, _row("t", F.col("__t_from"), null_to, True)),
        F.when(new_cond, _row("s", ver_from, null_to, True)),
    )
    emitted = j.select(
        F.explode(F.filter(roles, lambda x: x.isNotNull())).alias("__r")
    ).select("__r.*")
    return hist.select(*out_cols).unionByName(emitted)
