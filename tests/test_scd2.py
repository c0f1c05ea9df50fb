"""SCD Type 2 dimension maintenance (functions/scd.py::scd2_apply).

Pins the four row roles (closed / reopened / unchanged / brand-new),
null-safe change detection, multi-load chaining, close_missing, and
the single-join plan shape (history never joins; roles are emitted in
one pass)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_dolomite_spark.functions.scd import scd2_apply

COLS = ["k", "city", "tier", "valid_from", "valid_to", "is_current"]


def _state(spark, rows):
    return spark.createDataFrame(
        rows,
        "k bigint, city string, tier bigint, valid_from bigint, "
        "valid_to bigint, is_current boolean",
    )


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, city string, tier bigint")


@pytest.fixture()
def target(spark):
    return _state(
        spark,
        [
            (1, "oslo", 1, 1, None, True),
            (2, "lima", 2, 1, None, True),
            (2, "cairo", 1, 0, 1, False),  # closed history row
            (3, "pune", 3, 1, None, True),
            (4, None, 1, 1, None, True),  # NULL tracked value
        ],
    )


def _key(r):
    return tuple((x is None, x) for x in r)


def _rows(df):
    return sorted((tuple(r) for r in df.select(*COLS).collect()), key=_key)


def test_scd2_roles(spark, target):
    src = _snap(
        spark,
        [
            (1, "oslo", 1),  # unchanged
            (2, "lima", 9),  # tier changed → close + reopen
            (4, "kiel", 1),  # NULL → value is a change
            (5, "baku", 2),  # brand-new key
            # k=3 missing from snapshot → stays open (default)
        ],
    )
    out = _rows(scd2_apply(target, src, ["k"], ["city", "tier"], 2))
    assert out == sorted(
        [
            (1, "oslo", 1, 1, None, True),
            (2, "cairo", 1, 0, 1, False),  # history passes through
            (2, "lima", 2, 1, 2, False),  # closed at version 2
            (2, "lima", 9, 2, None, True),  # reopened
            (3, "pune", 3, 1, None, True),  # absent → stays open
            (4, None, 1, 1, 2, False),
            (4, "kiel", 1, 2, None, True),
            (5, "baku", 2, 2, None, True),
        ],
        key=_key,
    )


def test_scd2_close_missing(spark, target):
    src = _snap(spark, [(1, "oslo", 1), (2, "lima", 2), (4, None, 1)])
    out = _rows(
        scd2_apply(
            target, src, ["k"], ["city", "tier"], 2, close_missing=True
        )
    )
    # k=3 vanished → closed with NO replacement; others unchanged
    assert (3, "pune", 3, 1, 2, False) in out
    assert not any(r[0] == 3 and r[5] for r in out)
    assert (1, "oslo", 1, 1, None, True) in out
    assert (4, None, 1, 1, None, True) in out  # NULL→NULL: no change


def test_scd2_chained_loads(spark, target):
    s2 = _snap(spark, [(1, "rome", 1)])
    s3 = _snap(spark, [(1, "rome", 7)])
    state = scd2_apply(target, s2, ["k"], ["city", "tier"], 2)
    state = scd2_apply(state, s3, ["k"], ["city", "tier"], 3)
    k1 = sorted((r for r in _rows(state) if r[0] == 1), key=_key)
    assert k1 == [
        (1, "oslo", 1, 1, 2, False),
        (1, "rome", 1, 2, 3, False),
        (1, "rome", 7, 3, None, True),
    ]
    # exactly one current row per live key, full validity chain
    cur = [r for r in _rows(state) if r[5]]
    assert len(cur) == len({r[0] for r in cur})


def test_scd2_single_join_plan(spark, target):
    src = _snap(spark, [(1, "oslo", 1), (9, "baku", 2)])
    out = scd2_apply(target, src, ["k"], ["city", "tier"], 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    joins = len(re.findall(r"Join ", plan))
    assert joins == 1, f"expected exactly 1 join, plan:\n{plan}"
