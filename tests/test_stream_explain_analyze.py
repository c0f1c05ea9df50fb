"""EXPLAIN ANALYZE for streaming queries (r10, VERDICT item 8):
``explain_analyze_stream`` wraps any pipeline function and returns a
per-(micro-batch, state-operator) metrics table — batch input rows,
trigger duration, state rows, state rows updated, and the per-batch
state-store COMMIT time (the number the r9 stream-join regression had
to be dug out of an ad-hoc recentProgress session).  A state-store
regression now shows up as a table read, not a profiling exercise."""

from __future__ import annotations

import os

from datafusion_dolomite_spark.streaming.pipeline import (
    explain_analyze_stream,
    stateful_user_totals,
    windowed_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

EXPECTED_COLS = [
    "batch_id",
    "operator",
    "input_rows",
    "batch_ms",
    "state_rows",
    "state_rows_updated",
    "commit_ms",
]


def test_metrics_shape_for_stateful_query(spark):
    result, metrics = explain_analyze_stream(
        spark, stateful_user_totals, SF_DIR
    )
    # the query's own result still comes back intact
    assert result.count() > 0
    assert metrics.columns == EXPECTED_COLS
    rows = metrics.collect()
    assert rows, "AvailableNow replay must emit at least one batch"
    stateful = [r for r in rows if r["operator"] is not None]
    assert stateful, "a stateful query must report state operators"
    for r in stateful:
        # the columns that make a commit-tax regression readable
        assert r["batch_id"] is not None
        assert r["state_rows"] is not None and r["state_rows"] >= 0
        assert r["commit_ms"] is not None and r["commit_ms"] >= 0
    # the custom Python state operator reports its real state size:
    # every distinct user lands one state row by the final batch
    assert max(r["state_rows"] for r in stateful) > 0


def test_metrics_reset_between_runs(spark):
    """A second wrapped run reports ITS batches only — the capture
    buffer resets per explain_analyze_stream call."""
    _res1, m1 = explain_analyze_stream(
        spark, windowed_event_counts, SF_DIR
    )
    _res2, m2 = explain_analyze_stream(
        spark, windowed_event_counts, SF_DIR
    )
    b1 = sorted(r["batch_id"] for r in m1.collect())
    b2 = sorted(r["batch_id"] for r in m2.collect())
    assert b1 and b2
    # same bounded replay → same batch structure, not accumulated
    assert len(b2) == len(b1)
