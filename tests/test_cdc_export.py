"""Incremental CDC export (r8): export_table_changes drains a
versioned table's row-level change feed into an append-only log table,
exactly-once WITHOUT a checkpoint file — the log's own op tags
(``cdc <src> v<a>->v<b>``) are the consumption record and the
version-log persist is the atomic commit."""

from __future__ import annotations

import os

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog
from datafusion_dolomite_spark.streaming.pipeline import export_table_changes


@pytest.fixture()
def qp(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t0"))
    cat.register("t", str(tmp_path / "t0"))
    return QueryPlanner(spark, cat)


def _log_rows(qp):
    return sorted(
        (r["_version"], r["_change_type"], r["k"], r["v"])
        for r in qp.sql("select * from t_log").collect()
    )


def test_export_then_resume_only_new(qp):
    qp.sql("delete from t where k < 3").count()  # v1
    qp.sql("update t set v = v + 1 where k = 10").count()  # v2
    assert export_table_changes(qp, "t", "t_log") == 2
    assert _log_rows(qp) == [
        (1, "delete", 0, 0),
        (1, "delete", 1, 10),
        (1, "delete", 2, 20),
        (2, "delete", 10, 100),
        (2, "insert", 10, 101),
    ]
    # nothing new → nothing exported, log unchanged
    assert export_table_changes(qp, "t", "t_log") == 0
    assert len(_log_rows(qp)) == 5
    # a further source version exports exactly its delta
    qp.sql("insert into t values (99, 990)").count()  # v3
    assert export_table_changes(qp, "t", "t_log") == 1
    assert (3, "insert", 99, 990) in _log_rows(qp)


def test_export_crash_replay_no_duplicates(qp):
    """Kill the exporter after the FIRST transition's append commits;
    the re-run must resume at the second transition — no duplicate log
    rows, no missed transition."""
    qp.sql("delete from t where k < 3").count()  # v1
    qp.sql("delete from t where k >= 18").count()  # v2

    class Boom(RuntimeError):
        pass

    def fault(v):
        raise Boom()

    with pytest.raises(Boom):
        export_table_changes(qp, "t", "t_log", _fault=fault)
    assert {r[0] for r in _log_rows(qp)} == {1}
    assert export_table_changes(qp, "t", "t_log") == 1  # only v2
    rows = _log_rows(qp)
    assert len(rows) == len(set(rows)) == 5  # 3 deletes + 2 deletes
    assert {r[0] for r in rows} == {1, 2}


def test_export_covers_dv_versions(qp):
    """Merge-on-read transitions (DV sidecar, zero rewritten files)
    export the same change rows a copy-on-write delete would."""
    qp.sql(
        "alter table t set tblproperties ('delete_mode'='merge-on-read')"
    ).count()
    qp.sql("delete from t where k % 7 = 0").count()  # v1 via DV
    assert export_table_changes(qp, "t", "t_log") == 1
    assert _log_rows(qp) == [
        (1, "delete", 0, 0),
        (1, "delete", 7, 70),
        (1, "delete", 14, 140),
    ]


def test_export_survives_new_planner(qp, spark):
    qp.sql("delete from t where k < 2").count()
    export_table_changes(qp, "t", "t_log")
    # a NEW planner (fresh session state) resumes from the persisted
    # version logs of BOTH tables
    cat2 = Catalog(warehouse=qp.catalog.warehouse_root())
    cat2.register("t", qp._table_history["t"][0])
    cat2.register("t_log", qp._table_history["t_log"][0])
    qp2 = QueryPlanner(spark, cat2)
    assert export_table_changes(qp2, "t", "t_log") == 0
    qp2.sql("insert into t values (50, 500)").count()
    assert export_table_changes(qp2, "t", "t_log") == 1
    assert (2, "insert", 50, 500) in sorted(
        (r["_version"], r["_change_type"], r["k"], r["v"])
        for r in qp2.sql("select * from t_log").collect()
    )
