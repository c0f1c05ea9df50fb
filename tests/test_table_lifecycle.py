"""Delta-style table lifecycle beyond DML (r8 continuation): RESTORE
TABLE ... TO VERSION AS OF (zero-copy rollback as a new version),
CREATE TABLE ... SHALLOW CLONE (zero-copy table copy with an
independent lineage), SELECT * FROM table_changes(t, v1, v2) (row-level
change feed computed ONLY from the files that differ between the two
version manifests), and CHECK constraints enforced O(delta) at DML
time.

Zero-copy pins use inodes (a carried/linked file shares st_ino with its
original); the change feed's never-reads-shared-files pin uses
DataFrame.inputFiles()."""

from __future__ import annotations

import os

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources import dml
from datafusion_dolomite_spark.sources.catalog import Catalog


def _inodes(path):
    return {os.stat(f).st_ino for f in dml.data_files(path)}


@pytest.fixture()
def qp(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t0"))
    cat.register("t", str(tmp_path / "t0"))
    return QueryPlanner(spark, cat)


# ---------------------------------------------------------------- RESTORE


def test_restore_rolls_back_as_new_version(qp, spark):
    qp.sql("insert into t values (100, 1000)").count()      # v1: 11 rows
    qp.sql("delete from t where k >= 5").count()            # v2: 5 rows
    v1_inodes = _inodes(qp._table_history["t"][1])
    out = qp.sql("restore table t to version as of 1").collect()[0]
    assert out["restored_version"] == 1 and out["new_version"] == 3
    # contents are exactly v1's
    assert qp.sql("select * from t").count() == 11
    assert {r["k"] for r in qp.sql("select * from t").collect()} == (
        set(range(10)) | {100}
    )
    # zero-copy: every file of the new head is a hardlink of a v1 file
    assert _inodes(qp.catalog.path("t")) == v1_inodes
    # history keeps the in-between version (restore is additive)
    assert qp.sql("select * from t version as of 2").count() == 5
    ops = {
        r["version"]: r["operation"]
        for r in qp.sql("describe history t").collect()
    }
    assert ops[3] == "restore v1"


def test_restore_bad_version_raises(qp):
    qp.sql("delete from t where k = 0").count()
    with pytest.raises(ValueError, match="versions 0..1"):
        qp.sql("restore table t to version as of 5")
    with pytest.raises(ValueError, match="no version history"):
        qp.sql("restore table fresh to version as of 0")


# ----------------------------------------------------------- SHALLOW CLONE


def test_shallow_clone_is_zero_copy_and_independent(qp, spark):
    src_inodes = _inodes(qp.catalog.path("t"))
    qp.sql("create table t2 shallow clone t").count()
    # zero-copy: the clone's files ARE the source's files (hardlinks)
    assert _inodes(qp.catalog.path("t2")) == src_inodes
    assert qp.sql("select * from t2").count() == 10
    # divergence: DML on the clone never touches the source...
    qp.sql("delete from t2 where k >= 5").count()
    assert qp.sql("select * from t2").count() == 5
    assert qp.sql("select * from t").count() == 10
    # ...and DML on the source never touches the clone
    qp.sql("insert into t values (50, 500)").count()
    assert qp.sql("select * from t").count() == 11
    assert qp.sql("select * from t2").count() == 5
    # each side has its own lineage
    assert qp.sql("select * from t2 version as of 0").count() == 10
    assert qp.sql("select * from t version as of 0").count() == 10


def test_shallow_clone_of_a_version(qp):
    qp.sql("delete from t where k >= 5").count()  # v1: 5 rows
    qp.sql("create table t2 shallow clone t version as of 0").count()
    assert qp.sql("select * from t2").count() == 10
    assert qp.sql("select * from t").count() == 5


def test_clone_survives_vacuum_of_source(qp, spark):
    """Hardlink refcounts: VACUUM on the source frees only bytes no
    live NAME references — the clone keeps reading its files."""
    qp.sql("update t set v = v + 1 where k < 3").count()  # v1
    qp.sql("create table t2 shallow clone t").count()
    rows_before = {
        (r["k"], r["v"]) for r in qp.sql("select * from t2").collect()
    }
    qp.sql("insert into t values (77, 770)").count()  # v2
    qp.sql("vacuum t").count()
    assert {
        (r["k"], r["v"]) for r in qp.sql("select * from t2").collect()
    } == rows_before


# ----------------------------------------------------------- TABLE_CHANGES


@pytest.fixture()
def clustered(spark, tmp_path):
    """100 rows in 4 disjoint-band files — the layout where DML carries
    most files forward, so the change feed's file diff has real shared
    files to skip."""
    path = str(tmp_path / "clustered")
    for b in range(4):
        spark.createDataFrame(
            [(i, i * 2) for i in range(b * 25, b * 25 + 25)],
            "k bigint, v bigint",
        ).coalesce(1).write.mode("append").parquet(path)
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    cat.register("c", path)
    return QueryPlanner(spark, cat), path


def test_changes_insert_only(clustered):
    qp, _ = clustered
    qp.sql("insert into c values (1000, 1), (1001, 2)").count()
    ch = qp.sql("select * from table_changes(c, 0, 1)")
    rows = ch.collect()
    assert {(r["k"], r["_change_type"]) for r in rows} == {
        (1000, "insert"),
        (1001, "insert"),
    }


def test_changes_never_reads_shared_files(clustered):
    """The scale pin: a carried-forward file is the SAME file (inode) in
    both manifests, so the feed reads ONLY version-unique files —
    inputFiles() of the change-feed plan must not contain any shared
    file."""
    qp, _ = clustered
    qp.sql("delete from c where k >= 90").count()  # rewrites 1 of 4 files
    hist = qp._table_history["c"]
    shared = {
        os.path.realpath(f)
        for f in dml.data_files(hist[0])
        if os.stat(f).st_ino in _inodes(hist[1])
    }
    assert shared, "clustered DELETE should carry files forward"
    ch = qp.sql("select * from table_changes(c, 0, 1)")
    read = {os.path.realpath(f.replace("file:", "")) for f in ch.inputFiles()}
    assert not (read & shared), "change feed scanned a carried file"
    assert {r["k"] for r in ch.collect()} == set(range(90, 100))
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}


def test_changes_update_is_delete_insert_pair(clustered):
    qp, _ = clustered
    qp.sql("update c set v = -1 where k = 10").count()
    rows = qp.sql("select * from table_changes(c, 0, 1)").collect()
    assert {(r["k"], r["v"], r["_change_type"]) for r in rows} == {
        (10, 20, "delete"),
        (10, -1, "insert"),
    }


def test_changes_composite_range(clustered):
    """v0 → v2 composes: rows deleted then never re-added show one
    'delete'; rows inserted in either step show 'insert'; rows whose
    net effect is nothing (carried throughout) never appear."""
    qp, _ = clustered
    qp.sql("delete from c where k >= 95").count()             # v1
    qp.sql("insert into c values (200, 7)").count()           # v2
    rows = qp.sql("select * from table_changes(c, 0, 2)").collect()
    got = {(r["k"], r["_change_type"]) for r in rows}
    assert got == {(k, "delete") for k in range(95, 100)} | {(200, "insert")}


def test_changes_bad_range(clustered):
    qp, _ = clustered
    qp.sql("delete from c where k = 0").count()
    with pytest.raises(ValueError, match="need"):
        qp.sql("select * from table_changes(c, 1, 0)")
    with pytest.raises(ValueError, match="need"):
        qp.sql("select * from table_changes(c, 0, 9)")


# ------------------------------------------------------- CHECK constraints


def test_constraint_rejects_violating_insert_atomically(qp):
    qp.sql("alter table t add constraint k_pos check (k >= 0)").count()
    versions_before = len(qp._table_history.get("t", [1]))
    with pytest.raises(ValueError, match="k_pos"):
        qp.sql("insert into t values (-1, 0)")
    # atomic reject: no version written, contents untouched
    assert len(qp._table_history.get("t", [1])) == versions_before
    assert qp.sql("select * from t").count() == 10
    # a valid insert still lands
    qp.sql("insert into t values (99, 990)").count()
    assert qp.sql("select * from t").count() == 11


def test_constraint_validates_existing_rows_on_add(qp):
    with pytest.raises(ValueError, match="existing rows violate"):
        qp.sql("alter table t add constraint k_big check (k >= 5)")
    assert "k_big" not in qp._table_constraints.get("t", {})


def test_constraint_enforced_on_update_not_delete(qp):
    qp.sql("alter table t add constraint v_pos check (v >= 0)").count()
    with pytest.raises(ValueError, match="v_pos"):
        qp.sql("update t set v = -5 where k = 3")
    # DELETE can never violate a CHECK
    qp.sql("delete from t where k = 3").count()
    assert qp.sql("select * from t").count() == 9


def test_constraint_null_passes(qp):
    """SQL semantics: a CHECK is violated only when FALSE; NULL passes
    (the standard three-valued rule)."""
    qp.sql("alter table t add constraint v_pos check (v >= 0)").count()
    qp.sql(
        "insert into t select cast(55 as bigint) as k, "
        "cast(null as bigint) as v"
    ).count()
    assert qp.sql("select * from t").count() == 11


def test_show_and_drop_constraint(qp):
    qp.sql("alter table t add constraint k_pos check (k >= 0)").count()
    rows = qp.sql("show constraints t").collect()
    assert [(r["constraint_name"], r["check_expr"]) for r in rows] == [
        ("k_pos", "k >= 0")
    ]
    qp.sql("alter table t drop constraint k_pos").count()
    assert qp.sql("show constraints t").count() == 0
    qp.sql("insert into t values (-1, 0)").count()  # no longer enforced
    assert qp.sql("select * from t").count() == 11


def test_constraint_survives_new_session(spark, tmp_path):
    """Constraints ride the persisted version log: a NEW planner over
    the same warehouse re-loads and keeps enforcing them."""
    wh = str(tmp_path / "wh")
    base = str(tmp_path / "t0")
    spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(base)
    cat1 = Catalog(warehouse=wh)
    cat1.register("t", base)
    qp1 = QueryPlanner(spark, cat1)
    qp1.sql("delete from t where k = 9").count()  # lineage exists
    qp1.sql("alter table t add constraint k_pos check (k >= 0)").count()

    cat2 = Catalog(warehouse=wh)
    cat2.register("t", base)
    qp2 = QueryPlanner(spark, cat2)
    assert qp2._table_constraints.get("t") == {"k_pos": "k >= 0"}
    with pytest.raises(ValueError, match="k_pos"):
        qp2.sql("insert into t values (-1, 0)")


def test_constraint_copied_into_clone(qp):
    qp.sql("delete from t where k = 9").count()
    qp.sql("alter table t add constraint k_pos check (k >= 0)").count()
    qp.sql("create table t2 shallow clone t").count()
    with pytest.raises(ValueError, match="k_pos"):
        qp.sql("insert into t2 values (-1, 0)")
    qp.sql("alter table t2 drop constraint k_pos").count()
    qp.sql("insert into t2 values (-1, 0)").count()  # clone diverged
    with pytest.raises(ValueError, match="k_pos"):
        qp.sql("insert into t values (-1, 0)")  # source still enforced


def test_constraint_enforced_on_merge(qp, spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame([(3, -99)], "k bigint, v bigint").write.parquet(src)
    qp.catalog.register("chg", src)
    qp.sql("alter table t add constraint v_pos check (v >= 0)").count()
    with pytest.raises(ValueError, match="v_pos"):
        qp.sql(
            "merge into t as tt using chg as s on tt.k = s.k "
            "when matched then update set v = s.v "
            "when not matched then insert *"
        )
