"""Merge-on-read DML via deletion vectors (r8): with
``delete_mode='merge-on-read'`` (ALTER TABLE SET TBLPROPERTIES), a
DELETE marks matched rows' physical identities (file basename, parquet
row index) in a ``_dv`` parquet sidecar and rewrites ZERO data files —
the shape that survives a scattered DELETE touching a few rows in
every file of a 100 TB table, where file-pruned copy-on-write
degenerates to a full rewrite.  UPDATE = DV-mark old rows + append new
files.  Scans apply the DV as a broadcast anti-join
(execute.apply_dv); OPTIMIZE TABLE materializes the deletes and drops
the sidecar.

Zero-rewrite pins use inodes (every data file of the new version must
share st_ino with a base file)."""

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
    # 4 files so "scattered delete touches every file" is real
    spark.createDataFrame(
        [(i, i % 7, i * 10) for i in range(200)],
        "k bigint, g bigint, v bigint",
    ).repartition(4).write.parquet(str(tmp_path / "t0"))
    cat.register("t", str(tmp_path / "t0"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "alter table t set tblproperties ('delete_mode'='merge-on-read')"
    ).count()
    return qp


def test_dv_delete_rewrites_no_data_file(qp):
    base = _inodes(qp.catalog.path("t"))
    assert len(dml.data_files(qp.catalog.path("t"))) == 4
    # scattered: g spreads over all 4 files — CoW would rewrite all 4
    qp.sql("delete from t where g = 3").count()
    head = qp.catalog.path("t")
    assert dml.has_dv(head)
    # ZERO data files rewritten: every file is a hardlink of a base file
    assert _inodes(head) == base
    got = {r["k"] for r in qp.sql("select k from t").collect()}
    assert got == {i for i in range(200) if i % 7 != 3}


def test_dv_deletes_stack_across_statements(qp):
    qp.sql("delete from t where g = 3").count()
    qp.sql("delete from t where k < 10").count()
    got = {r["k"] for r in qp.sql("select k from t").collect()}
    assert got == {i for i in range(200) if i % 7 != 3 and i >= 10}
    # still zero rewrites across both statements
    assert len(_inodes(qp.catalog.path("t"))) == 4


def test_dv_update_marks_old_appends_new(qp):
    base = _inodes(qp.catalog.path("t"))
    qp.sql("update t set v = v + 1 where k < 20").count()
    head = qp.catalog.path("t")
    assert dml.has_dv(head)
    # old files all carried; new files appended for the updated slice
    assert base <= _inodes(head)
    rows = {r["k"]: r["v"] for r in qp.sql("select k, v from t").collect()}
    assert len(rows) == 200
    assert all(rows[k] == k * 10 + (1 if k < 20 else 0) for k in rows)


def test_dv_time_travel_and_restore_exact(qp):
    qp.sql("delete from t where g = 3").count()          # v1
    qp.sql("delete from t where k >= 150").count()       # v2
    assert qp.sql("select * from t version as of 1").count() == sum(
        1 for i in range(200) if i % 7 != 3
    )
    assert qp.sql("select * from t version as of 0").count() == 200
    qp.sql("restore table t to version as of 1").count()
    got = {r["k"] for r in qp.sql("select k from t").collect()}
    assert got == {i for i in range(200) if i % 7 != 3}


def test_optimize_compacts_dv_away(qp):
    qp.sql("delete from t where g = 3").count()
    qp.sql("optimize table t").count()
    head = qp.catalog.path("t")
    assert not dml.has_dv(head)
    assert qp.sql("select * from t").count() == sum(
        1 for i in range(200) if i % 7 != 3
    )
    # post-compaction DELETE starts a fresh (small) DV
    qp.sql("delete from t where k = 11").count()
    assert qp.sql("select * from t").count() == sum(
        1 for i in range(200) if i % 7 != 3
    ) - 1


def test_table_changes_across_dv_versions(qp):
    qp.sql("delete from t where g = 3").count()          # v1: DV only
    ch = qp.sql("select * from table_changes(t, 0, 1)").collect()
    assert {r["_change_type"] for r in ch} == {"delete"}
    assert {r["k"] for r in ch} == {i for i in range(200) if i % 7 == 3}
    # across an UPDATE version: delete+insert pairs for the slice
    qp.sql("update t set v = 0 where k < 5").count()     # v2
    ch2 = qp.sql("select * from table_changes(t, 1, 2)").collect()
    by = {}
    for r in ch2:
        by.setdefault(r["_change_type"], set()).add(r["k"])
    # k=0's old v was already 0 — a no-op update is NOT a change (the
    # feed is value-based, exceptAll cancels identical rows)
    want = {i for i in range(1, 5) if i % 7 != 3}
    assert by == {"delete": want, "insert": want}


def test_dv_interop_cow_and_merge(qp, spark):
    """Turning the property OFF after DV deletes must not resurrect
    rows: the CoW rewrite (and MERGE) read through the DV."""
    qp.sql("delete from t where g = 3").count()
    qp.sql(
        "alter table t set tblproperties ('delete_mode'='copy-on-write')"
    ).count()
    qp.sql("delete from t where k >= 100").count()       # CoW rewrite
    got = {r["k"] for r in qp.sql("select k from t").collect()}
    assert got == {i for i in range(100) if i % 7 != 3}


def test_dv_clone_carries_sidecar(qp):
    qp.sql("delete from t where g = 3").count()
    qp.sql("create table t2 shallow clone t").count()
    assert dml.has_dv(qp.catalog.path("t2"))
    assert qp.sql("select * from t2").count() == sum(
        1 for i in range(200) if i % 7 != 3
    )
    # clone inherited the property: its DELETE is merge-on-read too
    # (k < 20 keeps the merged DV under dv_max_fraction — a bigger
    # delete would legitimately auto-materialize, rewriting files)
    base2 = _inodes(qp.catalog.path("t2"))
    qp.sql("delete from t2 where k < 20").count()
    assert _inodes(qp.catalog.path("t2")) == base2


def test_dv_persists_across_planners(qp, spark):
    qp.sql("delete from t where g = 3").count()
    # fresh planner over a re-registered base path: version log replays
    cat2 = Catalog(warehouse=qp.catalog.warehouse_root())
    cat2.register("t", qp._table_history["t"][0])
    qp2 = QueryPlanner(spark, cat2)
    assert qp2.sql("select * from t").count() == sum(
        1 for i in range(200) if i % 7 != 3
    )
    assert qp2._dv_mode("t")  # property replayed from the log
    rows = qp2.sql("show tblproperties t").collect()
    assert {(r["key"], r["value"]) for r in rows} == {
        ("delete_mode", "merge-on-read")
    }


def test_dv_auto_materializes_past_fraction(qp):
    """The self-bound: one DELETE marking >25% of physical rows folds
    the DV into data files immediately — apply_dv's broadcast anti-join
    can never carry more than dv_max_fraction of the table."""
    base = _inodes(qp.catalog.path("t"))
    qp.sql("delete from t where k < 60").count()  # 60/200 = 30%
    head = qp.catalog.path("t")
    assert not dml.has_dv(head)
    # folded, not carried: survivors were rewritten into fresh files
    assert _inodes(head).isdisjoint(base)
    got = {r["k"] for r in qp.sql("select k from t").collect()}
    assert got == set(range(60, 200))
    # prior versions untouched by the in-place fold (hardlink NAMES
    # dropped, bytes and old sidecars intact)
    assert qp.sql("select * from t version as of 0").count() == 200


def test_dv_accumulation_crosses_threshold(qp):
    """Small deletes stay merge-on-read; the one that pushes the MERGED
    DV over the fraction triggers the fold — and time travel to the
    still-MoR middle version applies that version's own sidecar."""
    qp.sql("delete from t where k < 40").count()  # 20% — stays MoR
    assert dml.has_dv(qp.catalog.path("t"))
    qp.sql("delete from t where k >= 180").count()  # merged 60 = 30%
    head = qp.catalog.path("t")
    assert not dml.has_dv(head)
    got = {r["k"] for r in qp.sql("select k from t").collect()}
    assert got == set(range(40, 180))
    assert qp.sql("select * from t version as of 1").count() == 160


def test_dv_fraction_tunable_both_ways(qp):
    """dv_max_fraction is a per-table knob: raised, a 60% DV stays
    merge-on-read; lowered, the next statement folds it."""
    qp.sql(
        "alter table t set tblproperties ('dv_max_fraction'='0.9')"
    ).count()
    qp.sql("delete from t where k < 120").count()  # 60% marked
    assert dml.has_dv(qp.catalog.path("t"))
    qp.sql(
        "alter table t set tblproperties ('dv_max_fraction'='0.1')"
    ).count()
    qp.sql("delete from t where k = 150").count()  # merged 121 ≫ 10%
    head = qp.catalog.path("t")
    assert not dml.has_dv(head)
    got = {r["k"] for r in qp.sql("select k from t").collect()}
    assert got == set(range(120, 200)) - {150}


def test_dv_update_fold_keeps_updated_values(qp):
    """A big UPDATE that crosses the fraction folds marks AND keeps the
    appended new rows — the fold must not resurrect old values."""
    qp.sql("update t set v = -1 where k < 80").count()  # 80/280 = 28.6%
    head = qp.catalog.path("t")
    assert not dml.has_dv(head)
    rows = {r["k"]: r["v"] for r in qp.sql("select k, v from t").collect()}
    assert len(rows) == 200
    assert all(rows[k] == (-1 if k < 80 else k * 10) for k in rows)


def test_dv_scan_confines_anti_join_to_dirty_files(spark, tmp_path):
    """Clean files (not named in the sidecar) scan PLAINLY — the
    anti-join probe tax applies only to dirty files.  A k-clustered
    table with a DELETE confined to one file's key range must plan as
    Union(plain scan over 3 clean files, anti-join over 1 dirty file)."""
    from datafusion_dolomite_spark.sources.dml import dv_path
    from datafusion_dolomite_spark.execute import _dv_file_names

    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, i * 10) for i in range(200)], "k bigint, v bigint"
    ).repartitionByRange(4, "k").write.parquet(str(tmp_path / "c0"))
    cat.register("c", str(tmp_path / "c0"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "alter table c set tblproperties ('delete_mode'='merge-on-read')"
    ).count()
    qp.sql("delete from c where k < 30").count()
    head = qp.catalog.path("c")
    assert dml.has_dv(head)
    assert len(_dv_file_names(dv_path(head))) == 1  # one dirty file
    df = qp.sql("select cast(sum(v) as bigint) as s from c")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one anti-join (dirty branch only) and a Union with a
    # plain clean branch: 3 FileScans = clean data + dirty data + DV
    assert plan.count("LeftAnti") == 1
    assert "Union" in plan
    assert plan.count("FileScan parquet") == 3
    assert df.collect()[0]["s"] == sum(i * 10 for i in range(30, 200))
    # a second, scattered delete dirties every file: union collapses
    qp.sql("delete from c where k % 4 = 1").count()
    got = {r["k"] for r in qp.sql("select k from c").collect()}
    assert got == {i for i in range(30, 200) if i % 4 != 1}


def test_dv_file_manifest_written_carried_and_consistent(qp):
    """The DV writer records the dirty-file set as ``_dv/_files.json``
    (O(DV) column read ONCE at write time); scans read the manifest —
    never the sidecar — and a full carry links it forward.  The
    fallback column read must agree with the manifest exactly."""
    import os

    from datafusion_dolomite_spark.execute import _dv_file_names
    from datafusion_dolomite_spark.sources.dml import (
        DV_FILES_MANIFEST,
        dv_path,
        read_dv_file_manifest,
    )

    qp.sql("delete from t where g = 3").count()
    head = qp.catalog.path("t")
    man = read_dv_file_manifest(dv_path(head))
    assert man  # written at statement time (scattered: all 4 files)
    assert len(man) == 4
    # a delta INSERT carries the whole file set → manifest links forward
    qp.sql("insert into t values (1000, 0, 0)").count()
    head2 = qp.catalog.path("t")
    man2 = read_dv_file_manifest(dv_path(head2))
    assert man2 == man
    # fallback column read (manifest removed) derives the same set
    os.remove(os.path.join(dv_path(head2), DV_FILES_MANIFEST))
    assert _dv_file_names(dv_path(head2)) == man


def test_mor_delete_prunes_match_scan(spark, tmp_path, monkeypatch):
    """The merge-on-read DELETE's match-finding scan prunes to the
    files its predicate can touch (footer bands, same proof as the CoW
    rewrite): a clustered DELETE reads ONE file to find its marks, not
    the table."""
    from datafusion_dolomite_spark import execute as ex

    calls = []
    orig = ex.scan_with_rowid

    def spy(spark_, path, schema=None, files=None, base=None):
        calls.append(files)
        return orig(spark_, path, schema=schema, files=files, base=base)

    monkeypatch.setattr(ex, "scan_with_rowid", spy)
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, i * 10) for i in range(200)], "k bigint, v bigint"
    ).repartitionByRange(4, "k").write.parquet(str(tmp_path / "p0"))
    cat.register("p", str(tmp_path / "p0"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "alter table p set tblproperties ('delete_mode'='merge-on-read')"
    ).count()
    qp.sql("delete from p where k < 30").count()
    assert calls and calls[0] is not None and len(calls[0]) == 1
    got = {r["k"] for r in qp.sql("select k from p").collect()}
    assert got == set(range(30, 200))
    # unprovable predicate (modulo): falls back to the full scan
    calls.clear()
    qp.sql("delete from p where k % 7 = 0").count()
    assert calls and calls[0] is None
    got = {r["k"] for r in qp.sql("select k from p").collect()}
    assert got == {i for i in range(30, 200) if i % 7 != 0}


def test_update_without_where_falls_back_to_cow(qp):
    """A predicate-less UPDATE rewrites every row anyway — merge-on-read
    would append a full copy AND mark the whole table; CoW is right."""
    qp.sql("update t set v = 1").count()
    head = qp.catalog.path("t")
    assert not dml.has_dv(head)
    assert qp.sql("select * from t where v = 1").count() == 200
