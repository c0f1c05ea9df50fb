"""MERGE-time automatic schema evolution (r10, VERDICT item 1):
with table property ``schema_evolution='auto'`` (Delta's
mergeSchema-for-MERGE), source columns the target lacks are added
through the metadata-only ALTER machinery when the statement can
write them — ``INSERT *``, ``UPDATE SET *``, or an explicit
assignment to the new column.  Also covers the new ``UPDATE SET *``
expansion (all shared columns take the source value by name)."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog


@pytest.fixture()
def qp(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "target"))
    # source carries an EXTRA column `tag` the target doesn't have
    spark.createDataFrame(
        [(2, 999, "b"), (9, 111, "i")], "k bigint, v bigint, tag string"
    ).coalesce(1).write.parquet(str(tmp_path / "source"))
    cat.register("target", str(tmp_path / "target"))
    cat.register("source", str(tmp_path / "source"))
    return QueryPlanner(spark, cat)


def _auto(qp):
    qp.sql(
        "alter table target set tblproperties ('schema_evolution'='auto')"
    ).count()


def test_insert_star_evolves(qp):
    """INSERT * with a new source column adds the column; pre-existing
    rows null-fill, inserted rows carry the source value."""
    _auto(qp)
    qp.sql(
        "merge into target t using source s on t.k = s.k "
        "when matched then update set v = s.v "
        "when not matched then insert *"
    ).count()
    rows = {r["k"]: (r["v"], r["tag"]) for r in qp.sql("select * from target").collect()}
    assert rows == {
        1: (100, None),
        2: (999, None),  # matched UPDATE didn't touch tag
        3: (300, None),
        9: (111, "i"),  # inserted row carries the new column
    }


def test_update_set_star_evolves(qp):
    """UPDATE SET * both evolves the schema and writes every shared
    column from the source for matched rows."""
    _auto(qp)
    qp.sql(
        "merge into target t using source s on t.k = s.k "
        "when matched then update set * "
        "when not matched then insert *"
    ).count()
    rows = {r["k"]: (r["v"], r["tag"]) for r in qp.sql("select * from target").collect()}
    assert rows == {
        1: (100, None),
        2: (999, "b"),  # SET * wrote tag too
        3: (300, None),
        9: (111, "i"),
    }


def test_explicit_new_column_assignment_evolves(qp):
    """UPDATE SET tag = s.tag on a column the target lacks evolves it
    even without an INSERT arm."""
    _auto(qp)
    qp.sql(
        "merge into target t using source s on t.k = s.k "
        "when matched then update set tag = s.tag"
    ).count()
    rows = {r["k"]: (r["v"], r["tag"]) for r in qp.sql("select * from target").collect()}
    assert rows == {1: (100, None), 2: (200, "b"), 3: (300, None)}


def test_no_auto_no_evolution(qp):
    """Without the property, extra source columns are ignored (the
    pre-r10 contract, unchanged) — schema stays put."""
    qp.sql(
        "merge into target t using source s on t.k = s.k "
        "when matched then update set v = s.v "
        "when not matched then insert *"
    ).count()
    assert [f.name for f in qp.sql("select * from target").schema.fields] == ["k", "v"]


def test_evolved_schema_persists_through_second_dml(qp):
    """The evolved schema rides the version log: a follow-up DML sees
    and preserves the new column."""
    _auto(qp)
    qp.sql(
        "merge into target t using source s on t.k = s.k "
        "when not matched then insert *"
    ).count()
    qp.sql("update target set v = v + 1 where k = 9").count()
    rows = {r["k"]: (r["v"], r["tag"]) for r in qp.sql("select * from target").collect()}
    assert rows[9] == (112, "i")


def test_nms_set_star_rejected(qp):
    _auto(qp)
    with pytest.raises(ValueError, match="BY SOURCE"):
        qp.sql(
            "merge into target t using source s on t.k = s.k "
            "when not matched by source then update set *"
        )
