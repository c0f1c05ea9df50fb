"""SQL DML on warehouse tables (r7): DELETE / UPDATE / INSERT INTO as
copy-on-write rewrites (versioned dirs — a rewrite never writes into the
files it reads), plus SHOW TABLES / DESCRIBE."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog


@pytest.fixture()
def qp(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, i * 10, None if i == 5 else "x") for i in range(10)],
        "k bigint, v bigint, tag string",
    ).coalesce(1).write.parquet(str(tmp_path / "t0"))
    cat.register("t", str(tmp_path / "t0"))
    return QueryPlanner(spark, cat)


def test_delete_update_insert_chain(qp):
    assert qp.sql("delete from t where k >= 7").count() == 7
    rows = {r["k"]: r["v"] for r in qp.sql(
        "update t set v = v + 1 where k < 3"
    ).collect()}
    assert rows == {0: 1, 1: 11, 2: 21, 3: 30, 4: 40, 5: 50, 6: 60}
    out = qp.sql(
        "insert into t select cast(100 as bigint) as k, "
        "cast(0 as bigint) as v, 'new' as tag from t where k = 0"
    )
    assert sorted(r["k"] for r in out.collect()) == [0, 1, 2, 3, 4, 5, 6, 100]


def test_delete_null_predicate_keeps_row(qp):
    """SQL DELETE removes rows where the predicate is TRUE; a NULL
    predicate (tag = 'x' on the NULL-tag row) must KEEP the row."""
    out = qp.sql("delete from t where tag = 'x'")
    assert sorted(r["k"] for r in out.collect()) == [5]


def test_update_without_where_updates_all(qp):
    out = qp.sql("update t set v = 0")
    assert {r["v"] for r in out.collect()} == {0}


def test_update_preserves_column_types(qp):
    out = qp.sql("update t set v = v + 0.0 where k = 0")
    assert dict(out.dtypes)["v"] == "bigint"  # cast back to the schema


def test_show_and_describe(qp):
    assert [r["table_name"] for r in qp.sql("show tables").collect()] == ["t"]
    desc = {r["col_name"]: r["data_type"] for r in qp.sql("describe t").collect()}
    assert desc == {"k": "bigint", "v": "bigint", "tag": "string"}


def test_cow_never_touches_read_files(qp, spark):
    """Chained rewrites land in fresh version dirs: the files backing
    the PREVIOUS registration still read back unchanged."""
    before_path = qp.catalog.path("t")
    qp.sql("delete from t where k = 0").count()
    after_path = qp.catalog.path("t")
    assert before_path != after_path
    assert spark.read.parquet(before_path).count() == 10  # untouched


def test_version_as_of_time_travel(qp):
    """VERSION AS OF reads any point in the COW lineage: v0 = before
    the first rewrite, one version per DML."""
    qp.sql("delete from t where k >= 7").count()       # v1: 7 rows
    qp.sql("update t set v = 0 where k = 0").count()   # v2
    assert qp.sql("select * from t version as of 0").count() == 10
    assert qp.sql("select * from t version as of 1").count() == 7
    v2 = {r["k"]: r["v"] for r in qp.sql("select * from t version as of 2").collect()}
    assert v2[0] == 0 and v2[1] == 10
    with pytest.raises(Exception):
        qp.sql("select * from t version as of 9")


def test_macro_expansion_skips_string_literals(qp):
    """A macro name appearing inside a quoted literal must NOT expand."""
    qp.sql("create function double_it(x) as (x + x)").count()
    out = qp.sql(
        "select k, double_it(v) as dv, 'double_it(9)' as label "
        "from t where k <= 1"
    )
    rows = sorted((r["k"], r["dv"], r["label"]) for r in out.collect())
    assert rows == [(0, 0, "double_it(9)"), (1, 20, "double_it(9)")]
