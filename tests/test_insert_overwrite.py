"""INSERT OVERWRITE [TABLE] t (r10): replace a versioned table's
contents as a new overwrite-tagged version — Spark SQL's static
overwrite / Delta's replace.  Previous versions stay time-travelable;
column lists map positionally with NULL fill; constraints validate the
full new contents."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog


@pytest.fixture()
def qp(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t"))
    cat.register("t", str(tmp_path / "t"))
    return QueryPlanner(spark, cat)


def test_overwrite_replaces_contents(qp):
    qp.sql("insert overwrite t values (100, 0), (101, 1)").count()
    rows = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    assert rows == [(100, 0), (101, 1)]


def test_overwrite_is_a_version(qp):
    qp.sql("insert overwrite table t values (9, 9)").count()
    hist = qp.sql("describe history t").collect()
    assert any(r["operation"] == "overwrite" for r in hist)
    # old contents still time-travelable
    # general time travel (r10): projections compose with VERSION AS OF
    old = sorted(
        r["k"] for r in qp.sql(
            "select k from t version as of 0"
        ).collect()
    )
    assert old == [1, 2, 3]
    assert qp.sql("select * from t").count() == 1


def test_overwrite_column_list_null_fills(qp):
    qp.sql("insert overwrite t (k) values (0), (1)").count()
    rows = sorted(
        (r["k"], r["v"]) for r in qp.sql("select * from t").collect()
    )
    assert rows == [(0, None), (1, None)]


def test_overwrite_unknown_column_rejected(qp):
    with pytest.raises(ValueError, match="unknown column"):
        qp.sql("insert overwrite t (zz) select 1")


def test_time_travel_composes_with_aggregates(qp):
    """r10: VERSION AS OF in any FROM/JOIN position — aggregate over an
    old version joined against the current one."""
    qp.sql("insert overwrite t values (1, 900)").count()
    n_old = qp.sql(
        "select count(*) as n from t version as of 0"
    ).collect()[0]["n"]
    assert n_old == 3
    joined = qp.sql(
        "select k, old_v from t "
        "join (select k as k0, v as old_v from t version as of 0) "
        "on k = k0"
    ).collect()
    # current t has only (1,900); version 0 had (1,10)
    assert len(joined) == 1 and joined[0]["old_v"] == 10
