"""r13 grammar batch (VERDICT r12 item 6): IGNORE NULLS, WITHIN GROUP
ordered-set aggregates, FETCH FIRST, TRY_CAST.

Every test runs the identical string on the engine and on DuckDB —
full-row comparison, NULLs included.

Reference parity note: the reference engine
(datafusion-contrib/datafusion-dolomite) has no SQL surface of its own
(entry points parse via DataFusion); these idioms are part of the
from-scratch SQL layer this repo adds on top of the reference's
operator set.
"""

from __future__ import annotations

import duckdb
import pytest

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("customer", "orders", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _check(planner, duck, sql):
    mine = [tuple(r) for r in planner.sql(sql).collect()]
    theirs = duck.execute(sql).fetchall()
    assert mine == theirs, (
        f"spark={mine[:8]} ({len(mine)} rows) != "
        f"duckdb={theirs[:8]} ({len(theirs)} rows)\n{sql}"
    )
    return mine


# a column that is NULL on two of every three rows
GAPPY = "(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal END)"


class TestIgnoreNulls:
    def test_last_value(self, planner, duck):
        _check(
            planner,
            duck,
            f"SELECT c_custkey, last_value({GAPPY} IGNORE NULLS) "
            "OVER (ORDER BY c_custkey) AS lv "
            "FROM customer ORDER BY c_custkey",
        )

    def test_first_value_partitioned(self, planner, duck):
        _check(
            planner,
            duck,
            f"SELECT c_custkey, first_value({GAPPY} IGNORE NULLS) "
            "OVER (PARTITION BY c_nationkey ORDER BY c_custkey "
            " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
            "AS fv FROM customer ORDER BY c_custkey",
        )

    def test_lag_offset_1(self, planner, duck):
        # the gap-filling idiom: previous non-null value
        _check(
            planner,
            duck,
            f"SELECT c_custkey, lag({GAPPY} IGNORE NULLS) "
            "OVER (ORDER BY c_custkey) AS prev "
            "FROM customer ORDER BY c_custkey",
        )

    def test_lag_offset_n(self, planner, duck):
        _check(
            planner,
            duck,
            f"SELECT c_custkey, lag({GAPPY}, 2 IGNORE NULLS) "
            "OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS p2 "
            "FROM customer ORDER BY c_custkey",
        )

    def test_lead_offset_1_and_3(self, planner, duck):
        _check(
            planner,
            duck,
            f"SELECT c_custkey, lead({GAPPY} IGNORE NULLS) "
            "OVER (ORDER BY c_custkey) AS n1, "
            f"       lead({GAPPY}, 3 IGNORE NULLS) "
            "OVER (ORDER BY c_custkey) AS n3 "
            "FROM customer ORDER BY c_custkey",
        )

    def test_nth_value(self, planner, duck):
        _check(
            planner,
            duck,
            f"SELECT c_custkey, nth_value({GAPPY}, 2 IGNORE NULLS) "
            "OVER (ORDER BY c_custkey "
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv "
            "FROM customer ORDER BY c_custkey",
        )

    def test_named_window(self, planner, duck):
        _check(
            planner,
            duck,
            f"SELECT c_custkey, lag({GAPPY} IGNORE NULLS) OVER w AS prev "
            "FROM customer "
            "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey) "
            "ORDER BY c_custkey",
        )

    def test_respect_nulls_noop(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey, lag(c_acctbal RESPECT NULLS) "
            "OVER (ORDER BY c_custkey) AS prev "
            "FROM customer ORDER BY c_custkey",
        )

    def test_rejects_non_window_func(self, planner):
        from datafusion_dolomite_spark.sql import SqlError

        with pytest.raises(SqlError, match="IGNORE NULLS"):
            planner.sql(
                "SELECT sum(c_acctbal IGNORE NULLS) AS s FROM customer"
            )


class TestWithinGroup:
    def test_percentile_cont(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_nationkey, "
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS med "
            "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
        )

    def test_percentile_cont_desc(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT "
            "percentile_cont(0.25) WITHIN GROUP (ORDER BY c_acctbal DESC) "
            "AS p FROM customer",
        )

    def test_percentile_disc(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_nationkey, "
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal) AS p "
            "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
        )

    def test_percentile_disc_desc_and_edges(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT "
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal DESC) "
            "AS p, "
            "percentile_disc(0.0) WITHIN GROUP (ORDER BY c_acctbal) AS lo, "
            "percentile_disc(1.0) WITHIN GROUP (ORDER BY c_acctbal) AS hi "
            "FROM customer",
        )

    def test_all_null_group(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT percentile_cont(0.5) WITHIN GROUP "
            "(ORDER BY CASE WHEN c_custkey < 0 THEN c_acctbal END) AS p, "
            "percentile_disc(0.5) WITHIN GROUP "
            "(ORDER BY CASE WHEN c_custkey < 0 THEN c_acctbal END) AS d "
            "FROM customer",
        )

    def test_requires_within_group(self, planner):
        from datafusion_dolomite_spark.sql import SqlError

        with pytest.raises(SqlError, match="WITHIN GROUP"):
            planner.sql(
                "SELECT percentile_cont(0.5) AS p FROM customer"
            )


class TestFetchFirst:
    def test_offset_fetch(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer ORDER BY c_custkey "
            "OFFSET 5 ROWS FETCH FIRST 7 ROWS ONLY",
        )

    def test_fetch_next_default_1(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer ORDER BY c_custkey "
            "FETCH NEXT ROW ONLY",
        )

    def test_bare_offset_rows(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT count(*) AS n FROM (SELECT c_custkey FROM customer "
            "ORDER BY c_custkey OFFSET 140 ROWS) t",
        )


class TestTryCast:
    def test_failure_is_null(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey, TRY_CAST(c_name AS int) AS bad, "
            "TRY_CAST(c_custkey AS varchar) AS s, "
            "TRY_CAST(c_mktsegment AS double) AS bad2 "
            "FROM customer ORDER BY c_custkey",
        )

    def test_partial_success(self, planner, duck):
        # strings that ARE parseable convert; others go NULL
        _check(
            planner,
            duck,
            "SELECT c_custkey, "
            "TRY_CAST(CASE WHEN c_custkey % 2 = 0 "
            "              THEN cast(c_custkey AS varchar) "
            "              ELSE c_name END AS bigint) AS k "
            "FROM customer ORDER BY c_custkey",
        )
