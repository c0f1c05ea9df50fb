"""Three-valued IN / NOT IN / quantified comparisons (r13, VERDICT r12
item 1 — the top-ranked semantic gap).

Standard SQL's membership and quantified predicates are THREE-valued:

* ``x NOT IN (S)`` is TRUE only when x is non-NULL and NULL-free S
  misses it; a NULL x (with non-empty S) or a NULL row in S yields
  NULL — row-dropping in WHERE, NOT(NULL)=NULL under negation.
* ``x op ALL (S)`` over empty S is vacuously TRUE; a NULL x or a
  leftover NULL row can only degrade TRUE to NULL, never create it.
* ``x op ANY (S)`` over empty S is FALSE; NULLs degrade FALSE to NULL.

The engine's pre-r13 lowerings were documented two-valued; the TPC-H
fixtures are non-null, so the oracle gate structurally could not see
the divergence.  These tests SYNTHESIZE the NULLs with CASE over the
parquet fixtures and cross-check every lowering path against DuckDB
running the identical string:

* top-conjunct NOT IN (anti join + 1-row null-aware count stats),
* embedded IN/NOT IN under OR/NOT (flag join + 3VL CASE),
* correlated NOT IN with equality correlation (per-group counts),
* select-list IN values (new in r13),
* uncorrelated quantified ANY/ALL (broadcast min/max/count stats row),
* regression: the NULL-free fast paths are unchanged.

Reference parity note: the reference engine
(datafusion-contrib/datafusion-dolomite) delegates subquery handling
to DataFusion and never lowers IN subqueries itself (its join support
is Inner-only — ``plan/logical.rs``); these semantics are part of the
from-scratch SQL surface this repo adds on top of the reference's
operator set.
"""

from __future__ import annotations

import duckdb
import pytest

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("customer", "orders", "supplier", "nation", "lineitem"):
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


NULLABLE_PROBE = "(CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END)"
NULLABLE_SUB = (
    "(SELECT CASE WHEN o_custkey = 5 THEN NULL ELSE o_custkey END AS k "
    "FROM orders WHERE o_custkey < 40)"
)
CLEAN_SUB = "(SELECT o_custkey FROM orders WHERE o_custkey < 40)"
EMPTY_SUB = "(SELECT o_custkey FROM orders WHERE o_custkey < 0)"


class TestTopConjunctNotIn:
    def test_null_in_subquery_empties_result(self, planner, duck):
        rows = _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            f"{NULLABLE_SUB} ORDER BY c_custkey",
        )
        assert rows == []  # one NULL row poisons every probe

    def test_null_probe_rows_drop(self, planner, duck):
        rows = _check(
            planner,
            duck,
            f"SELECT c_custkey FROM customer WHERE {NULLABLE_PROBE} "
            f"NOT IN {CLEAN_SUB} ORDER BY c_custkey",
        )
        assert rows and all(r[0] % 7 != 0 for r in rows)

    def test_empty_subquery_keeps_all_even_null_probe(self, planner, duck):
        rows = _check(
            planner,
            duck,
            f"SELECT count(*) AS n FROM customer WHERE {NULLABLE_PROBE} "
            f"NOT IN {EMPTY_SUB}",
        )
        assert rows[0][0] > 0  # every row survives

    def test_positive_in_unchanged(self, planner, duck):
        _check(
            planner,
            duck,
            f"SELECT c_custkey FROM customer WHERE {NULLABLE_PROBE} "
            f"IN {NULLABLE_SUB} ORDER BY c_custkey",
        )


class TestEmbeddedMarkers:
    def test_not_in_under_or(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (c_custkey NOT IN "
            f"{NULLABLE_SUB} OR c_custkey < 3) ORDER BY c_custkey",
        )

    def test_not_over_compound_in(self, planner, duck):
        # NOT(NULL AND TRUE) = NULL: the two-valued flag would
        # wrongly keep the NULL-probe rows
        _check(
            planner,
            duck,
            f"SELECT c_custkey FROM customer WHERE NOT ({NULLABLE_PROBE} "
            f"IN {CLEAN_SUB} AND c_acctbal > -999999.0) ORDER BY c_custkey",
        )

    def test_select_list_in_value(self, planner, duck):
        # r13: IN as a select-list VALUE (three-valued boolean column)
        _check(
            planner,
            duck,
            f"SELECT c_custkey, {NULLABLE_PROBE} IN {CLEAN_SUB} AS hit "
            "FROM customer ORDER BY c_custkey",
        )

    def test_select_list_in_under_aggregate(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT count(CASE WHEN c_custkey NOT IN "
            f"{NULLABLE_SUB} THEN 1 END) AS n FROM customer",
        )


class TestCorrelatedNotIn:
    def test_per_group_null_poisoning(self, planner, duck):
        rows = _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL "
            "             ELSE o_custkey + 1 END AS k "
            " FROM orders WHERE o_custkey = c_custkey "
            "   AND o_totalprice > 150000.0) ORDER BY c_custkey",
        )
        assert rows  # customers with empty or clean-missing groups

    def test_correlated_in_embedded(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (c_custkey NOT IN "
            "(SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL "
            "             ELSE o_custkey + 1 END AS k "
            " FROM orders WHERE o_custkey = c_custkey "
            "   AND o_totalprice > 150000.0) OR c_acctbal < -900.0) "
            "ORDER BY c_custkey",
        )

    def test_non_equality_correlation(self, planner, duck):
        # r13 item 2: non-equality correlated conjuncts route to the
        # rowid-aggregation lowering (no more two-valued residual)
        _check(
            planner,
            duck,
            "SELECT o_orderkey FROM orders WHERE o_orderkey NOT IN "
            "(SELECT l_orderkey FROM lineitem "
            " WHERE l_quantity > o_totalprice / 10000) "
            "ORDER BY o_orderkey LIMIT 50",
        )

    def test_non_equality_correlation_with_nulls(self, planner, duck):
        # NULL keys inside a non-equality-correlated NOT IN subquery:
        # poisoning applies PER OUTER ROW (only rows whose correlated
        # group contains a NULL drop)
        _check(
            planner,
            duck,
            "SELECT o_orderkey FROM orders WHERE o_orderkey NOT IN "
            "(SELECT CASE WHEN l_linenumber = 3 THEN NULL "
            "             ELSE l_orderkey END "
            " FROM lineitem WHERE l_quantity > o_totalprice / 10000) "
            "ORDER BY o_orderkey",
        )


class TestNonEqualityEmbedded:
    """r13 item 2: EXISTS/IN with non-equality correlated conjuncts
    embedded under OR/NOT — the rowid-aggregation lowering
    (``sql.py::_agg_exists_flag`` / ``_agg_in_flag``)."""

    def test_exists_or_inequality(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            " AND o_totalprice > c_acctbal * 50) "
            "OR c_acctbal < -900.0) ORDER BY c_custkey",
        )

    def test_not_exists_inequality(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE NOT (EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            " AND o_totalprice > c_acctbal * 50) "
            "AND c_acctbal > 0) ORDER BY c_custkey",
        )

    def test_exists_pure_inequality_correlation(self, planner, duck):
        # no equality conjunct at all: the correlation join is a pure
        # inequality (Spark plans a broadcast NLJ over the small side)
        _check(
            planner,
            duck,
            "SELECT n_nationkey FROM nation WHERE (EXISTS "
            "(SELECT 1 FROM supplier WHERE s_acctbal > n_nationkey * 400) "
            "OR n_nationkey = 0) ORDER BY n_nationkey",
        )

    def test_in_or_inequality(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (c_custkey IN "
            "(SELECT o_custkey FROM orders WHERE o_custkey = c_custkey "
            " AND o_totalprice > c_acctbal * 20) OR c_acctbal < -900.0) "
            "ORDER BY c_custkey",
        )

    def test_not_in_inequality_null_probe(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE "
            "((CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END) "
            "NOT IN (SELECT o_custkey FROM orders "
            "        WHERE o_totalprice > c_acctbal * 20) "
            "OR c_acctbal < -900.0) ORDER BY c_custkey",
        )

    def test_not_in_inequality_nullable_sub(self, planner, duck):
        # per-row NULL poisoning through an embedded marker
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (c_custkey NOT IN "
            "(SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL "
            "             ELSE o_custkey END "
            " FROM orders WHERE o_totalprice > c_acctbal * 20) "
            "OR c_acctbal < -900.0) ORDER BY c_custkey",
        )


class TestRowidFallback:
    """Shapes the min/max trick can't express — TWO inequalities or
    ``<>`` — exercise the general rowid-aggregation lowering
    (``sql.py::_agg_exists_flag`` / ``_agg_in_flag``)."""

    def test_exists_two_inequalities(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            " AND o_totalprice > c_acctbal * 50 "
            " AND o_orderkey % 7 > c_nationkey % 5) "
            "OR c_acctbal < -900.0) ORDER BY c_custkey",
        )

    def test_exists_not_equal_correlation(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            " AND o_orderkey % 3 <> c_nationkey % 3) "
            "OR c_acctbal < -900.0) ORDER BY c_custkey",
        )

    def test_not_in_two_inequalities_with_nulls(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (c_custkey NOT IN "
            "(SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL "
            "             ELSE o_custkey END "
            " FROM orders WHERE o_totalprice > c_acctbal * 20 "
            "   AND o_orderkey % 7 > c_nationkey % 5) "
            "OR c_acctbal < -900.0) ORDER BY c_custkey",
        )

    def test_in_two_inequalities(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (c_custkey IN "
            "(SELECT o_custkey FROM orders "
            " WHERE o_totalprice > c_acctbal * 20 "
            "   AND o_orderkey % 7 > c_nationkey % 5) "
            "OR c_acctbal < -900.0) ORDER BY c_custkey",
        )


class TestQuantified3VL:
    def test_all_with_null_rows_never_true(self, planner, duck):
        rows = _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_custkey <= ALL "
            "(SELECT CASE WHEN o_custkey < 30 THEN NULL ELSE o_custkey "
            " END AS k FROM orders WHERE o_custkey < 40) "
            "ORDER BY c_custkey",
        )
        assert rows == []  # NULL rows degrade every would-be TRUE

    def test_any_with_null_rows(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_custkey > ANY "
            "(SELECT CASE WHEN o_custkey > 10 THEN NULL ELSE o_custkey "
            " END AS k FROM orders WHERE o_custkey < 40) "
            "ORDER BY c_custkey",
        )

    def test_all_over_empty_is_vacuous_true(self, planner, duck):
        rows = _check(
            planner,
            duck,
            f"SELECT count(*) AS n FROM customer WHERE c_custkey < ALL "
            f"{EMPTY_SUB}",
        )
        assert rows[0][0] > 0

    def test_any_over_empty_is_false(self, planner, duck):
        rows = _check(
            planner,
            duck,
            f"SELECT count(*) AS n FROM customer WHERE c_custkey < ANY "
            f"{EMPTY_SUB}",
        )
        assert rows[0][0] == 0

    def test_eq_all_and_neq_any(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT count(*) AS n FROM customer WHERE c_nationkey = ALL "
            "(SELECT n_nationkey FROM nation WHERE n_nationkey = 3)",
        )
        _check(
            planner,
            duck,
            "SELECT count(*) AS n FROM customer WHERE c_nationkey != ANY "
            "(SELECT n_nationkey FROM nation WHERE n_nationkey = 3)",
        )

    def test_neq_all_routes_to_not_in(self, planner, duck):
        rows = _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_custkey != ALL "
            f"{NULLABLE_SUB} ORDER BY c_custkey",
        )
        assert rows == []  # != ALL ≡ NOT IN: NULL row poisons all

    def test_quantifier_as_select_value(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey, c_acctbal <= ALL "
            "(SELECT s_acctbal + 10000 FROM supplier) AS below "
            "FROM customer ORDER BY c_custkey LIMIT 20",
        )

    def test_not_of_quantifier(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE NOT (c_acctbal <= ALL "
            "(SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_acctbal "
            " END AS a FROM supplier)) ORDER BY c_custkey",
        )

    def test_correlated_any_clean(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_acctbal < ANY "
            "(SELECT s_acctbal FROM supplier "
            " WHERE s_nationkey = c_nationkey) ORDER BY c_custkey",
        )


class TestCorrelatedQuantifier3VL:
    """r13: CORRELATED quantifiers are three-valued too — a CASE over
    three EXISTS flags (``sql.py`` quantifier branch): witness/
    violation (min/max grouped hash join), group-nonempty, and
    NULL-row-in-group."""

    def test_all_with_null_rows_per_group(self, planner, duck):
        # only rows whose correlated group holds a NULL get poisoned
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_acctbal >= ALL "
            "(SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL "
            "             ELSE o_totalprice / 1000 END "
            " FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
        )

    def test_not_over_correlated_any_with_nulls(self, planner, duck):
        # NOT(NULL) = NULL: rows whose group has a NULL and no witness
        # must drop — the two-valued flag kept them
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE NOT (c_acctbal < ANY "
            "(SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL "
            "             ELSE o_totalprice / 1000 END "
            " FROM orders WHERE o_custkey = c_custkey)) ORDER BY c_custkey",
        )

    def test_null_probe_under_correlated_all(self, planner, duck):
        # a NULL x is TRUE only against an EMPTY group
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE "
            "(CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END) "
            ">= ALL (SELECT o_totalprice / 1000 FROM orders "
            "        WHERE o_custkey = c_custkey) ORDER BY c_custkey",
        )

    def test_correlated_all_under_or(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE (c_acctbal >= ALL "
            "(SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL "
            "             ELSE o_totalprice / 1000 END "
            " FROM orders WHERE o_custkey = c_custkey) "
            "OR c_acctbal < -900) ORDER BY c_custkey",
        )

    def test_correlated_neq_all(self, planner, duck):
        # <> ALL: the = complement drives the violation flag
        _check(
            planner,
            duck,
            "SELECT c_custkey FROM customer WHERE c_custkey <> ALL "
            "(SELECT o_custkey + 1 FROM orders WHERE o_custkey = c_custkey) "
            "ORDER BY c_custkey",
        )


class TestRegressionNullFree:
    def test_plain_not_in(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT count(*) AS n FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)",
        )

    def test_plain_all(self, planner, duck):
        _check(
            planner,
            duck,
            "SELECT count(*) AS n FROM customer WHERE c_acctbal <= ALL "
            "(SELECT s_acctbal + 10000 FROM supplier)",
        )
