"""Skew salting: the AGGREGATE race (recalibrated r7) and the JOIN race.

r6 made the cost race pick ``PhysicalSaltedHashAggregate`` for payload
aggregates over a skewed key, on a plan-shape argument.  Round 7's
shuffle-regime measurement (BENCHNOTES_r07.md) refuted it: for
collect_*-class payloads stage 2 RE-SHUFFLES the full payload and still
concatenates the hot key's array on one task, so the salted plan is
0.85x the plain one at 20M rows and loses at 100M too.  The cost model
now charges stage 2's payload bytes honestly, and the pinned behavior
is: the salted AGGREGATE never wins the race (payload or collapsible) —
while its EXECUTION stays correct (pinned against a plain groupBy by
constructing the salted plan directly), because the operator remains
the engine's building block wherever a caller wants it.

The skew weapon that DID survive the clock is the salted/replicated
JOIN (2.2x measured): its flip/no-flip race is pinned below unchanged.
"""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import (
    LogicalPlanBuilder,
    QueryPlanner,
    col,
)
from datafusion_dolomite_spark.expr import Alias, Func
from datafusion_dolomite_spark.operators.physical import (
    PhysicalHashAggregate,
    PhysicalSaltedHashAggregate,
)
from datafusion_dolomite_spark.sources.catalog import Catalog


def _root_agg(plan):
    return plan.root.operator


def _write(spark, path, rows_per_key):
    """One narrow (k, v) table; ``rows_per_key`` maps key → row count."""
    rows = []
    v = 0
    for k, n in rows_per_key.items():
        for _ in range(n):
            rows.append((k, v))
            v += 1
    spark.createDataFrame(rows, "k bigint, v bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


@pytest.fixture(scope="module")
def skew_cat(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("skewtab")
    # skewed: one key holds half the table, low ndv
    _write(
        spark,
        str(base / "skewed"),
        {0: 3000, **{k: 60 for k in range(1, 51)}},
    )
    # uniform, high ndv: fair share per reducer exceeds every key
    _write(spark, str(base / "uniform"), {k: 6 for k in range(1000)})
    # small dim keyed kd — the build side of the skew-join tests: too
    # big to broadcast under the forced-shuffle thresholds, cheap to
    # replicate n_salts times
    spark.createDataFrame(
        [(k, k * 10) for k in range(51)], "kd bigint, w bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(base / "dim"))
    cat = Catalog()
    cat.register("skewed", str(base / "skewed"))
    cat.register("uniform", str(base / "uniform"))
    cat.register("dim", str(base / "dim"))
    return cat


def _payload_plan(table):
    return (
        LogicalPlanBuilder()
        .scan(table)
        .aggregate(
            [col("k")],
            [
                Alias(Func("collect_list", (col("v"),)), "_vs"),
                Alias(Func("count", ()), "n"),
            ],
        )
        .build()
    )


def _collapsible_plan(table):
    return (
        LogicalPlanBuilder()
        .scan(table)
        .aggregate(
            [col("k")],
            [Alias(Func("sum", (col("v"),)), "s"), Alias(Func("count", ()), "n")],
        )
        .build()
    )


def test_skewed_payload_agg_stays_plain(spark, skew_cat):
    """Recalibrated (r7): even on the skewed key, the byte-honest
    stage-2 term keeps the plain aggregate — the measured winner."""
    qp = QueryPlanner(spark, skew_cat)
    phys = qp.optimize(_payload_plan("skewed"))
    op = _root_agg(phys)
    assert isinstance(op, PhysicalHashAggregate)
    assert not isinstance(op, PhysicalSaltedHashAggregate), phys.explain()


def test_uniform_key_stays_plain(spark, skew_cat):
    qp = QueryPlanner(spark, skew_cat)
    phys = qp.optimize(_payload_plan("uniform"))
    op = _root_agg(phys)
    assert isinstance(op, PhysicalHashAggregate)
    assert not isinstance(op, PhysicalSaltedHashAggregate), phys.explain()


def test_collapsible_aggs_never_salt(spark, skew_cat):
    """count/sum over the SAME skewed key: map-side combine already
    bounds the hot key, so the salted alternative must lose."""
    qp = QueryPlanner(spark, skew_cat)
    phys = qp.optimize(_collapsible_plan("skewed"))
    op = _root_agg(phys)
    assert isinstance(op, PhysicalHashAggregate)
    assert not isinstance(op, PhysicalSaltedHashAggregate), phys.explain()


def _salted_plan(table, agg_exprs):
    """Directly-constructed physical plan through the salted operator
    (the race no longer picks it; execution correctness still pinned)."""
    from datafusion_dolomite_spark.operators.physical import (
        PhysicalTableScan,
    )
    from datafusion_dolomite_spark.plans.plan import Plan, PlanNode

    return Plan(
        PlanNode(
            PhysicalSaltedHashAggregate(
                group_exprs=(col("k"),), agg_exprs=tuple(agg_exprs)
            ),
            [PlanNode(PhysicalTableScan(table), [])],
        )
    )


def test_salted_execution_matches_plain(spark, skew_cat):
    """The salted operator computes the same answer as a plain groupBy
    (lists compared as sorted sets, counts exactly)."""
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.execute import to_spark

    plan = _salted_plan(
        "skewed",
        [
            Alias(Func("collect_list", (col("v"),)), "_vs"),
            Alias(Func("count", ()), "n"),
        ],
    )
    got = {
        r["k"]: (sorted(r["_vs"]), r["n"])
        for r in to_spark(plan, spark, skew_cat).collect()
    }
    src = skew_cat.path("skewed")
    ref = (
        spark.read.parquet(src)
        .groupBy("k")
        .agg(
            F.sort_array(F.collect_list("v")).alias("vs"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    want = {r["k"]: (list(r["vs"]), r["n"]) for r in ref.collect()}
    assert got == want


def test_salted_avg_matches(spark, skew_cat):
    """avg rides the salted operator as a (sum, count) partial pair
    with final Σsum/Σcount (VERDICT r6 item 4) — execution equality
    pinned through the directly-constructed salted plan."""
    from datafusion_dolomite_spark.execute import to_spark

    plan = _salted_plan(
        "skewed",
        [
            Alias(Func("collect_list", (col("v"),)), "_vs"),
            Alias(Func("avg", (col("v"),)), "v_avg"),
        ],
    )
    got = {
        r["k"]: (sorted(r["_vs"]), r["v_avg"])
        for r in to_spark(plan, spark, skew_cat).collect()
    }
    from pyspark.sql import functions as F

    ref = (
        spark.read.parquet(skew_cat.path("skewed"))
        .groupBy("k")
        .agg(
            F.sort_array(F.collect_list("v")).alias("vs"),
            F.avg("v").alias("a"),
        )
    )
    want = {r["k"]: (list(r["vs"]), r["a"]) for r in ref.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1])


# ---------------------------------------------------------------------------
# cost-raced salted/replicated skew JOIN (VERDICT r6 item 4)


@pytest.fixture(scope="module")
def shuffle_qp(spark, skew_cat):
    """Forced-shuffle regime (broadcast thresholds = 1): at 100 TB the
    probe side never broadcasts and a skewed probe key means one
    straggler reducer — the regime the salted/replicated join exists
    for.  (With broadcast admissible the broadcast join has no key
    shuffle at all and must keep winning — pinned below.)"""
    from datafusion_dolomite_spark.optimizer.cascades.cost import SparkCostModel

    return QueryPlanner(
        spark,
        skew_cat,
        cost_model=SparkCostModel(
            broadcast_row_threshold=1, broadcast_bytes_threshold=1
        ),
    )


def _join_plan(table):
    from datafusion_dolomite_spark.expr import BinOp
    from datafusion_dolomite_spark.operators.logical import JoinType

    return (
        LogicalPlanBuilder()
        .scan(table)
        .join(
            LogicalPlanBuilder().scan("dim"),
            JoinType.INNER,
            BinOp("=", col("k"), col("kd")),
        )
        .build()
    )


def test_skewed_probe_key_flips_to_salted_join(spark, shuffle_qp):
    from datafusion_dolomite_spark.operators.physical import (
        PhysicalSaltedReplicateJoin,
    )

    phys = shuffle_qp.optimize(_join_plan("skewed"))
    assert isinstance(phys.root.operator, PhysicalSaltedReplicateJoin), (
        phys.explain()
    )


def test_uniform_probe_key_stays_plain_join(spark, shuffle_qp):
    from datafusion_dolomite_spark.operators.physical import (
        PhysicalSaltedReplicateJoin,
    )

    phys = shuffle_qp.optimize(_join_plan("uniform"))
    assert not isinstance(phys.root.operator, PhysicalSaltedReplicateJoin), (
        phys.explain()
    )


def test_broadcast_still_beats_salted_when_admissible(spark, skew_cat):
    """Default thresholds: the dim broadcasts, and a broadcast join has
    no key shuffle — skew-immune, strictly better than salting."""
    from datafusion_dolomite_spark.operators.physical import (
        PhysicalBroadcastHashJoin,
    )

    qp = QueryPlanner(spark, skew_cat)
    phys = qp.optimize(_join_plan("skewed"))
    assert isinstance(phys.root.operator, PhysicalBroadcastHashJoin), (
        phys.explain()
    )


def test_salted_join_execution_matches_plain(spark, shuffle_qp, skew_cat):
    from datafusion_dolomite_spark.operators.physical import (
        PhysicalSaltedReplicateJoin,
    )

    plan = _join_plan("skewed")
    assert isinstance(
        shuffle_qp.optimize(plan).root.operator, PhysicalSaltedReplicateJoin
    )
    got = sorted(
        (r["k"], r["v"], r["kd"], r["w"])
        for r in shuffle_qp.dataframe(plan).collect()
    )
    left = spark.read.parquet(skew_cat.path("skewed"))
    right = spark.read.parquet(skew_cat.path("dim"))
    want = sorted(
        (r["k"], r["v"], r["kd"], r["w"])
        for r in left.join(right, left.k == right.kd, "inner").collect()
    )
    assert got == want


def test_real_data_lang_stays_plain(spark):
    """documents.lang (the q_skewed_agg shape): with the byte-honest
    stage-2 term the race keeps the plain aggregate here too — the
    driver query's in-plan assertion mirrors this."""
    from datafusion_dolomite_spark import testdata_catalog as tc

    from .conftest import SF_DIR_ORACLE

    qp = QueryPlanner(spark, tc(SF_DIR_ORACLE))
    plan = (
        LogicalPlanBuilder()
        .scan("documents")
        .aggregate(
            [col("lang")],
            [Alias(Func("collect_list", (col("doc_id"),)), "_ids")],
        )
        .build()
    )
    phys = qp.optimize(plan)
    assert not isinstance(_root_agg(phys), PhysicalSaltedHashAggregate)
