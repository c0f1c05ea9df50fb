"""Shuffle-regime wall-clock proof (VERDICT r6 item 1).

Every plan-quality claim so far was proved at sf0.1, where all dim
sides broadcast and whole-stage codegen fuses join chains — the cost
model's regime switches never fired on a clock.  This script derives a
~10x dataset (key-shifted union replication into spark-warehouse —
TESTDATA itself is read-only) and measures, wall-clock, the races the
optimizer claims to win in the shuffle regime:

  1. join ORDER: textual vs explored on the dim-chain and TPC-H Q5
     shapes, broadcast disabled (the 100 TB posture where no side
     broadcasts and the order decides how often the fact shuffles);
  2. salted AGGREGATE: plain hash agg vs the cost-picked two-stage
     salted plan on a payload aggregate over a 43%-hot key;
  3. salted/replicated JOIN: plain shuffle join vs the cost-picked
     PhysicalSaltedReplicateJoin on the same hot probe key;
  4. eager aggregation: with vs without the pre-join partial aggregate;
  5. regime switches at DEFAULT thresholds: which sides the stats say
     broadcast at 10x (dims yes, facts no) — asserted against the plan.

Usage:  python scripts/shuffle_regime_bench.py [--sf-dir DIR] [--runs N]
Prints a markdown table (pasted into BENCHNOTES_r07.md) plus one JSON
line for machine diffing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = {"lineitem": 10, "orders": 10, "customer": 10, "documents": 100}
STRIDE = 100_000_000


def build_scaled(spark, sf_dir: str, dest: str) -> None:
    """Key-shifted union replication: replica i shifts every synthetic
    key by i*STRIDE so fan-outs stay realistic (joins don't multiply),
    row counts grow 10-100x, and dim tables keep their true size."""
    from pyspark.sql import functions as F

    os.makedirs(dest, exist_ok=True)
    shifts = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "documents": ["doc_id"],
    }
    for t, n in REPLICAS.items():
        out = os.path.join(dest, t)
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        rep = df.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(n)]))
        )
        for k in shifts[t]:
            rep = rep.withColumn(
                k,
                F.col(k)
                + F.col("_r").cast("bigint") * F.lit(STRIDE).cast("bigint"),
            )
        rep.drop("_r").repartition(32).write.mode("overwrite").parquet(out)
    # small dims pass through unscaled (they stay small at 100 TB too)
    for t in ("supplier", "nation", "region"):
        out = os.path.join(dest, t)
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).write.mode(
                "overwrite"
            ).parquet(out)
    # skewdocs: a NARROW 20M-row skew fixture (docs' (doc_id, lang) x40,
    # top language still ~43% = 8.6M rows on ONE reducer un-salted).
    # The 0.5M-row scaled documents is too small for makespan skew to
    # show on a single box — the hot reducer finishes in tens of ms.
    out = os.path.join(dest, "skewdocs")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        d = spark.read.parquet(os.path.join(dest, "documents")).select(
            "doc_id", "lang"
        )
        rep = d.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(40)]))
        ).withColumn(
            "doc_id",
            F.col("doc_id")
            + F.col("_r").cast("bigint") * F.lit(STRIDE * 1000).cast("bigint"),
        )
        rep.drop("_r").repartition(32).write.mode("overwrite").parquet(out)


def race(spark, fns: dict, runs: int = 3) -> dict:
    """INTERLEAVED timing (the BENCHNOTES_r06 protocol): warm each
    variant once, then alternate A,B,A,B… and report the MEDIAN.
    Consecutive min-of-N is the wrong estimator here — the heavy
    variants are GC-dominated (a single reducer building an 8.6M-element
    array), so one lucky GC alignment makes min() lie, and back-to-back
    runs hand the second variant the first one's heap pressure."""
    import gc
    import statistics

    for fn in fns.values():
        fn()  # warm (plan + JIT + page cache)
    samples: dict = {k: [] for k in fns}
    for _ in range(runs):
        for k, fn in fns.items():
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            fn()
            samples[k].append(time.perf_counter() - t0)
    return {k: round(statistics.median(v), 3) for k, v in samples.items()}


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from datafusion_dolomite_spark import (
        LogicalPlanBuilder,
        QueryPlanner,
        col,
    )
    from datafusion_dolomite_spark.expr import Alias, BinOp, Func
    from datafusion_dolomite_spark.operators.logical import JoinType
    from datafusion_dolomite_spark.operators import physical as P
    from datafusion_dolomite_spark.optimizer.cascades.cost import SparkCostModel
    from datafusion_dolomite_spark.optimizer.rules.agg import (
        Agg2SaltedHashAggregateRule,
        EagerAggregationRule,
    )
    from datafusion_dolomite_spark.optimizer.rules.join import (
        Join2SaltedReplicateJoinRule,
    )
    from datafusion_dolomite_spark.planner import default_cascades_rules
    from datafusion_dolomite_spark.session import get_spark
    from datafusion_dolomite_spark.sources.catalog import Catalog
    from datafusion_dolomite_spark.sql import parse_sql

    spark = get_spark("shuffle-regime")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "scale10",
    )
    print(f"building scaled dataset under {dest} ...", file=sys.stderr)
    build_scaled(spark, args.sf_dir, dest)
    cat = Catalog()
    for t in (
        "lineitem", "orders", "customer", "documents",
        "supplier", "nation", "region", "skewdocs",
    ):
        cat.register(t, os.path.join(dest, t))
    rows = {t: int(cat.statistics(t).row_count) for t in (
        "lineitem", "orders", "customer", "documents", "skewdocs")}
    print(f"scaled rows: {rows}", file=sys.stderr)

    shuffle_cm = SparkCostModel(
        broadcast_row_threshold=0, broadcast_bytes_threshold=0
    )
    results: dict = {}
    table: list = []

    def planner(cm=None, rules=None):
        return QueryPlanner(
            spark, cat, cost_model=cm,
            cascades_rules=rules if rules is not None else None,
        )

    no_explore = default_cascades_rules(enable_join_exploration=False)
    no_eager = [
        r for r in default_cascades_rules()
        if not isinstance(r, EagerAggregationRule)
    ]
    no_salt_agg = [
        r for r in no_eager if not isinstance(r, Agg2SaltedHashAggregateRule)
    ]
    no_salt_join = [
        r for r in no_eager if not isinstance(r, Join2SaltedReplicateJoinRule)
    ]

    # ---- 1a. dim chain, shuffle regime: textual vs explored ----------
    chain = (
        "select n_name, count(*) as n from lineitem "
        "join supplier on l_suppkey = s_suppkey "
        "join nation on s_nationkey = n_nationkey "
        "join region on n_regionkey = r_regionkey "
        "where r_name = 'ASIA' group by n_name"
    )
    qp_t = planner(shuffle_cm, no_explore)
    qp_e = planner(shuffle_cm, no_eager)
    pt, pe = qp_t.optimize(parse_sql(chain, cat)), qp_e.optimize(parse_sql(chain, cat))
    from datafusion_dolomite_spark.execute import to_spark

    r = race(spark, {
        "t": lambda: noop(to_spark(pt, spark, cat)),
        "e": lambda: noop(to_spark(pe, spark, cat)),
    }, args.runs)
    t_text, t_expl = r["t"], r["e"]
    results["chain_textual"], results["chain_explored"] = t_text, t_expl
    table.append(("dim-chain join order (no broadcast)", t_text, t_expl))

    # ---- 1b. Q5, shuffle regime: textual vs explored ------------------
    q5 = (
        "select n_name, "
        "cast(sum(cast(l_extendedprice as decimal(12,2)) "
        "  * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) as revenue "
        "from customer "
        "join orders on c_custkey = o_custkey "
        "join lineitem on l_orderkey = o_orderkey "
        "join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey "
        "join nation on s_nationkey = n_nationkey "
        "join region on n_regionkey = r_regionkey "
        "where r_name = 'ASIA' "
        "and o_orderdate >= '1996-01-01' and o_orderdate < '1997-01-01' "
        "group by n_name"
    )
    pt5 = planner(shuffle_cm, no_explore).optimize(parse_sql(q5, cat))
    pe5 = planner(shuffle_cm, no_eager).optimize(parse_sql(q5, cat))
    r = race(spark, {
        "t": lambda: noop(to_spark(pt5, spark, cat)),
        "e": lambda: noop(to_spark(pe5, spark, cat)),
    }, args.runs)
    t_text5, t_expl5 = r["t"], r["e"]
    results["q5_textual"], results["q5_explored"] = t_text5, t_expl5
    table.append(("TPC-H Q5 join order (no broadcast)", t_text5, t_expl5))

    # ---- 2. salted aggregate: plain vs cost-picked ---------------------
    agg_plan = (
        LogicalPlanBuilder()
        .scan("skewdocs", columns=["doc_id", "lang"])
        .aggregate(
            [col("lang")],
            [
                Alias(Func("collect_list", (col("doc_id"),)), "_ids"),
                Alias(Func("count", ()), "n"),
            ],
        )
        .projection(
            [col("lang"), col("n"),
             Alias(Func("size", (col("_ids"),)), "n_ids")]
        )
        .build()
    )
    # recalibrated r7: the byte-honest stage-2 term keeps the PLAIN
    # aggregate (the measured winner below); the salted alternative is
    # constructed directly so the race's verdict stays measured
    qp_plain = planner(None, no_salt_agg)
    phys_plain = qp_plain.optimize(agg_plan)
    assert not any(
        isinstance(n.operator, P.PhysicalSaltedHashAggregate)
        for n in phys_plain.nodes_bottom_up()
    )
    chosen = planner(None, no_eager).optimize(agg_plan)
    assert not any(
        isinstance(n.operator, P.PhysicalSaltedHashAggregate)
        for n in chosen.nodes_bottom_up()
    ), "recalibrated race must keep the plain aggregate"
    from datafusion_dolomite_spark.plans.plan import Plan, PlanNode

    phys_salt = Plan(
        PlanNode(
            P.PhysicalSaltedHashAggregate(
                group_exprs=(col("lang"),),
                agg_exprs=(
                    Alias(Func("collect_list", (col("doc_id"),)), "_ids"),
                    Alias(Func("count", ()), "n"),
                ),
            ),
            [
                PlanNode(
                    P.PhysicalTableScan(
                        "skewdocs", columns=("doc_id", "lang")
                    ),
                    [],
                )
            ],
        )
    )
    r = race(spark, {
        "p": lambda: noop(to_spark(phys_plain, spark, cat)),
        "s": lambda: noop(to_spark(phys_salt, spark, cat)),
    }, args.runs)
    t_plain, t_salt = r["p"], r["s"]
    results["agg_plain"], results["agg_salted"] = t_plain, t_salt
    table.append(("payload agg, 20M rows, 43%-hot key (CHOSEN plain vs rejected salted)", t_plain, t_salt))

    # ---- 3. salted/replicated join: plain vs cost-picked ---------------
    dim = (
        LogicalPlanBuilder()
        .scan("documents", columns=["lang"])  # 0.5M-row build side
        .aggregate([col("lang")], [Alias(Func("count", ()), "lang_n")])
        .projection([Alias(col("lang"), "lang_d"), col("lang_n")])
    )
    join_plan = (
        LogicalPlanBuilder()
        .scan("skewdocs", columns=["doc_id", "lang"])
        .join(dim, JoinType.INNER, BinOp("=", col("lang"), col("lang_d")))
        .aggregate(
            [col("lang")],
            [Alias(Func("count", ()), "n"),
             Alias(Func("max", (col("lang_n"),)), "ln")],
        )
        .build()
    )
    qpj_plain = planner(shuffle_cm, no_salt_join)
    qpj_salt = planner(shuffle_cm, no_eager)
    pj_salt = qpj_salt.optimize(join_plan)
    assert any(
        isinstance(n.operator, P.PhysicalSaltedReplicateJoin)
        for n in pj_salt.nodes_bottom_up()
    ), "cost race must pick the salted join on the hot probe key"
    pj_plain = qpj_plain.optimize(join_plan)
    assert not any(
        isinstance(n.operator, P.PhysicalSaltedReplicateJoin)
        for n in pj_plain.nodes_bottom_up()
    )
    r = race(spark, {
        "p": lambda: noop(to_spark(pj_plain, spark, cat)),
        "s": lambda: noop(to_spark(pj_salt, spark, cat)),
    }, args.runs)
    tj_plain, tj_salt = r["p"], r["s"]
    results["join_plain"], results["join_salted"] = tj_plain, tj_salt
    table.append(("hot-key join, 20M-row probe (plain shuffle vs salted)", tj_plain, tj_salt))

    # ---- 4. eager aggregation: off vs on (shuffle regime) --------------
    ea = (
        "select c_nationkey, count(*) as n, "
        "cast(sum(cast(o_totalprice as decimal(12,2))) as double) as total "
        "from orders join customer on o_custkey = c_custkey "
        "group by c_nationkey"
    )
    p_off = planner(shuffle_cm, no_eager).optimize(parse_sql(ea, cat))
    p_on = planner(shuffle_cm, None).optimize(parse_sql(ea, cat))
    r = race(spark, {
        "off": lambda: noop(to_spark(p_off, spark, cat)),
        "on": lambda: noop(to_spark(p_on, spark, cat)),
    }, args.runs)
    t_off, t_on = r["off"], r["on"]
    results["eager_off"], results["eager_on"] = t_off, t_on
    table.append(("orders x customer rollup (eager agg off vs on)", t_off, t_on))

    # ---- 5. regime switches at DEFAULT thresholds ----------------------
    # stats prediction: supplier/nation/region broadcast at 10x, the
    # 6M-row lineitem never does; customer (150k) still fits the byte
    # budget.  Verify against the chosen plan.
    qp_def = planner(None, no_eager)
    p_def = qp_def.optimize(parse_sql(chain, cat))

    def ops(plan, klass):
        return [n for n in plan.nodes_bottom_up() if isinstance(n.operator, klass)]

    n_bcast = len(ops(p_def, P.PhysicalBroadcastHashJoin))
    assert n_bcast >= 1, p_def.explain()

    def tables_under(node):
        out = set()
        if isinstance(node.operator, P.PhysicalTableScan):
            out.add(node.operator.table_name)
        for c in node.inputs:
            out |= tables_under(c)
        return out

    for n in ops(p_def, P.PhysicalBroadcastHashJoin):
        build_tabs = tables_under(n.inputs[1])
        assert "lineitem" not in build_tabs, p_def.explain()
    results["default_regime_broadcasts"] = n_bcast
    table.append(("regime check: dims broadcast, fact never", "-", f"{n_bcast} bcast joins"))

    # ---- report ---------------------------------------------------------
    print("\n| race | baseline s | cost-picked s | speedup |")
    print("|---|---|---|---|")
    for name, a, b in table:
        if isinstance(a, float) and isinstance(b, float):
            print(f"| {name} | {a} | {b} | {a / b:.2f}x |")
        else:
            print(f"| {name} | {a} | {b} | - |")
    print(json.dumps({"scaled_rows": rows, "results": results}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
