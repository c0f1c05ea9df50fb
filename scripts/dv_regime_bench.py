"""Deletion-vector regime bench: merge-on-read vs copy-on-write on a
SCATTERED delete — the workload class DVs exist for.

Setup: orders at sf0.1 (150k rows) written as 16 files clustered by
o_orderkey, so a predicate on o_custkey (uncorrelated with the file
clustering) matches rows in EVERY file — the file-pruned CoW rewrite
provably degenerates to a full-table rewrite (its pruner keeps 0
files), while the DV path writes only the (file, row-index) marks.

Measured per trial (fresh table per statement, interleaved modes):
  * DELETE statement wall-clock  (the write path)
  * follow-up aggregate scan     (the read tax of the anti-join)

Both modes scan O(table) to FIND matches; the difference is write
bytes — CoW writes O(table), DV writes O(matched).  The optional
scale factor replicates the base table to show the crossover: CoW's
statement cost grows with the table, DV's stays flat.

Run: python scripts/dv_regime_bench.py [n_trials] [scale]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dolomite_spark import QueryPlanner  # noqa: E402
from datafusion_dolomite_spark.session import get_spark  # noqa: E402
from datafusion_dolomite_spark.sources import dml  # noqa: E402
from datafusion_dolomite_spark.sources.catalog import Catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("dv-regime", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import tempfile

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="dv_bench_")
    base = os.path.join(work, "orders_base")
    src = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    if scale > 1:
        # replicate with shifted keys: bigger table, same match fraction
        src = (
            spark.range(scale)
            .crossJoin(src)
            .select(
                (F.col("o_orderkey") + F.col("id") * 10_000_000).alias(
                    "o_orderkey"
                ),
                (F.col("o_custkey") + F.col("id")).alias("o_custkey"),
                "o_totalprice",
            )
        )
    # CONSTANT file count: scaling grows file SIZE, as real tables do —
    # scaling file COUNT instead would measure the small-files problem
    # (which OPTIMIZE solves), not the rewrite-vs-mark trade
    src.repartitionByRange(16, "o_orderkey").write.parquet(base)
    n_files = len(dml.data_files(base))
    total = spark.read.parquet(base).count()
    print(f"base: {total} rows in {n_files} files (clustered by o_orderkey)")

    results: dict = {"cow": {"del": [], "scan": []}, "dv": {"del": [], "scan": []}}
    for t in range(trials):
        for mode in ("cow", "dv"):
            cat = Catalog(warehouse=os.path.join(work, f"wh_{mode}_{t}"))
            cat.register("o", base)
            qp = QueryPlanner(spark, cat)
            if mode == "dv":
                qp.sql(
                    "alter table o set tblproperties "
                    "('delete_mode'='merge-on-read')"
                ).count()
            # scattered: o_custkey % 97 == 0 matches ~1% of rows in
            # EVERY o_orderkey-clustered file
            t0 = time.monotonic()
            qp.sql("delete from o where o_custkey % 97 = 0").count()
            t1 = time.monotonic()
            r = qp.sql(
                "select cast(count(*) as bigint) as n, "
                "cast(sum(o_totalprice) as double) as s from o"
            ).collect()[0]
            t2 = time.monotonic()
            results[mode]["del"].append(t1 - t0)
            results[mode]["scan"].append(t2 - t1)
            if t == 0:
                head = cat.path("o")
                base_inodes = {os.stat(f).st_ino for f in dml.data_files(base)}
                head_inodes = {os.stat(f).st_ino for f in dml.data_files(head)}
                carried = len(head_inodes & base_inodes)
                print(
                    f"  {mode}: rows after delete {r['n']}, files carried "
                    f"{carried}/{n_files} (unchanged bytes), new files "
                    f"{len(head_inodes - base_inodes)}, dv sidecar: "
                    f"{dml.has_dv(head)}"
                )

    def med(xs):
        return statistics.median(xs)

    print(f"\ntrials: {trials} (interleaved, fresh table per statement)")
    print(f"{'step':<22}{'CoW (s)':>10}{'DV (s)':>10}{'DV/CoW':>9}")
    for step, key in (("DELETE statement", "del"), ("follow-up scan", "scan")):
        c, d = med(results["cow"][key]), med(results["dv"][key])
        print(f"{step:<22}{c:>10.3f}{d:>10.3f}{d / c:>9.2f}x")


if __name__ == "__main__":
    main()
