"""Deletion-vector regime bench: merge-on-read vs copy-on-write.

Two workload classes on orders at sf0.1 written as 16 files clustered
by o_orderkey:

* SCATTERED delete — predicate on o_custkey (uncorrelated with the
  file clustering) matches rows in EVERY file: the file-pruned CoW
  rewrite provably degenerates to a full-table rewrite (its pruner
  keeps 0 files), while the DV path writes only the (file, row-index)
  marks.  This is the workload DVs exist for (GDPR-style row deletes).
* CLUSTERED delete — predicate on o_orderkey confined to one file's
  key range: CoW's footer pruning rewrites 1 file, the DV marks 1
  file, and dv_scan confines the follow-up scan's anti-join to that
  one dirty file (the other 15 scan plainly, zero probe tax).

Measured per trial (fresh table per statement, interleaved modes):
  * DELETE statement wall-clock  (the write path)
  * follow-up aggregate scan     (the read tax of the anti-join)
  * BYTES WRITTEN by the statement (new data files + sidecar) — the
    quantity that actually decides the regime at 100 TB, where the
    write path is object-store bandwidth: CoW writes O(table) bytes on
    a scattered delete, DV writes O(matched) — the wall-clock ratio on
    a page-cached local run understates this by orders of magnitude.

Both modes scan O(table) to FIND matches; the optional scale factor
replicates the base table to show how each cost term moves with table
size.

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


def _dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _new_bytes(head, base_inodes):
    """Bytes the statement actually WROTE: data files whose inode is
    not carried from base, plus the whole DV sidecar."""
    total = 0
    for f in dml.data_files(head):
        if os.stat(f).st_ino not in base_inodes:
            total += os.path.getsize(f)
    dvp = dml.dv_path(head)
    if os.path.isdir(dvp):
        total += _dir_bytes(dvp)
    return total


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(
        "dv-regime", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
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
    base_bytes = _dir_bytes(base)
    # clustered-delete threshold: ~1/16 of the key space (first file)
    lo_key = spark.read.parquet(base).selectExpr(
        "approx_percentile(o_orderkey, 0.06) as q"
    ).collect()[0]["q"]
    print(
        f"base: {total} rows in {n_files} files "
        f"({base_bytes / 1e6:.1f} MB, clustered by o_orderkey)"
    )

    workloads = {
        "scattered": "delete from o where o_custkey % 97 = 0",
        "clustered": f"delete from o where o_orderkey < {lo_key}",
    }
    results: dict = {
        (w, m): {"del": [], "scan": []}
        for w in workloads
        for m in ("cow", "dv")
    }
    written: dict = {}
    base_inodes = {os.stat(f).st_ino for f in dml.data_files(base)}
    for t in range(trials):
        for w, stmt in workloads.items():
            for mode in ("cow", "dv"):
                cat = Catalog(warehouse=os.path.join(work, f"wh_{w}_{mode}_{t}"))
                cat.register("o", base)
                qp = QueryPlanner(spark, cat)
                if mode == "dv":
                    qp.sql(
                        "alter table o set tblproperties "
                        "('delete_mode'='merge-on-read')"
                    ).count()
                t0 = time.monotonic()
                qp.sql(stmt).count()
                t1 = time.monotonic()
                r = qp.sql(
                    "select cast(count(*) as bigint) as n, "
                    "cast(sum(o_totalprice) as double) as s from o"
                ).collect()[0]
                t2 = time.monotonic()
                results[(w, mode)]["del"].append(t1 - t0)
                results[(w, mode)]["scan"].append(t2 - t1)
                if t == 0:
                    head = cat.path("o")
                    head_inodes = {
                        os.stat(f).st_ino for f in dml.data_files(head)
                    }
                    written[(w, mode)] = _new_bytes(head, base_inodes)
                    print(
                        f"  {w}/{mode}: rows after delete {r['n']}, files "
                        f"carried {len(head_inodes & base_inodes)}/{n_files}, "
                        f"new files {len(head_inodes - base_inodes)}, "
                        f"dv sidecar: {dml.has_dv(head)}, "
                        f"bytes written {written[(w, mode)] / 1e6:.2f} MB"
                    )

    def med(xs):
        return statistics.median(xs)

    print(f"\ntrials: {trials} (interleaved, fresh table per statement)")
    for w in workloads:
        c, d = results[(w, "cow")], results[(w, "dv")]
        print(f"\n{w} delete:")
        print(f"{'step':<22}{'CoW':>12}{'DV':>12}{'DV/CoW':>9}")
        print(
            f"{'DELETE statement (s)':<22}{med(c['del']):>12.3f}"
            f"{med(d['del']):>12.3f}{med(d['del']) / med(c['del']):>9.2f}x"
        )
        print(
            f"{'follow-up scan (s)':<22}{med(c['scan']):>12.3f}"
            f"{med(d['scan']):>12.3f}{med(d['scan']) / med(c['scan']):>9.2f}x"
        )
        cb, db = written[(w, "cow")], written[(w, "dv")]
        print(
            f"{'bytes written (MB)':<22}{cb / 1e6:>12.2f}{db / 1e6:>12.2f}"
            f"{db / cb:>9.4f}x"
        )


if __name__ == "__main__":
    main()
