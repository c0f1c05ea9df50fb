"""Per-query measurement harness for the optimization rounds (guide §1).

For each named query (default: all), measures separately:
  * plan_sec  — time for ``fn(spark, sf_dir)`` to RETURN a DataFrame
                (our Python optimizer: builder/SQL -> Hep -> Cascades ->
                to_spark, plus Spark analysis)
  * exec_sec  — warm noop-sink execution time (min of 2, after 1 warm-up)
and optionally dumps ``explain('formatted')`` to ``plans/r13/<q>_<tag>.txt``.

Usage:
    python scripts/measure_queries.py [--plans TAG] [--runs N] [q_name ...]

Prints one JSON line per query so runs can be diffed, plus a summary.
This script is measurement-only: it never changes what a query computes.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_tag = None
    runs = 2
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_tag = args[1]
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from datafusion_dolomite_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("ddspark-measure")
    qs = entry_mod.queries()
    names = args if args else list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    plans_dir = os.path.join(repo, "plans", os.environ.get("PLANS_ROUND", "r14"))
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            plan_sec = time.perf_counter() - t0
            if plans_tag:
                p = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
                ) as f:
                    f.write(p)
            # warm-up
            df.write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            best = float("inf")
            replan = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                df2 = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df2.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                replan = min(replan, t1 - t0)
                best = min(best, t2 - t1)
                spark.catalog.clearCache()
            rec = {
                "plan_cold_sec": round(plan_sec, 4),
                "plan_warm_sec": round(replan, 4),
                "exec_sec": round(best, 4),
                "total_sec": round(replan + best, 4),
            }
        except Exception as e:
            rec = {"error": f"{type(e).__name__}: {e}"}
        finally:
            spark.catalog.clearCache()
            import gc

            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    ok = {n: r for n, r in out.items() if "error" not in r}
    print(
        json.dumps(
            {
                "summary": {
                    "n": len(out),
                    "n_err": len(out) - len(ok),
                    "plan_warm_total": round(
                        sum(r["plan_warm_sec"] for r in ok.values()), 2
                    ),
                    "exec_total": round(
                        sum(r["exec_sec"] for r in ok.values()), 2
                    ),
                    "total": round(
                        sum(r["total_sec"] for r in ok.values()), 2
                    ),
                }
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
