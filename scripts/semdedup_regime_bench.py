"""SemDeDup regime bench: cell-bucketed candidate pairs (the persisted
ANN index's trained IVF cells) vs brute-force all-pairs cosine (r12 —
VERDICT r11 item 5).

The quadratic term is the whole story: all-pairs scores n²/2 vector
pairs; the cell-bucketed pass scores Σ_cell (n_c²/2) ≈ n²/(2·ncells)
when cells are balanced — the SemDeDup trick, here riding the coarse
quantizer the persisted index already trained.  Reports both the pair
counts (the scale argument — at 100 TB the ratio IS the feasibility
gap) and local wall-clock.  Recall note: cell-bucketing is a candidate
FILTER — a cross-cell near-dup pair is missed by construction; the
bench reports the above-threshold pair coverage so that trade is a
measured number, not an assumption.

Run: python scripts/semdedup_regime_bench.py [n_trials]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_dolomite_spark.session import get_spark  # noqa: E402
from datafusion_dolomite_spark.functions.ann_index import (  # noqa: E402
    ann_index_build,
)
from datafusion_dolomite_spark.functions.similarity import (  # noqa: E402
    _cos_sql,
    _dvec,
    semantic_dedup_cc,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCELLS, THR = 32, 300


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        "semdedup-regime", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    ).persist()
    n = emb.count()

    idx = tempfile.mkdtemp(prefix="semdedup_regime_") + "/idx"
    t0 = time.monotonic()
    ann_index_build(emb, idx, "vec_id", "embedding", m=8, ksub=16,
                    ncells=NCELLS, residual=True, kmeans_iters=2)
    build_sec = time.monotonic() - t0
    cells = spark.read.parquet(idx).select(
        F.col("neighbor_id").alias("vec_id"), F.col("cell")
    ).persist()
    cells.count()
    # r13: multi-probe assignment (primary + runner-up cell)
    cells_mp = spark.read.parquet(idx).select(
        F.col("neighbor_id").alias("vec_id"), F.col("cell"), F.col("cell2")
    ).persist()
    cells_mp.count()

    # pair-count story (the scale argument)
    cell_pairs = (
        cells.groupBy("cell").count()
        .select(F.sum(F.expr("count * (count - 1) / 2")).alias("p"))
        .collect()[0]["p"]
    )
    all_pairs = n * (n - 1) // 2

    def scored(pairs_df):
        return pairs_df.withColumn(
            "_c", F.floor(1000.0 * F.expr(_cos_sql(_dvec("_v1"), _dvec("_v2"))))
            .cast("bigint")
        ).filter(F.col("_c") >= THR)

    a = emb.select(F.col("vec_id").alias("_lo"), F.col("embedding").alias("_v1"))
    b = emb.select(F.col("vec_id").alias("_hi"), F.col("embedding").alias("_v2"))

    def run_brute():
        return scored(a.join(b, F.col("_lo") < F.col("_hi"))).count()

    def run_cells():
        return semantic_dedup_cc(emb, cells, "vec_id", "embedding",
                                 threshold_1000=THR).filter("NOT kept").count()

    def run_cells_mp2():
        return semantic_dedup_cc(emb, cells_mp, "vec_id", "embedding",
                                 threshold_1000=THR,
                                 multiprobe=2).filter("NOT kept").count()

    brute_hits = run_brute()  # warm + the coverage denominator
    ac = a.join(cells.withColumnRenamed("vec_id", "_lo"), "_lo")
    bc = b.join(cells.withColumnRenamed("vec_id", "_hi").withColumnRenamed("cell", "cell2"), "_hi")
    cell_hits = scored(
        ac.join(bc, (F.col("cell") == F.col("cell2")) & (F.col("_lo") < F.col("_hi")))
    ).count()
    # r13 multiprobe coverage: shared ANY-of-2-cells candidate pairs
    mp = cells_mp.select(
        "vec_id", F.explode(F.array("cell", "cell2")).alias("c")
    )
    amp = a.join(mp.withColumnRenamed("vec_id", "_lo"), "_lo")
    bmp = b.join(
        mp.withColumnRenamed("vec_id", "_hi").withColumnRenamed("c", "c2"),
        "_hi",
    )
    cell_hits_mp2 = (
        scored(
            amp.join(
                bmp,
                (F.col("c") == F.col("c2")) & (F.col("_lo") < F.col("_hi")),
            )
        )
        .select("_lo", "_hi")
        .distinct()
        .count()
    )
    run_cells()  # warm
    run_cells_mp2()
    times = {"brute_all_pairs": [], "cell_bucketed_cc": [],
             "cell_bucketed_cc_mp2": []}
    for _ in range(n_trials):
        for name, fn in (("brute_all_pairs", run_brute),
                         ("cell_bucketed_cc", run_cells),
                         ("cell_bucketed_cc_mp2", run_cells_mp2)):
            t0 = time.monotonic()
            fn()
            times[name].append(time.monotonic() - t0)

    med = {k: statistics.median(v) for k, v in times.items()}
    print(json.dumps({
        "bench": "semdedup_regime",
        "sf_dir": SF_DIR,
        "n_vectors": n,
        "ncells": NCELLS,
        "threshold_1000": THR,
        "index_build_sec": round(build_sec, 3),
        "pairs_all": int(all_pairs),
        "pairs_in_cells": int(cell_pairs),
        "pair_reduction_x": round(all_pairs / max(cell_pairs, 1), 1),
        "above_thr_pairs_all": brute_hits,
        "above_thr_pairs_in_cells": cell_hits,
        "above_thr_pairs_mp2": cell_hits_mp2,
        "coverage_1probe": round(cell_hits / max(brute_hits, 1), 4),
        "coverage_mp2": round(cell_hits_mp2 / max(brute_hits, 1), 4),
        "brute_sec": round(med["brute_all_pairs"], 3),
        "cell_cc_sec": round(med["cell_bucketed_cc"], 3),
        "cell_cc_mp2_sec": round(med["cell_bucketed_cc_mp2"], 3),
        "n_trials": n_trials,
    }, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
