"""ncells scale bench (r13, VERDICT r12 item 4): does lifting the
``derive_ncells`` clamp (4096 → 65536) keep SemDeDup/IVF per-cell work
FLAT at 1M+ vectors?

The quadratic term is Σ_cell n_c·(n_c−1)/2.  At 1M vectors the old
clamp pins ncells = 4096 → ~244 vectors/cell → ~30k pairs/cell; the
lifted clamp derives 16384 → ~61/cell → ~1.8k pairs/cell — the same
per-cell work a 100k corpus pays, which is the whole point.  This
script MEASURES it on synthetic vectors: assignment runs the real
``_assign_cells_pandas`` Arrow core over hash centroids (kmeans off —
the clamp story is cell COUNT, not centroid quality), then per-cell
occupancy aggregates give the work terms.  Wall-clock for the
assignment is reported too (it is the only step whose cost grows with
ncells — O(rows · ncells · dim), one BLAS-class pass).

Synthetic data: deterministic per-row hash vectors (no Date.now, no
RNG seed drift) — ``sin``-free integer-hash doubles in [-1, 1], the
same family the engine's hash centroids use, generated JVM-side.

Run: python scripts/ncells_scale_bench.py [n_vectors]   (default 2^20)

Measured (this box, local[32], 2^20 vectors, dim 64, r13):

  layout     ncells  mean/cell  max/cell  pairs/cell  within-cell pairs
  clamp4096    4096      256.0       339     32808.3        134,382,715
  derived     16384       64.0        99      2049.5         33,579,072

The derived layout's ~2049 pairs/cell equals the 64k-vector corpus's
(2052) and the 262k corpus's (2049) — per-cell work IS flat across a
16× corpus growth, which is what the clamp lift buys.  Assignment cost
grows with ncells (375 s → 1654 s for the one-time build pass at 1M —
O(rows · ncells · dim) even after the r13 dimension-outer rewrite);
the within-cell quadratic it removes grows with n²/ncells, which at
100 TB dwarfs it.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_dolomite_spark.session import get_spark  # noqa: E402
from datafusion_dolomite_spark.functions.similarity import (  # noqa: E402
    _assign_cells_pandas,
    _hash_vec,
    derive_ncells,
)

DIM = 64


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    spark = get_spark(
        "ncells-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    # deterministic synthetic corpus: vec[d] = hash-double(id, d)
    vec = (
        "transform(sequence(0, %d), d -> "
        "((conv(substring(md5(concat(cast(id as string), '_', "
        "cast(d as string))), 1, 15), 16, 10) %% 2001) - 1000) / 1000.0)"
        % (DIM - 1)
    )
    df = (
        spark.range(n)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(F.col("id").alias("vec_id"), F.expr(vec).alias("embedding"))
        .persist()
    )
    df.count()

    derived = derive_ncells(n)
    rows = []
    for label, ncells in (("clamp4096", min(4096, derived)),
                          ("derived", derived)):
        cents = [(i, _hash_vec(f"c{i}")) for i in range(ncells)]
        t0 = time.monotonic()
        assigned = _assign_cells_pandas(
            df.select(F.col("vec_id"), F.col("embedding").alias("_cv")),
            "_cv", cents,
        ).select("vec_id", "_cell")
        occ = (
            assigned.groupBy("_cell").count()
            .agg(
                F.count(F.lit(1)).alias("cells_used"),
                F.max("count").alias("max_cell"),
                F.avg("count").alias("mean_cell"),
                F.sum(F.expr("count * (count - 1) / 2")).alias("pairs"),
            )
            .collect()[0]
        )
        assign_sec = time.monotonic() - t0
        rows.append({
            "layout": label,
            "ncells": ncells,
            "cells_used": int(occ["cells_used"]),
            "max_cell_pop": int(occ["max_cell"]),
            "mean_cell_pop": round(float(occ["mean_cell"]), 1),
            "within_cell_pairs": int(occ["pairs"]),
            "pairs_per_cell": round(float(occ["pairs"]) / ncells, 1),
            "assign_sec": round(assign_sec, 2),
        })
    out = {
        "bench": "ncells_scale",
        "n_vectors": n,
        "dim": DIM,
        "derive_ncells": derived,
        "all_pairs": n * (n - 1) // 2,
        "log2_reduction_derived": round(
            math.log2((n * (n - 1) / 2)
                      / max(rows[-1]["within_cell_pairs"], 1)), 1),
        "layouts": rows,
    }
    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
