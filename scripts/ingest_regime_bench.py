"""Ingestion-regime wall-clock proof for incremental dedup (r8).

The claim on the box (`functions/dedup.py::incremental_minhash_dedup`):
per-batch dedup cost tracks the BATCH, not the history — the history
exists only as the persisted banded-signature index, probed with
bucket-sized joins.  At 100 TB this is the difference between an
ingestion pipeline and a nightly full recompute.

Corpus: documents x100 (~0.5M docs) with per-replica TEXT SALTING
(every word gets a replica prefix, so replicas are NOT near-dups of
each other and LSH bucket sizes stay realistic — plain key-shift
replication would give every doc ~100 exact twins and measure a
pathological dup-rate, not the ingestion shape).  Natural near-dups
survive WITHIN each replica.

  1. build the signature index over the HISTORY (replicas 0..89);
  2. ingest replica 90 (~1%) INCREMENTALLY (probe + append) — measured;
  3. the counterfactual: recompute near-dup pairs over history ∪ batch
     from scratch (`minhash_verified_pairs`) — what every ingest costs
     without an index — measured;
  4. scaling-in-batch: read-only probes of a 1% and a 10% slice of a
     FRESH replica (never indexed, so no self-matches) — per-batch
     cost must track |batch|, not |history|.

Every step starts from a cleared cache (the library persists its
reused frames internally; canonical-plan cache hits would otherwise
let later steps free-ride).

Usage: python scripts/ingest_regime_bench.py [--sf-dir DIR]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 100
STRIDE = 100_000_000


def build_salted(spark, sf_dir: str, dest: str) -> None:
    """documents x REPLICAS: doc_id key-shifted AND every word prefixed
    with the replica tag — replicas share no shingles.  History, the
    ingest batch (replica 90) and a re-salted never-indexed probe
    replica land in SEPARATE directories, the way batches arrive in a
    real ingest — measuring a probe must not pay a scan of the whole
    corpus just to slice its batch out."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(dest, "history", "_SUCCESS")):
        return
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    rep = df.withColumn(
        "_r", F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)]))
    )
    rep = rep.select(
        (F.col("doc_id") + F.col("_r").cast("bigint") * F.lit(STRIDE)).alias(
            "doc_id"
        ),
        F.col("_r"),
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(F.lit("r"), F.col("_r").cast("string"),
                                   F.lit("_"), w),
            ),
        ).alias("text"),
    )
    rep.filter(F.col("_r") <= 89).drop("_r").repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "history"))
    batch = rep.filter(F.col("_r") == 90).drop("_r")
    batch.repartition(4).write.mode("overwrite").parquet(
        os.path.join(dest, "batch")
    )
    probe = batch.select(
        (F.col("doc_id") + F.lit(200 * STRIDE)).alias("doc_id"),
        F.regexp_replace("text", "r90_", "p_").alias("text"),
    )
    probe.repartition(4).write.mode("overwrite").parquet(
        os.path.join(dest, "probe")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.functions.dedup import (
        incremental_minhash_dedup,
        minhash_verified_pairs,
    )
    from datafusion_dolomite_spark.session import get_spark

    spark = get_spark("ingest-regime")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(root, "spark-warehouse", "scale100_salted_docs")
    print(f"ensuring salted corpus under {dest} ...", file=sys.stderr)
    build_salted(spark, args.sf_dir, dest)

    history = spark.read.parquet(os.path.join(dest, "history"))
    batch = spark.read.parquet(os.path.join(dest, "batch"))
    corpus = history.unionByName(batch)  # = history ∪ batch
    n_hist, n_batch = history.count(), batch.count()
    n_total = n_hist + n_batch
    # fresh never-indexed probe replica (no self-matches in the index)
    probe10 = spark.read.parquet(os.path.join(dest, "probe"))
    probe1 = probe10.filter(F.pmod("doc_id", F.lit(10)) == 0)
    n_p1 = probe1.count()
    print(
        f"docs={n_total} history={n_hist} batch={n_batch} probe1={n_p1}",
        file=sys.stderr,
    )

    idx = os.path.join(root, "spark-warehouse", "ingest_regime_index")
    shutil.rmtree(idx, ignore_errors=True)

    def fresh():
        spark.catalog.clearCache()

    fresh()
    t0 = time.perf_counter()
    _, n_indexed = incremental_minhash_dedup(
        spark, history, idx, "doc_id", "text", batch_label="history"
    )
    t_build = time.perf_counter() - t0

    fresh()
    t0 = time.perf_counter()
    r, _ = incremental_minhash_dedup(
        spark, batch, idx, "doc_id", "text", batch_label="b9"
    )
    dropped = r.filter("not kept").count()
    t_ingest = time.perf_counter() - t0

    fresh()
    t0 = time.perf_counter()
    pairs = minhash_verified_pairs(
        corpus, "doc_id", "text", k=3, num_hashes=12, bands=3,
        threshold_1000=500,
    )
    n_pairs = pairs.count()
    t_full = time.perf_counter() - t0

    def probe(df):
        fresh()
        t0 = time.perf_counter()
        res, _ = incremental_minhash_dedup(
            spark, df, idx, "doc_id", "text",
            batch_label="probe", update_index=False,
        )
        # force the FULL verdict computation (a bare count can satisfy
        # itself without the agreement scores)
        res.filter("not kept").count()
        return time.perf_counter() - t0

    t_probe1 = probe(probe1)
    t_probe10 = probe(probe10)

    print("\n| step | docs touched | sec |")
    print("|---|---|---|")
    print(f"| index build (one-time history) | {n_hist} | {t_build:.1f} |")
    print(f"| incremental ingest of 10% batch | {n_batch} | {t_ingest:.1f} |")
    print(f"| full recompute (no index) | {n_total} | {t_full:.1f} |")
    print(f"| read-only probe, 1% batch | {n_p1} | {t_probe1:.1f} |")
    print(f"| read-only probe, 10% batch | {n_batch} | {t_probe10:.1f} |")
    print(
        f"\nincremental ingest vs full recompute: {t_full / t_ingest:.2f}x"
    )
    print(json.dumps({
        "ingest_regime": {
            "docs": n_total, "history": n_hist,
            "index_rows": n_indexed, "dropped": dropped,
            "pairs_full": n_pairs,
            "t_build": round(t_build, 2),
            "t_ingest": round(t_ingest, 2),
            "t_full_recompute": round(t_full, 2),
            "t_probe1": round(t_probe1, 2),
            "t_probe10": round(t_probe10, 2),
            "speedup_vs_recompute": round(t_full / t_ingest, 2),
        }
    }))
    spark.stop()


if __name__ == "__main__":
    main()
