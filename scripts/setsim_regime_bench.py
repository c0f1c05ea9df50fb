"""Set-similarity-join regime bench (r10): PPJoin prefix filtering vs
the naive all-pairs-verify baseline as the corpus grows.

The naive baseline joins every cross-side doc pair that shares ANY
token and verifies each — O(sum over tokens of bucket²) candidates.
Prefix filtering bounds candidates to pairs sharing a token inside the
|x| − ⌈t·|x|⌉ + 1 rarest-token prefix (AllPairs bound), plus a length
filter — the same verified output, far fewer verified pairs.

Both strategies run on replicated copies of the documents table
(doc_id offset per copy so replicas are near-dup CLUSTERS, not exact
byte duplicates of the id space); counts must agree at every size.

Run: python scripts/setsim_regime_bench.py [max_mult]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dolomite_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = 800
GRAM = 2


def naive_pairs(df, threshold_1000):
    """All-pairs-sharing-a-token baseline: exact same output, no prefix
    or length filter — candidates explode with bucket size."""
    from pyspark.sql import functions as F

    pre = df.select(
        F.col("doc_id").alias("_id"),
        F.col("side").alias("_side"),
        F.expr(
            "split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')"
        ).alias("_sp"),
    )
    toks = (
        "array_distinct(transform(sequence(1, size(_sp) - 1), "
        "i -> concat(element_at(_sp, i), ' ', element_at(_sp, i + 1))))"
    )
    base = (
        pre.filter(F.expr("size(_sp) >= 2"))
        .select("_id", "_side", F.expr(toks).alias("_toks"))
        .cache()
    )
    tok0 = base.select("_id", "_side", F.explode("_toks").alias("_tok"))
    a = tok0.select(
        F.col("_id").alias("d1"), F.col("_side").alias("_da"), "_tok"
    )
    b = tok0.select(
        F.col("_id").alias("d2"), F.col("_side").alias("_db"), "_tok"
    )
    cand = (
        a.join(b, "_tok")
        .filter(F.col("_da") < F.col("_db"))
        .select("d1", "d2")
        .distinct()
    )
    ga = base.select(F.col("_id").alias("d1"), F.col("_toks").alias("_ga"))
    gb = base.select(F.col("_id").alias("d2"), F.col("_toks").alias("_gb"))
    inter = F.size(F.array_intersect(F.col("_ga"), F.col("_gb")))
    union = F.size("_ga") + F.size("_gb") - inter
    return (
        cand.join(ga, "d1")
        .join(gb, "d2")
        .select(
            "d1", "d2",
            F.floor(1000.0 * inter / union).cast("bigint").alias("jaccard_1000"),
        )
        .filter(F.col("jaccard_1000") >= threshold_1000)
    )


def main():
    max_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(
        "setsim-regime", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.functions.dedup import set_sim_join_pairs

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n0 = docs.count()
    print(f"base docs: {n0} at {SF_DIR}; gram={GRAM} t={THRESHOLD}")
    print(f"{'mult':>4} {'docs':>8} {'ppjoin_s':>9} {'naive_s':>9} "
          f"{'speedup':>8} {'pairs':>8}")
    mult = 1
    while mult <= max_mult:
        reps = spark.range(mult).select(F.col("id").alias("_rep"))
        corpus = (
            docs.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("_rep") * n0).alias("doc_id"), "text"
            )
            .withColumn("side", F.col("doc_id") % 2)
        ).cache()
        corpus.count()

        t0 = time.time()
        n_pp = set_sim_join_pairs(
            corpus, "doc_id", "text", "side", GRAM, THRESHOLD
        ).count()
        t_pp = time.time() - t0

        t0 = time.time()
        n_nv = naive_pairs(corpus, THRESHOLD).count()
        t_nv = time.time() - t0

        assert n_pp == n_nv, f"count mismatch at mult={mult}: {n_pp} vs {n_nv}"
        print(
            f"{mult:>4} {n0 * mult:>8} {t_pp:>9.2f} {t_nv:>9.2f} "
            f"{t_nv / t_pp:>7.1f}x {n_pp:>8}"
        )
        spark.catalog.clearCache()
        mult *= 2
    spark.stop()


if __name__ == "__main__":
    main()
