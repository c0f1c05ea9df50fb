"""ANN regime bench: brute vs PQ-ADC vs IVF-PQ as the corpus grows.

Separates the ONE-TIME index build (PQ encoding, cell assignment —
amortized across every future query) from the PER-QUERY-SET cost
(what a serving path pays), the split the knn_* driver queries can't
show because each runs build+query in one lineage.  Also reports the
BYTES story: the codes table a PQ query scans vs the vector table a
brute scan reads — at 100 TB of embeddings that ratio, not local
wall-clock, decides the regime (same argument as the DV bench's
bytes-written column).

Per trial (interleaved, warm):
  * brute  — exact cosine over the full vector table
  * pq     — ADC over the persisted codes table + exact re-rank of the
             top-``refine`` (point-fetches only those vectors)
  * ivfpq  — ADC confined to ``nprobe`` probed cells' codes

Run: python scripts/ann_regime_bench.py [n_trials] [scale]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dolomite_spark.session import get_spark  # noqa: E402
from datafusion_dolomite_spark.functions import similarity as S  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NQ, K, M, KSUB, REFINE, NPROBE = 5, 10, 8, 16, 50, 3


def _dir_bytes(path):
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(
        "ann-regime", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="ann_bench_")
    src = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n0 = src.count()
    if scale > 1:
        src = (
            spark.range(scale)
            .crossJoin(src)
            .select(
                (F.col("vec_id") + F.col("id") * 10_000_000).alias("vec_id"),
                "embedding",
            )
        )
    corpus_path = os.path.join(work, "corpus")
    src.repartition(16).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    ncells = S.derive_ncells(n)
    sw = S.DIM // M

    # ---- one-time index build: cells + codes, persisted --------------
    t0 = time.monotonic()
    enc = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv")
    )
    enc = S._best_cell_pandas(enc, "_cv", ncells)
    enc = S._pq_encode_pandas(enc, "_cv", M, sw, KSUB)
    codes_path = os.path.join(work, "codes")
    enc.select("neighbor_id", "_cell", "_codes").write.parquet(codes_path)
    build_s = time.monotonic() - t0
    vec_bytes, code_bytes = _dir_bytes(corpus_path), _dir_bytes(codes_path)
    print(
        f"corpus: {n} vectors ({n0}×{scale}), {vec_bytes / 1e6:.1f} MB; "
        f"index build {build_s:.2f} s → codes {code_bytes / 1e6:.2f} MB "
        f"({code_bytes / vec_bytes:.4f}× of the vectors), {ncells} cells"
    )
    codes = spark.read.parquet(codes_path)

    # ---- query phases -------------------------------------------------
    books = S._pq_books(M, sw, KSUB)
    q = corpus.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    ).withColumn("_dqv", F.expr(S._dvec("_qv")))
    lut_terms = []
    for j in range(M):
        qs = f"slice(_dqv, {j * sw + 1}, {sw})"
        for cc, bv in books[j]:
            lit = "array(" + ", ".join(f"{v!r}D" for v in bv) + ")"
            lut_terms.append(
                f"aggregate(zip_with({qs}, {lit}, (x, y) -> x * y), "
                f"cast(0.0 as double), (acc, v) -> acc + v)"
            )
    q_lut = q.withColumn(
        "_lut", F.expr("array(" + ", ".join(lut_terms) + ")")
    )
    score = " + ".join(
        f"element_at(_lut, {j * KSUB} + element_at(_codes, {j + 1}) + 1)"
        for j in range(M)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )

    def _finish(cand):
        """exact re-rank: point-fetch only the candidate vectors."""
        cand = cand.join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("_cv"),
            ),
            "neighbor_id",
        ).withColumn("_sim", F.expr(S._cos_sql(S._dvec("_qv"), S._dvec("_cv"))))
        return (
            cand.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= K)
            .select("query_id", "neighbor_id", "rank")
        )

    def brute():
        return S.knn_brute(corpus, "vec_id", "embedding", NQ, K).count()

    def pq():
        scored = codes.join(
            F.broadcast(q_lut.select("query_id", "_lut", "_qv")),
            F.col("neighbor_id") != F.col("query_id"),
        ).withColumn("_score", F.expr(score))
        cand = scored.withColumn("_pr", F.row_number().over(wq)).filter(
            F.col("_pr") <= REFINE
        ).select("query_id", "neighbor_id", "_qv")
        return _finish(cand).count()

    def ivfpq():
        qc = S._probe_cells_pandas(q_lut, "_qv", ncells, NPROBE)
        qc = qc.select(
            "query_id", "_lut", "_qv", F.explode("_probe").alias("_cell")
        )
        scored = codes.join(F.broadcast(qc), ["_cell"]).filter(
            F.col("neighbor_id") != F.col("query_id")
        ).withColumn("_score", F.expr(score))
        cand = scored.withColumn("_pr", F.row_number().over(wq)).filter(
            F.col("_pr") <= REFINE
        ).select("query_id", "neighbor_id", "_qv")
        return _finish(cand).count()

    runs = {"brute": brute, "pq": pq, "ivfpq": ivfpq}
    for fn in runs.values():
        fn()  # warm-up
    results = {k: [] for k in runs}
    for _ in range(trials):
        for name, fn in runs.items():
            t0 = time.monotonic()
            fn()
            results[name].append(time.monotonic() - t0)

    b = statistics.median(results["brute"])
    print(f"\ntrials: {trials} (interleaved, warm; query phase only)")
    print(f"{'path':<8}{'median s':>10}{'vs brute':>10}")
    for name in ("brute", "pq", "ivfpq"):
        m_ = statistics.median(results[name])
        print(f"{name:<8}{m_:>10.3f}{m_ / b:>10.2f}x")


if __name__ == "__main__":
    main()
