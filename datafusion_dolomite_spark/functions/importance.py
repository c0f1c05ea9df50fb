"""DSIR-style importance-based data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
selects pretraining documents whose hashed-n-gram feature distribution
looks like a TARGET corpus: estimate bag-of-hashed-ngrams models for
target and raw corpora, score each raw document by its importance
weight, keep the top-scoring docs.

This is the integer-exact distributed version of that recipe:

* features — word BIGRAMS (with multiplicity — term frequency matters)
  hashed into ``n_buckets`` buckets via the engine's shared 60-bit md5
  hash, so Spark and DuckDB agree bucket-for-bucket;
* models — bucket counts for the raw corpus and the target subset in
  ONE aggregate over the per-doc tf table (``n_buckets`` rows out —
  map-side combine collapses everything early);
* weight — instead of float log-likelihood ratios (whose ``ln`` is not
  bit-portable across engines), each bucket gets an integer
  Laplace-smoothed ratio ``⌊scale·(target_b+1)/(raw_b+n_buckets)⌋``
  and a document scores ``Σ tf_b · ratio_b`` — a monotone integer
  surrogate of the DSIR weight, exactly replayable in SQL;
* selection — deterministic top-k by (score DESC, doc_id): compiles to
  TakeOrderedAndProject, never a global sort.  (DSIR proper adds Gumbel
  noise for sampling-without-replacement; the deterministic top-k is
  the testable skeleton — swap the orderer for score+Gumbel(seed) to
  get the paper's sampler.)

Scale shape: one explode + one (doc,bucket) aggregate; the bucket model
is ``n_buckets`` rows and BROADCASTS to the per-doc scoring join; no
all-pairs anywhere, state bounded by n_buckets regardless of corpus
size.  The reference engine has no text surface at all (SURVEY §2.4);
this extends the LLM-pipeline operator family (dedup.py, text.py).
"""

from __future__ import annotations

__all__ = ["importance_resample"]


def importance_resample(
    df,
    id_col: str,
    text_col: str,
    target_col: str,
    k: int = 50,
    n_buckets: int = 1024,
    scale: int = 1_000_000,
):
    """Top-``k`` docs of ``df`` by hashed-bigram importance score
    against the subset flagged by boolean column ``target_col``.
    Returns (doc_id, score) — deterministic, unique-tie-broken."""
    from pyspark.sql import functions as F

    pre = df.select(
        F.col(id_col).alias("_id"),
        F.expr(f"split(lower(trim({text_col})), '\\\\s+')").alias("_w"),
        F.col(target_col).alias("_t"),
    )
    grams = pre.filter(F.expr("size(_w) >= 2")).select(
        "_id",
        "_t",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_w) - 1), "
                "i -> concat_ws(' ', slice(_w, i, 2)))"
            )
        ).alias("_g"),
    )
    # cached (r13, guide §2.4): tf feeds BOTH the bucket-model aggregate
    # and the scoring join's probe side — uncached, the explode + md5 +
    # per-doc aggregate pipeline executes twice per query.  At warehouse
    # scale this is the intermediate a real DSIR pass writes out once.
    tf = (
        grams.select(
            "_id",
            "_t",
            F.expr(
                "pmod(cast(conv(substring(md5(_g), 1, 15), 16, 10) as bigint), "
                f"{n_buckets})"
            ).alias("_b"),
        )
        .groupBy("_id", "_t", "_b")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .cache()
    )
    model = tf.groupBy("_b").agg(
        F.sum("_tf").alias("_raw"),
        F.sum(F.when(F.col("_t"), F.col("_tf")).otherwise(F.lit(0))).alias(
            "_tgt"
        ),
    )
    ratio = model.select(
        "_b",
        F.expr(f"(_tgt + 1) * {scale} div (_raw + {n_buckets})").alias("_r"),
    )
    scored = (
        tf.join(F.broadcast(ratio), "_b")
        .groupBy("_id")
        .agg(F.sum(F.col("_tf") * F.col("_r")).alias("score"))
    )
    return (
        scored.select(F.col("_id").alias(id_col), "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
