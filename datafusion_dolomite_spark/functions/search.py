"""Full-text retrieval: BM25 top-k over a document corpus.

The ranking the inverted-index engines (Lucene/Tantivy) run, expressed
as a relational pipeline — the shape a warehouse-native search layer
actually executes (the reference has no text surface at all; this is a
training-data-pipeline extension, like dedup and ANN).

INTEGER-EXACT variant: the classic BM25 has ``ln`` in its idf and float
division everywhere — two engines' libm/rounding make ``⌊score⌋``
hash-comparison flaky.  With k1 = 6/5 and b = 3/4 the term weight is a
RATIONAL function of (tf, dl, avgdl), so clearing denominators gives

    w(t, d) = idf(t) * 44*tf*avgdl  //  (20*tf*avgdl + 6*avgdl + 18*dl)

with the log-free RSJ-style ``idf(t) = (N - df)*1000 // (df + 1) + 1``
— every quantity a bigint, every division integer, bit-identical in any
engine (DuckDB mirrors with ``//``).  Rank order matches float BM25
except where two scores differ past the idf quantization.

100 TB shape: ``dl`` is computed map-side BEFORE the explode; the
explode is filtered to the QUERY'S terms immediately (the inverted-index
probe — the term shuffle carries only matching postings, never the
corpus vocabulary); ``df`` and the corpus stats are tiny broadcast
sides; top-k is TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from typing import Sequence

__all__ = ["bm25_topk", "TOKEN_PATTERN"]

#: tokenizer shared with the DuckDB oracle: lowercase, split on any
#: non-alphanumeric run, drop empties
TOKEN_PATTERN = "[^a-z0-9]+"


def bm25_topk(
    df,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
):
    """→ (id, score) top-``k`` docs for ``query_terms`` by integer-exact
    BM25 (ties broken by ascending id — deterministic)."""
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    terms = sorted(set(query_terms))
    base = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.expr(
                f"filter(split(lower({text_col}), '{TOKEN_PATTERN}'), "
                "x -> x <> '')"
            ).alias("_arr"),
        )
        .withColumn("_dl", F.size("_arr").cast("bigint"))
    )
    # corpus stats: one row, broadcast — avgdl as integer floor division
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.expr("cast(sum(_dl) div count(1) as bigint)").alias("_avgdl"),
    )
    lit_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    postings = (
        base.select("_id", "_dl", F.explode("_arr").alias("_term"))
        # the inverted-index probe: only the query's postings survive the
        # explode — the tf shuffle moves matching (doc, term) rows only
        .filter(F.expr(f"_term in ({lit_list})"))
    )
    tf = postings.groupBy("_id", "_dl", "_term").agg(
        F.count(F.lit(1)).cast("bigint").alias("_tf")
    )
    dfreq = tf.groupBy("_term").agg(
        F.count(F.lit(1)).cast("bigint").alias("_df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_w",
            F.expr(
                "((_n - _df) * 1000L div (_df + 1) + 1L) * 44L * _tf * _avgdl"
                " div (20L * _tf * _avgdl + 6L * _avgdl + 18L * _dl)"
            ),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(F.sum("_w").cast("bigint").alias("score"))
        .orderBy(F.col("score").desc(), F.col("_id").asc())
        .limit(k)
        .select(F.col("_id").alias(id_col), "score")
    )
