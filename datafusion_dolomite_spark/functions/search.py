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
    # r14 restructure (guide §2.3/§2.4): the query's terms are LITERALS,
    # so each per-doc term frequency is a map-side
    # ``size(filter(_arr, x -> x = term))`` — the token explode, the
    # (doc, term) postings shuffle, the df aggregate and its broadcast
    # join all disappear.  ONE tokenize pass emits the narrow per-doc
    # row (id, dl, tf per term, ~(2+|q|)×8 bytes); ONE single-row
    # aggregate over it yields N, avgdl and every term's df together
    # (df(t) = count of docs with tf_t ≥ 1 — exactly the old postings
    # count); scoring is then a pure map over the cached narrow rows.
    # Same integer-exact weights term by term, summed in the same
    # bigint arithmetic, so results are bit-identical.
    def _esc(t: str) -> str:
        return t.replace("'", "''")

    tf_exprs = [
        F.expr(
            f"cast(size(filter(_arr, x -> x = '{_esc(t)}')) as bigint)"
        ).alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    p1 = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.expr(
                f"filter(split(lower({text_col}), '{TOKEN_PATTERN}'), "
                "x -> x <> '')"
            ).alias("_arr"),
        )
        .select(
            "_id",
            F.size("_arr").cast("bigint").alias("_dl"),
            *tf_exprs,
        )
        # narrow (a few bigints per doc) and consumed twice (corpus
        # stats + scoring): cache the tokenize pass, not the tokens
        .cache()
    )
    stats = p1.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.expr("cast(sum(_dl) div count(1) as bigint)").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    w_terms = " + ".join(
        f"(CASE WHEN _tf{i} > 0L THEN "
        f"((_n - _df{i}) * 1000L div (_df{i} + 1) + 1L)"
        f" * 44L * _tf{i} * _avgdl"
        f" div (20L * _tf{i} * _avgdl + 6L * _avgdl + 18L * _dl)"
        f" ELSE 0L END)"
        for i in range(len(terms))
    )
    match_any = " OR ".join(f"_tf{i} > 0L" for i in range(len(terms)))
    return (
        p1.crossJoin(F.broadcast(stats))
        # only docs with ≥1 matching term existed in the old postings
        # pipeline — keep the result set identical
        .filter(F.expr(match_any))
        .select("_id", F.expr(w_terms).cast("bigint").alias("score"))
        .orderBy(F.col("score").desc(), F.col("_id").asc())
        .limit(k)
        .select(F.col("_id").alias(id_col), "score")
    )
