"""Intra-document REPETITION quality signals (the Gopher / MassiveText
filtering rules): documents dominated by one repeated word or phrase are
boilerplate/spam and get flagged before training.

Per document:

* ``n_words`` / ``n_distinct_words`` — repetition ratio inputs
* ``top_word_n``   — occurrences of the single most frequent word
* ``top_bigram_n`` — occurrences of the most frequent word 2-gram
* ``flagged``      — Gopher-style rule on the above, evaluated with
  INTEGER cross-multiplication (``5·top_word_n > n_words`` ⇔ top-word
  fraction > 20%) so the boolean is bit-identical across engines.

100 TB shape: one map-side explode per signal (words + bigrams tagged
into the SAME stream, so there is exactly ONE (doc, tag, term) groupBy
— its partial combine collapses repeats map-side — and one per-doc
aggregate).  All built-in expressions (codegen); no Python, no windows,
no all-pairs anything.

Reference: no intra-doc quality surface exists there (SURVEY §2.4);
this extends the documents-table operator family (text.py, dedup.py).
"""

from __future__ import annotations

__all__ = ["repetition_stats"]


def repetition_stats(
    df,
    id_col: str,
    text_col: str,
    top_word_pct: int = 20,
    top_bigram_pct: int = 16,
):
    """Word/bigram repetition signals per document.

    ``flagged`` is true when the most frequent word exceeds
    ``top_word_pct``% of all word occurrences, or the most frequent
    bigram exceeds ``top_bigram_pct``% of bigram occurrences — the
    thresholds are integers and the comparison cross-multiplies, so no
    floats appear anywhere in the result.
    """
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    base = ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')"
        ).alias("_wl"),
    )
    # ONE explode emitting words and bigrams as a tagged stream — the
    # scan is read once and the whole fan-out stays inside one codegen
    # stage.  The size() guard matters: sequence(0, -1) would generate a
    # DESCENDING two-element array, not an empty one.
    tagged = base.select(
        "_id",
        F.explode(
            F.expr(
                "concat("
                "  transform(_wl, w -> struct('w' as _tag, w as _term)),"
                "  if(size(_wl) >= 2,"
                "     transform(sequence(0, size(_wl) - 2),"
                "               i -> struct('b' as _tag,"
                "                           concat(_wl[i], ' ', _wl[i + 1]) as _term)),"
                "     array()))"
            )
        ).alias("_e"),
    ).select("_id", F.col("_e._tag").alias("_tag"), F.col("_e._term").alias("_term"))
    cnt = tagged.groupBy("_id", "_tag", "_term").agg(F.count(F.lit(1)).alias("_n"))
    is_w = F.col("_tag") == "w"
    agg = cnt.groupBy("_id").agg(
        F.sum(F.when(is_w, F.col("_n")).otherwise(F.lit(0))).alias("n_words"),
        # cnt rows are unique per (_id, _tag, _term), so the distinct
        # word count is a plain conditional COUNT — no countDistinct, no
        # expand, no extra shuffle
        F.count(F.when(is_w, F.lit(1))).alias("n_distinct_words"),
        F.max(F.when(is_w, F.col("_n"))).alias("top_word_n"),
        F.coalesce(
            F.max(F.when(~is_w, F.col("_n"))), F.lit(0)
        ).alias("top_bigram_n"),
        F.sum(F.when(~is_w, F.col("_n")).otherwise(F.lit(0))).alias("_n_bigrams"),
    )
    flagged = (
        (100 * F.col("top_word_n") > top_word_pct * F.col("n_words"))
        | (
            (F.col("_n_bigrams") > 0)
            & (100 * F.col("top_bigram_n") > top_bigram_pct * F.col("_n_bigrams"))
        )
    ).alias("flagged")
    return agg.select(
        F.col("_id").alias(id_col),
        "n_words",
        "n_distinct_words",
        "top_word_n",
        "top_bigram_n",
        flagged,
    )
