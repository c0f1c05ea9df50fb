"""Deterministic byte-pair-encoding tokenization (r11, VERDICT r10
item 7): data-trained merge table, JVM-expression apply — so packing /
chunking budgets can count REAL subword tokens instead of whitespace
words.

Cross-engine exactness is the design driver (the DuckDB oracle replays
training AND encoding bit-for-bit):

* a token sequence is a MARKER STRING — every token wrapped as
  ``>tok<`` and concatenated (``hello`` → ``>h<>e<>l<>l<>o<``).  One
  BPE merge ``(a, b) → ab`` is then ONE ``replace(s, '>a<>b<',
  '>ab<')``: SQL ``replace`` is leftmost-non-overlapping, and because
  the pattern consumes exactly the two wrapped tokens (no shared
  boundary character), a run ``a a a`` merges to ``aa, a`` — the
  canonical greedy BPE pass — identically in Spark and DuckDB.  The
  markers also make false sub-token matches impossible (``>a<>b<``
  cannot occur inside ``>aa<>ab<``).
* training iterates on the (distinct word, count) VOCAB table — the
  standard trick (HF trains on word-frequency dicts): the corpus is
  touched once for the word counts (one shuffle), every merge
  iteration runs over vocab-sized data, and the only driver values are
  one (pair, count) row per iteration — a model parameter, like the
  Lloyd centroids.  Ties break (count DESC, left ASC, right ASC).
* token counting / encoding is a CHAIN OF ``replace`` CALLS — pure
  whole-stage-codegen JVM expressions, no UDF in the hot path; the
  token count is the number of ``<`` markers left standing.

100 TB shape: one word-count aggregation over the corpus; training
cost ∝ merges × vocab (cap the vocab with ``max_vocab`` — the
frequency tail a cap drops cannot win a most-frequent-pair argmax
unless the head is smaller than the cap); apply is map-only.

Reference: no text surface exists in the reference (SURVEY §2.4);
extension alongside functions/text.py's whitespace/BPE-ish counters.
"""

from __future__ import annotations

__all__ = ["bpe_word_vocab", "bpe_train", "bpe_apply_expr",
           "bpe_token_counts"]

#: split-to-words rule shared with the oracle: lowercase, a-z runs
_WORD_SPLIT = "[^a-z]+"


def _chars_expr(word_col: str) -> str:
    """Marker string of single characters: ``'hello'`` →
    ``'>h<>e<>l<>l<>o<'`` (regexp capture-replace; Spark's ``$1``)."""
    return f"regexp_replace({word_col}, '(.)', '>$1<')"


def bpe_word_vocab(df, text_col: str, max_vocab: int = 65536):
    """(word, cnt) over the corpus — lowercase a-z runs, one shuffle.
    ``max_vocab`` keeps training bounded on heavy-tailed corpora: the
    top-``max_vocab`` words by (cnt DESC, word ASC)."""
    from pyspark.sql import functions as F

    words = df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), _WORD_SPLIT)
        ).alias("word")
    ).filter("word != ''")
    v = words.groupBy("word").agg(F.count("*").alias("cnt"))
    return v.orderBy(F.col("cnt").desc(), F.col("word")).limit(max_vocab)


def bpe_train(df, text_col: str, num_merges: int = 16,
              max_vocab: int = 65536):
    """The merge table: ``num_merges`` most-frequent-adjacent-pair
    merges over the word vocab, ties (count DESC, left ASC, right
    ASC).  Each iteration retokenizes the vocab with the merges so far
    (a chain of ``replace`` — vocab-sized work) and collects ONE
    (left, right) row.  Stops early when no adjacent pair remains.

    Returns ``[(left, right), ...]`` — the deterministic model the
    apply expression and the DuckDB oracle both consume."""
    from pyspark.sql import functions as F

    vocab = bpe_word_vocab(df, text_col, max_vocab).persist()
    vocab.count()
    merges: list = []
    for _ in range(num_merges):
        s = _chars_expr("word")
        for left, right in merges:
            s = (
                f"replace({s}, '>{left}<>{right}<', '>{left}{right}<')"
            )
        # tokens of the CURRENT tokenization; adjacent pairs weighted
        # by the word count
        toks = f"split(substring({s}, 2, length({s}) - 2), '<>')"
        pairs = (
            vocab.select(
                "cnt",
                F.expr(
                    f"zip_with(slice({toks}, 1, size({toks}) - 1), "
                    f"slice({toks}, 2, size({toks}) - 1), "
                    "(a, b) -> struct(a as l, b as r))"
                ).alias("_ps"),
            )
            .select("cnt", F.explode("_ps").alias("_p"))
            .groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(
            F.col("n").desc(), F.col("l"), F.col("r")
        ).limit(1).collect()
        if not top:
            break
        merges.append((top[0]["l"], top[0]["r"]))
    vocab.unpersist()
    return merges


def bpe_apply_expr(word_col: str, merges) -> str:
    """SQL expression: the marker string of ``word_col`` with every
    merge applied in training order — a pure ``replace`` chain (JVM,
    codegen)."""
    s = _chars_expr(word_col)
    for left, right in merges:
        s = f"replace({s}, '>{left}<>{right}<', '>{left}{right}<')"
    return s


def bpe_token_counts(df, id_col: str, text_col: str, merges):
    """(id, n_words, n_tokens) per document: words exploded, each
    word's token count = surviving ``<`` markers after the merge
    chain, summed per doc.  Feed ``n_tokens`` to
    ``sequence_pack(tokens_col=...)`` to budget packs in BPE tokens
    instead of whitespace words."""
    from pyspark.sql import functions as F

    enc = bpe_apply_expr("word", merges)
    per_word = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), _WORD_SPLIT)
            ).alias("word"),
        )
        .filter("word != ''")
        .select(
            id_col,
            F.expr(
                f"length({enc}) - length(replace({enc}, '<', ''))"
            ).alias("_nt"),
        )
    )
    return per_word.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("_nt").cast("bigint").alias("n_tokens"),
    )
