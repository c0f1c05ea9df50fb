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
           "bpe_token_counts", "bpe_tokenizer_build", "read_bpe_meta",
           "bpe_meta_matches", "bpe_tokenizer_merges"]

_BPE_META_VERSION = 1

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
    ASC).  Stops early when no adjacent pair remains.

    The corpus is touched ONCE (the word-count shuffle); the
    ``max_vocab``-bounded (word, count) dict then collects to the
    driver and the merge loop runs in plain Python — MODEL-scale data
    (the same boundedness argument as the Lloyd centroid collects, and
    exactly how HF tokenizers train: on the word-frequency dict, never
    the corpus).  An earlier all-Spark formulation ran each iteration
    as a vocab-sized Spark job: 16 merges = 17 jobs of pure stage
    overhead on a dict that fits in L2 cache.

    Returns ``[(left, right), ...]`` — the deterministic model the
    apply expression and the DuckDB oracle both consume (the loop
    below IS the oracle's unrolled-CTE computation, stated in
    Python)."""
    vocab = [
        (r["word"], r["cnt"])
        for r in bpe_word_vocab(df, text_col, max_vocab).collect()
    ]
    toks = {w: list(w) for w, _ in vocab}
    merges: list = []
    for _ in range(num_merges):
        pc: dict = {}
        for w, c in vocab:
            ts = toks[w]
            for a, b in zip(ts, ts[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        left, right = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((left, right))
        # leftmost non-overlapping merge pass — the same greedy scan
        # one marker-string replace performs
        for w, _ in vocab:
            ts = toks[w]
            out = []
            i = 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == left and ts[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            toks[w] = out
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


# -- persisted tokenizer artifact (r12, VERDICT r11 item 1) ------------------
#
# The ANN-index pattern applied to the merge table: ``q_bpe_tokens``
# used to re-train its 16 merges inside every execution — 17
# vocab-sized jobs of stage overhead per pass on a model that fits in
# L2 cache.  ``bpe_tokenizer_build`` trains ONCE and persists the merge
# table as parquet (seq, left, right) plus a ``_meta.json``
# parameterization guard; ``AttachBpeTokenizerRule`` then fills
# ``LogicalBpeTokens.tokenizer_dir`` for queries over the registered
# table and the cost race picks the train-free probe.  A probe is
# BIT-EQUAL to the inline train-then-count chain with the same
# (num_merges, max_vocab) — training is deterministic, so persisting
# its output changes nothing but the stage count.


def _bpe_meta_path(tok_dir: str) -> str:
    import os

    return os.path.join(tok_dir, "_meta.json")


def read_bpe_meta(tok_dir: str):
    """The persisted merge table + parameterization, or None when the
    directory holds no (readable) tokenizer."""
    import json

    try:
        with open(_bpe_meta_path(tok_dir)) as f:
            m = json.load(f)
        if int(m.get("version", -1)) != _BPE_META_VERSION:
            return None
        return m
    except (OSError, ValueError, TypeError):
        return None


def bpe_meta_matches(meta, num_merges: int, max_vocab: int) -> bool:
    """Does a persisted tokenizer serve this query parameterization?
    A differently-trained merge table segments differently — the same
    loud-validation contract as ``ann_meta_matches``."""
    return (
        meta is not None
        and int(meta["num_merges"]) == int(num_merges)
        and int(meta["max_vocab"]) == int(max_vocab)
    )


def bpe_tokenizer_merges(tok_dir: str):
    """``[(left, right), ...]`` from the artifact (training order)."""
    meta = read_bpe_meta(tok_dir)
    if meta is None:
        raise ValueError(
            f"no BPE tokenizer at {tok_dir!r} — bpe_tokenizer_build first"
        )
    return [(lft, rgt) for lft, rgt in meta["merges"]]


def bpe_tokenizer_build(df, tok_dir: str, text_col: str,
                        num_merges: int = 16, max_vocab: int = 65536):
    """Train ONCE and persist: the merge table as parquet
    ``(seq, left, right)`` (training order = seq) and the model +
    parameterization in ``_meta.json``.  The training path IS
    ``bpe_train`` — the artifact is its output verbatim, which is what
    makes a probe bit-equal to the inline chain (and keeps the DuckDB
    unrolled-CTE replay a valid oracle for both).  Returns the meta
    dict."""
    import json
    import os

    merges = bpe_train(df, text_col, num_merges=num_merges,
                       max_vocab=max_vocab)
    spark = df.sparkSession
    rows = [(i, lft, rgt) for i, (lft, rgt) in enumerate(merges)]
    spark.createDataFrame(
        rows or [(None, None, None)],
        "seq: int, left: string, right: string",
    ).filter("seq is not null").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "merges")
    )
    meta = {
        "version": _BPE_META_VERSION,
        "num_merges": num_merges,
        "max_vocab": max_vocab,
        "text_col": text_col,
        "merges": [[lft, rgt] for lft, rgt in merges],
    }
    path = _bpe_meta_path(tok_dir)
    tmp = path + ".tmp"
    os.makedirs(tok_dir, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)
    return meta
