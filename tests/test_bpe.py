"""Deterministic BPE (functions/bpe.py): training and encoding must
hash-match an independent pure-Python replay (the DuckDB replay is the
driver oracle, tests/test_entry_oracle.py::q_bpe_tokens)."""

import re
from collections import Counter

from datafusion_dolomite_spark.plans.plan import LogicalPlanBuilder


def _words(t):
    return [w for w in re.split("[^a-z]+", t.lower()) if w]


def _apply(word, merges):
    s = "".join(f">{c}<" for c in word)
    for left, right in merges:
        s = s.replace(f">{left}<>{right}<", f">{left}{right}<")
    return s


def _py_train(vocab, num_merges):
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, c in vocab.items():
            toks = _apply(w, merges)[1:-1].split("<>")
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        merges.append(min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0])
    return merges


def test_train_and_counts_match_python_replay(planner):
    from datafusion_dolomite_spark.functions.bpe import (
        bpe_token_counts,
        bpe_train,
    )

    docs = planner.dataframe(
        LogicalPlanBuilder()
        .scan("documents", columns=["doc_id", "text"])
        .build()
    )
    merges = bpe_train(docs, "text", num_merges=12)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    vocab = Counter()
    for _, t in rows:
        vocab.update(_words(t))
    assert [tuple(m) for m in merges] == _py_train(vocab, 12)
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_token_counts(docs, "doc_id", "text", merges).collect()
    }
    want = {}
    for d, t in rows:
        ws = _words(t)
        want[d] = (len(ws), sum(_apply(w, merges).count("<") for w in ws))
    assert got == want
    # merges genuinely compress: tokens < chars, > words
    total_chars = sum(len(w) for t in (t for _, t in rows) for w in _words(t))
    total_tokens = sum(v[1] for v in got.values())
    total_words = sum(v[0] for v in got.values())
    assert total_words < total_tokens < total_chars


def test_greedy_run_semantics(spark):
    # 'aaaa' with merge (a,a): canonical greedy pass -> aa, aa;
    # 'aaa' -> aa, a.  The marker-string replace reproduces it.
    from datafusion_dolomite_spark.functions.bpe import bpe_token_counts

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaa"), (3, "a")], "id long, text string"
    )
    out = {
        r.id: r.n_tokens
        for r in bpe_token_counts(df, "id", "text", [("a", "a")]).collect()
    }
    assert out == {1: 2, 2: 2, 3: 1}


def test_exhaustion_stops_early(spark):
    from datafusion_dolomite_spark.functions.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "ab ab b a")], "id long, text string"
    )
    # vocab pairs: only ('a','b') once merged there is nothing left
    merges = bpe_train(df, "text", num_merges=10)
    assert merges == [("a", "b")]


def test_pack_budgeted_in_bpe_tokens(planner):
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.functions.bpe import (
        bpe_token_counts,
        bpe_train,
    )
    from datafusion_dolomite_spark.functions.packing import sequence_pack

    docs = planner.dataframe(
        LogicalPlanBuilder()
        .scan("documents", columns=["doc_id", "text"])
        .build()
    )
    merges = bpe_train(docs, "text", num_merges=8)
    counts = bpe_token_counts(docs, "doc_id", "text", merges)
    packed = sequence_pack(counts, "doc_id", "n_tokens", budget=512)
    rows = packed.collect()
    assert rows and all(0 <= r.pack_offset < 512 for r in rows)
    # every document's BPE count rode through unchanged
    orig = {r.doc_id: r.n_tokens for r in counts.collect()}
    assert {r.doc_id: r.n_tokens for r in rows} == orig
