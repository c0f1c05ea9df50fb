"""LogicalSetSimJoin / set_sim_join_pairs — PPJoin prefix-filtered
cross-side set-similarity join.

The load-bearing property is COMPLETENESS: prefix filtering must find
every pair with Jaccard ≥ t, including pairs made entirely of
high-document-frequency tokens (exactly the pairs a rare-gram df cap à la
ngram_jaccard drops by design).  Every test compares against an exhaustive
all-pairs truth computed in plain Python.
"""

import itertools
import math

import pytest

from datafusion_dolomite_spark.functions.dedup import set_sim_join_pairs


def _gram_set(text: str, gram: int):
    toks = " ".join(text.lower().strip().split()).split(" ")
    if len(toks) < gram:
        return set()
    if gram == 1:
        return set(toks)
    return {" ".join(toks[i : i + gram]) for i in range(len(toks) - gram + 1)}


def _truth(rows, gram: int, threshold_1000: int):
    """Exhaustive cross-side truth: (d1, d2, floor(1000*J))."""
    sets = {r[0]: _gram_set(r[2], gram) for r in rows}
    side = {r[0]: r[1] for r in rows}
    out = set()
    for (a, b) in itertools.combinations(sorted(sets), 2):
        if side[a] == side[b] or not sets[a] or not sets[b]:
            continue
        d1, d2 = (a, b) if side[a] < side[b] else (b, a)
        i = len(sets[d1] & sets[d2])
        u = len(sets[d1] | sets[d2])
        if u == 0:
            continue
        j = math.floor(1000.0 * i / u)
        if j >= threshold_1000:
            out.add((d1, d2, j))
    return out


def _run(spark, rows, gram, threshold_1000):
    df = spark.createDataFrame(rows, "id long, side int, text string")
    got = set_sim_join_pairs(df, "id", "text", "side", gram, threshold_1000)
    return {tuple(r) for r in got.collect()}


def test_exhaustive_parity_word_tokens(spark):
    rows = [
        (1, 0, "the quick brown fox jumps over the lazy dog"),
        (2, 1, "the quick brown fox jumps over the lazy cat"),
        (3, 0, "entirely different content here about spark engines"),
        (4, 1, "entirely different content here about spark engines"),
        (5, 1, "the quick brown fox leaps over the lazy dog"),
        (6, 0, "short text"),
        (7, 1, "short text"),
    ]
    for t in (500, 700, 900):
        assert _run(spark, rows, 1, t) == _truth(rows, 1, t), f"t={t}"


def test_high_df_pair_not_dropped(spark):
    """Every token below has df = n_docs (maximally common) — a rare-gram
    df cap would generate ZERO candidates; prefix filtering must still
    find the identical cross-side pair."""
    common = "alpha beta gamma delta epsilon"
    rows = [(i, i % 2, common) for i in range(1, 9)]
    got = _run(spark, rows, 1, 1000)
    want = _truth(rows, 1, 1000)
    assert got == want
    assert len(want) == 16  # 4 even-side × 4 odd-side identical docs


def test_bigrams_and_length_filter(spark):
    rows = [
        (10, 0, "a b c d e f g h"),
        (11, 1, "a b c d e f g x"),      # 7-bigram overlap of 8 vs 8
        (12, 1, "a b"),                   # tiny — length filter prunes
        (13, 1, "a b c d e f g h i j k l m n o p q r s t"),  # too long
    ]
    for t in (600, 800):
        assert _run(spark, rows, 2, t) == _truth(rows, 2, t), f"t={t}"


def test_same_side_pairs_excluded(spark):
    rows = [
        (1, 0, "x y z w"),
        (2, 0, "x y z w"),
        (3, 1, "x y z w"),
    ]
    got = _run(spark, rows, 1, 1000)
    assert got == {(1, 3, 1000), (2, 3, 1000)}


def test_three_sides_all_cross_pairs_once(spark):
    rows = [(1, 0, "p q r s"), (2, 1, "p q r s"), (3, 2, "p q r s")]
    got = _run(spark, rows, 1, 1000)
    assert got == {(1, 2, 1000), (1, 3, 1000), (2, 3, 1000)}


def test_whitespace_normalization(spark):
    rows = [
        (1, 0, "  hello   world \t again  "),
        (2, 1, "hello world again"),
    ]
    assert _run(spark, rows, 1, 1000) == {(1, 2, 1000)}


@pytest.mark.parametrize("threshold", [500, 800, 950])
def test_randomized_parity(spark, threshold):
    """Seeded random corpora over a small vocabulary (high df everywhere —
    the adversarial regime for candidate filters)."""
    import random

    rng = random.Random(20260816 + threshold)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        n = rng.randint(2, 10)
        rows.append((i, i % 2, " ".join(rng.choice(vocab) for _ in range(n))))
    for gram in (1, 2):
        assert _run(spark, rows, gram, threshold) == _truth(
            rows, gram, threshold
        ), f"gram={gram}"
