"""Skew-salted aggregation + bucketed co-located joins."""

import contextlib
import io
import os

import pytest

from datafusion_dolomite_spark import LogicalPlanBuilder, col


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_aggregate_matches_plain(planner, spark):
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.functions.skew import salted_aggregate

    df = planner.dataframe(LogicalPlanBuilder().scan("events").build())
    salted = salted_aggregate(
        df,
        ["event_type"],
        [("count", "*", "n"), ("sum", "user_id", "uid_sum"),
         ("min", "event_id", "min_id"), ("max", "event_id", "max_id")],
        n_salts=16,
    )
    plain = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("uid_sum"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    got = sorted(tuple(r) for r in salted.collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want


def test_salted_aggregate_rejects_non_decomposable(planner):
    from datafusion_dolomite_spark.functions.skew import salted_aggregate

    df = planner.dataframe(LogicalPlanBuilder().scan("events").build())
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(df, ["event_type"], [("avg", "value", "a")])


def test_bucketed_join_avoids_shuffle(planner, spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT any shuffle
    exchange — the co-located join layout for repeated large-large joins
    (bucket once, join many times for free)."""
    warehouse_db = "bucketdemo"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (f"{warehouse_db}_orders", f"{warehouse_db}_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # in-memory metastore forgets tables between sessions but the
        # warehouse dir survives — remove stale locations too
        import shutil

        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    orders = planner.dataframe(LogicalPlanBuilder().scan("orders").build())
    lineitem = planner.dataframe(
        LogicalPlanBuilder()
        .scan("lineitem", columns=["l_orderkey", "l_quantity"])
        .build()
    )
    from datafusion_dolomite_spark.sources.sinks import write_bucketed_table

    write_bucketed_table(
        orders, f"{warehouse_db}_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem,
        f"{warehouse_db}_lineitem",
        ["l_orderkey"],
        8,
        sort_by=["l_orderkey"],
    )

    a = spark.table(f"{warehouse_db}_orders")
    b = spark.table(f"{warehouse_db}_lineitem")
    joined = a.hint("merge").join(b, a["o_orderkey"] == b["l_orderkey"])
    text = _plan_text(joined)
    assert "SortMergeJoin" in text
    assert "Exchange" not in text  # co-located: zero shuffle
    assert joined.count() > 0
    spark.sql(f"DROP TABLE IF EXISTS {warehouse_db}_orders")
    spark.sql(f"DROP TABLE IF EXISTS {warehouse_db}_lineitem")


def test_line_dedup_edges(spark):
    """Empty docs vanish; a doc whose every segment first appeared
    elsewhere keeps zero segments and fingerprints the EMPTY string
    (not NULL) — pinned because engines differ on agg-over-empty."""
    import hashlib

    from datafusion_dolomite_spark.functions.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta. gamma delta. alpha beta"),
            (2, "gamma delta. alpha beta"),  # fully duplicated vs doc 1
            (3, ""),  # empty text -> no rows
            (4, "unique tail segment"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 4}  # doc 3 has no segments at all
    # doc 1: 'alpha beta' kept once (pos 0), its pos-2 repeat removed
    assert rows[1]["n_kept"] == 2 and rows[1]["n_removed"] == 1
    # doc 2: both segments first occurred in doc 1 -> nothing kept
    assert rows[2]["n_kept"] == 0 and rows[2]["n_removed"] == 2
    empty_fp = int(hashlib.md5(b"").hexdigest()[:15], 16)
    assert rows[2]["rebuilt_fp"] == empty_fp
    assert rows[4]["n_kept"] == 1 and rows[4]["n_removed"] == 0


def test_decontaminate_counts(spark):
    """A train doc sharing grams with two eval docs counts both; a
    clean train doc is absent from the output."""
    from datafusion_dolomite_spark.functions.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated training text here"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [
            (100, "quick brown fox jumps"),
            (101, "over the lazy dog today"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["train_id"]: r for r in
            decontaminate(train, ev, "doc_id", "text", n=12).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_eval_docs"] == 2
    assert rows[1]["n_shared_grams"] > 0


def test_repetition_stats_rules(spark):
    """The word rule and the bigram rule fire independently; a
    single-word document is 100% one word (flagged) with zero bigrams."""
    from datafusion_dolomite_spark.functions.quality import repetition_stats

    df = spark.createDataFrame(
        [
            # 'spam' is 4/5 words -> word rule fires
            (1, "spam spam spam spam ham"),
            # 10 distinct words: top word 10%, top bigram 1/9 -> clean
            (2, "a b c d e f g h i j"),
            # 'u' is 4/20 = 20% (NOT > 20%) but 'u v' is 4/19 > 16%:
            # only the bigram rule fires
            (3, "u v a u v b u v c u v d e f g h i j k l"),
            (4, "solo"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            repetition_stats(df, "doc_id", "text").collect()}
    assert rows[1]["flagged"] and rows[1]["top_word_n"] == 4
    assert not rows[2]["flagged"]
    assert rows[2]["n_words"] == 10 and rows[2]["n_distinct_words"] == 10
    assert rows[3]["flagged"] and rows[3]["top_bigram_n"] == 4
    assert rows[3]["top_word_n"] == 4  # 20% exactly -> word rule did NOT fire
    assert rows[4]["flagged"] and rows[4]["top_bigram_n"] == 0


def test_interval_overlap_dedup(spark):
    """Pairs sharing MANY buckets must appear exactly once; touching
    endpoints overlap (inclusive); disjoint intervals don't pair."""
    from datafusion_dolomite_spark.functions.intervals import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 55), (3, 200, 210)], ["lid", "s", "e"]
    )
    right = spark.createDataFrame(
        [(10, 10, 90), (20, 100, 120), (30, 300, 310)], ["rid", "s", "e"]
    )
    # width 8: pair (1,10) shares ~10 buckets — still one output row
    got = sorted(
        (r["lid_1"], r["rid_2"])
        for r in interval_overlap_join(left, right, "s", "e", width=8).collect()
    )
    assert got == [(1, 10), (1, 20), (2, 10)]


def test_range_bounds_matches_global_sort(spark):
    """Bucketed distributed ranks must equal a plain global sort —
    exercised with heavy duplicates (rank ties broken by id) and empty
    buckets between populated ones."""
    from datafusion_dolomite_spark.functions.skew import range_partition_bounds

    vals = [5, 5, 5, 1, 9, 9, 2, 7, 3, 5, 1000003, 1000003, 2000001]
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["v", "rid"])
    got = {r["q"]: r["boundary"] for r in
           range_partition_bounds(df, "v", "rid", nbounds=4).collect()}
    n = len(vals)
    srt = sorted(rows)  # (v, rid) total order
    want = {q: srt[(q * n + 3) // 4 - 1][0] for q in range(1, 5)}
    assert got == want


def test_resample_corpus_weights(spark):
    """Weight 25 (2.5 epochs) gives every doc 2 or 3 contiguous copies;
    weight 0 drops the stratum entirely; default 10 keeps exactly one."""
    from datafusion_dolomite_spark.functions.sampling import resample_corpus

    rows = ([(i, "a") for i in range(20)]
            + [(100 + i, "z") for i in range(20)]
            + [(200 + i, "d") for i in range(5)])
    df = spark.createDataFrame(rows, ["doc_id", "src"])
    out = resample_corpus(df, "doc_id", "src", {"a": 25, "z": 0}).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy"])
    assert not any(100 <= d < 200 for d in by_doc)       # z dropped
    for d in range(20):                                   # a: 2 or 3 copies
        assert sorted(by_doc[d]) in ([1, 2], [1, 2, 3])
    n_a = sum(len(v) for d, v in by_doc.items() if d < 100)
    assert 40 <= n_a <= 60                                # ~2.5 * 20
    for d in range(200, 205):                             # default: one copy
        assert by_doc[d] == [1]


def test_pagerank_hand_computed(spark):
    """Star graph a↔b, a↔c: after one iteration the hub holds
    base + 2·(85%·r0 div 1) and each leaf base + (85%·r0 div 2) —
    hand-checked fixed-point arithmetic, and total mass stays within
    N of the 1e9 scale (floor losses only)."""
    from datafusion_dolomite_spark.functions.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1)], ["src", "dst"]
    )
    out = {r["node"]: r["rank_q"] for r in
           pagerank(edges, "src", "dst", iters=1).collect()}
    r0 = 10**9 // 3            # 333333333
    base = 15 * 10**9 // 300   # 50000000
    leaf_contrib = (85 * r0) // 200   # hub outdeg 2
    hub_contrib = (85 * r0) // 100    # leaf outdeg 1
    assert out[1] == base + 2 * hub_contrib
    assert out[2] == out[3] == base + leaf_contrib
    assert 10**9 - sum(out.values()) < 3 * 3  # floor loss < iters*N


def test_semantic_dedup_keeps_lowest_id(spark):
    """Exact and scaled copies collapse onto the lowest id in the cell;
    a negated vector is never 'close' (cosine -1)."""
    from datafusion_dolomite_spark.functions.similarity import semantic_dedup

    base = [1.0, 0.5] + [0.0] * 62
    rows_in = [
        (10, base),
        (20, base),                      # identical -> dropped
        (40, [2.0 * x for x in base]),   # scaled copy, cosine 1 -> dropped
        (30, [-x for x in base]),        # negation -> kept wherever it lands
    ]
    df = spark.createDataFrame(rows_in, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, "vec_id", "embedding",
                          ncells=4, threshold_1000=900).collect()}
    assert out[10]["kept"] and out[10]["n_close"] == 0
    assert not out[20]["kept"] and out[20]["n_close"] == 1
    assert not out[40]["kept"] and out[40]["n_close"] == 2
    assert out[30]["kept"]
    # identical vectors always share a cell
    assert out[10]["cell"] == out[20]["cell"] == out[40]["cell"]
