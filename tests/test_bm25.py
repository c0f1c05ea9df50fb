"""Integer-exact BM25 retrieval (functions/search.py, r6)."""

from __future__ import annotations

from datafusion_dolomite_spark.functions.search import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_ranking_prefers_rarer_and_denser_terms(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark common common"),
            (2, "spark common"),
            (3, "common common common"),
            (4, "unrelated words only here"),
        ],
    )
    out = bm25_topk(docs, "doc_id", "text", ["spark"], k=3).collect()
    ids = [r["doc_id"] for r in out]
    # only docs containing the term score; higher tf ranks first
    assert ids[0] == 1
    assert set(ids) == {1, 2}


def test_multi_term_sum_and_tiebreak(spark):
    docs = _docs(
        spark,
        [
            (10, "alpha beta"),
            (11, "alpha beta"),
            (12, "alpha"),
        ],
    )
    out = bm25_topk(docs, "doc_id", "text", ["alpha", "beta"], k=3).collect()
    ids = [r["doc_id"] for r in out]
    # identical docs tie → ascending id break; two-term docs outrank one
    assert ids == [10, 11, 12]
    assert out[0]["score"] == out[1]["score"] > out[2]["score"]


def test_topk_plan_has_no_global_sort(spark):
    docs = _docs(spark, [(i, f"term{i % 3} filler") for i in range(50)])
    df = bm25_topk(docs, "doc_id", "text", ["term0"], k=5)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    # tokenization + scoring stay JVM-side
    assert "EvalPython" not in phys
