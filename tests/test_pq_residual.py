"""Residual IVF-PQ (r9, VERDICT item 3 — FAISS IVF-PQ proper).

Reference context: the reference repo has no ANN surface at all; this
extends the engine's LLM-data-pipeline operators (SURVEY §7 phase 3).
``knn_pq(residual=True)`` encodes v − cent(cell) with
residual-RMS-scaled codebooks and adds the exact dot(q, cent) term to
the ADC score.  On a cluster-structured corpus (where IVF-PQ quality
matters) this must beat raw-vector PQ on recall vs brute-force ground
truth — the quality floor the r8 verdict flagged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_dolomite_spark.functions.similarity import (
    DIM,
    _hash_vec,
    knn_brute,
    knn_pq,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """2048 vectors around the 8 'c{g}' IVF hash centroids + 0.2-amp
    hash noise — cells align with clusters, the regime residual
    encoding is built for."""
    G, N = 8, 2048
    cent_lit = "array(" + ", ".join(
        "array(" + ", ".join(f"{v!r}D" for v in _hash_vec(f"c{g}")) + ")"
        for g in range(G)
    ) + ")"
    noise = (
        "((cast(conv(substring(md5(concat('rn', cast(id as string), '_', "
        "cast(d as string))), 1, 15), 16, 10) as bigint) % 2001 - 1000) "
        "/ 1000.0D)"
    )
    return spark.range(N).select(
        F.col("id").alias("vid"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> "
            f"element_at({cent_lit}, cast(id % {G} as int) + 1)[d] "
            f"+ 0.2D * {noise})"
        ).alias("vec"),
    )


def _hits(result_df, gt_pairs):
    pairs = {
        (r["query_id"], r["neighbor_id"]) for r in result_df.collect()
    }
    return len(pairs & gt_pairs)


def test_residual_beats_raw_pq_on_clustered_corpus(spark, clustered):
    common = dict(n_queries=20, k=10, m=16, ksub=16, refine=50,
                  ncells=8, nprobe=3)
    gt = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute(clustered, "vid", "vec",
                           n_queries=20, k=10).collect()
    }
    assert len(gt) == 200
    raw = _hits(
        knn_pq(clustered, "vid", "vec", residual=False, **common), gt
    )
    res = _hits(
        knn_pq(clustered, "vid", "vec", residual=True, **common), gt
    )
    # measured 49 vs 75; generous margins so an engine-side regression
    # (not noise — the pipeline is deterministic) trips the assert
    assert res > raw, f"residual {res} should beat raw {raw}"
    assert res >= 70 and raw <= 55


def test_residual_output_contract(spark, clustered):
    """Same (query_id, neighbor_id, rank) contract as every knn path:
    k rows per query, ranks 1..k, no self-matches."""
    out = knn_pq(
        clustered, "vid", "vec", n_queries=4, k=5, m=16, ksub=16,
        refine=20, ncells=8, nprobe=3, residual=True,
    ).collect()
    assert len(out) == 20
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2, 3}
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_residual_flag_through_planner(spark, tmp_path):
    """pq_residual threads builder → LogicalKnn → Knn2PqRule →
    PhysicalKnnPq → executor; the physical plan advertises it."""
    from datafusion_dolomite_spark import (
        LogicalPlanBuilder,
        QueryPlanner,
        testdata_catalog,
    )

    qp = QueryPlanner(
        spark, testdata_catalog("/root/testdata/sf0.001")
    )
    plan = (
        LogicalPlanBuilder()
        .scan("embeddings")
        .knn(
            "vec_id", "embedding", n_queries=3, k=5, method="pq",
            pq_m=8, pq_ksub=16, pq_refine=20, pq_ncells=8,
            pq_nprobe=2, pq_residual=True,
        )
        .build()
    )
    assert "residual" in qp.explain(plan)
    rows = qp.dataframe(plan).collect()
    assert len(rows) == 15  # 3 queries × k=5


def test_trained_codebooks_lift_recall(spark, clustered):
    """r10 (VERDICT item 4): fixed-iteration Lloyd-trained codebooks
    beat the scaled-hash residual floor.  refine=100 — the r10 ceiling
    study showed refine=50 caps ANY codebook at ~92/200 on this
    corpus, so the gate runs where codebook quality is the binding
    factor.  Measured: raw 95, residual 107, trained 126."""
    common = dict(n_queries=20, k=10, m=16, ksub=16, refine=100,
                  ncells=8, nprobe=3)
    gt = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute(clustered, "vid", "vec",
                           n_queries=20, k=10).collect()
    }
    res = _hits(
        knn_pq(clustered, "vid", "vec", residual=True, **common), gt
    )
    trn = _hits(
        knn_pq(clustered, "vid", "vec", residual=True, train_iters=3,
               **common),
        gt,
    )
    assert trn > res, f"trained {trn} should beat untrained {res}"
    assert trn >= 120 and res >= 100


def test_trained_centroids_lift_probe_recall(spark):
    """r10: Lloyd-trained IVF CENTROIDS (the coarse-quantizer half of
    FAISS train()) on a corpus that does NOT cluster around the hash
    centroids — the probe stage, not the codebook, is the binding
    recall factor there (measured at sf0.1: hash 13 vs trained 26 of
    100; this sf0.001-scale check pins the ordering with margin)."""
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    common = dict(n_queries=10, k=10, m=8, ksub=16, refine=50,
                  ncells=32, nprobe=3)
    gt = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute(df, "vec_id", "embedding",
                           n_queries=10, k=10).collect()
    }
    hsh = _hits(
        knn_pq(df, "vec_id", "embedding", residual=True, **common), gt
    )
    km = _hits(
        knn_pq(df, "vec_id", "embedding", residual=True,
               kmeans_iters=2, **common),
        gt,
    )
    assert km > hsh, f"trained cents {km} should beat hash {hsh}"


def test_shared_prep_identical_results(spark, clustered):
    """r13 optimization: ``pq_residual_prep`` lets several residual
    chains share ONE corpus assignment + scale aggregation.  The shared
    path must be row-identical to the per-chain build for both the
    plain-residual and the trained-codebook variants."""
    from datafusion_dolomite_spark.functions.similarity import (
        pq_residual_prep,
    )

    common = dict(n_queries=6, k=5, m=16, ksub=16, refine=20,
                  ncells=8, nprobe=3)
    prep = pq_residual_prep(clustered, "vid", "vec", m=16, ncells=8)
    for extra in ({}, {"train_iters": 2}):
        solo = sorted(
            map(tuple, knn_pq(clustered, "vid", "vec", residual=True,
                              **extra, **common).collect())
        )
        shared = sorted(
            map(tuple, knn_pq(clustered, "vid", "vec", residual=True,
                              _prep=prep, **extra, **common).collect())
        )
        assert solo == shared, f"extra={extra}"


def test_fused_assign_encode_identical(spark, clustered):
    """r13 optimization (guide §4): the fused ``_assign_encode_pandas``
    Arrow pass must be row-for-row identical to the two-pass
    ``_assign_cells_pandas`` → ``_pq_encode_pandas`` pipeline it
    replaced in ``knn_pq``'s non-residual IVF branch."""
    from datafusion_dolomite_spark.functions.similarity import (
        DIM,
        _assign_cells_pandas,
        _assign_encode_pandas,
        _hash_vec,
        _pq_encode_pandas,
    )

    m, ksub, ncells = 16, 16, 8
    sw = DIM // m
    cents = [(i, _hash_vec(f"c{i}")) for i in range(ncells)]
    small = clustered.filter(F.col("vid") < 256).select(
        F.col("vid").alias("neighbor_id"), F.col("vec").alias("_cv")
    )
    two = _pq_encode_pandas(
        _assign_cells_pandas(small, "_cv", cents), "_cv", m, sw, ksub
    )
    fused = _assign_encode_pandas(small, "_cv", cents, m, sw, ksub)
    a = {
        r["neighbor_id"]: (r["_cell"], tuple(r["_codes"]))
        for r in two.collect()
    }
    b = {
        r["neighbor_id"]: (r["_cell"], tuple(r["_codes"]))
        for r in fused.collect()
    }
    assert len(a) == 256
    assert a == b
