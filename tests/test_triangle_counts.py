"""functions/graph.py::triangle_counts — degree-ordered compact-forward
edge-iterator.  Each case compares against an exhaustive Python count."""

import itertools


from datafusion_dolomite_spark.functions.graph import triangle_counts


def _truth(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in es for n in e}
    out = {}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "x long, y long")
    res = triangle_counts(df, "x", "y")
    return {r["node"]: r["n_triangles"] for r in res.collect()}


def test_k4_complete_graph(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _run(spark, edges)
    # K4: each vertex is in C(3,2) = 3 triangles
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free_graph(spark):
    # a path and a 4-cycle — zero triangles, empty result
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 13), (13, 10)]
    assert _run(spark, edges) == {}


def test_skewed_star_plus_triangles(spark):
    # hub 0 connected to everyone (degree skew), plus rim edges forming
    # triangles through the hub — orientation must not double count
    rim = list(range(1, 30))
    edges = [(0, r) for r in rim] + [(1, 2), (3, 4), (5, 6)]
    got = _run(spark, edges)
    assert got == _truth(edges)
    assert got[0] == 3  # hub participates in all three


def test_duplicate_and_reversed_edges_are_canonicalized(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 3)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_self_loops_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 3), (3, 1), (2, 2)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_randomized_parity(spark):
    import random

    rng = random.Random(20260816)
    for trial in range(3):
        n = 25
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(120)
        ]
        assert _run(spark, edges) == _truth(edges), f"trial={trial}"


# -- k-core ------------------------------------------------------------------

def _kcore_truth(edges, k):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if sum(1 for m in adj[n] if m in alive) < k}
        if not drop:
            break
        alive -= drop
    return {
        n: sum(1 for m in adj[n] if m in alive) for n in alive
    }


def _run_kcore(spark, edges, k):
    from datafusion_dolomite_spark.functions.graph import k_core

    df = spark.createDataFrame(edges, "x long, y long")
    return {r["node"]: r["core_degree"] for r in k_core(df, "x", "y", k).collect()}


def test_kcore_peels_chain_from_clique(spark):
    # K5 plus a pendant chain: the chain must peel AWAY iteratively
    # (each removal demotes the next link) — a single degree filter
    # would keep chain nodes of initial degree 2
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = k5 + chain
    got = _run_kcore(spark, edges, 3)
    assert got == _kcore_truth(edges, 3)
    assert set(got) == {0, 1, 2, 3, 4} and all(v == 4 for v in got.values())


def test_kcore_empty_when_k_exceeds_density(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    assert _run_kcore(spark, edges, 3) == {}


def test_kcore_randomized_parity(spark):
    import random

    rng = random.Random(20260816)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    for k in (2, 4, 6):
        assert _run_kcore(spark, edges, k) == _kcore_truth(edges, k), f"k={k}"


def test_kcore_nonconvergence_raises_not_superset(spark):
    # A long path at k=2 peels ~2 nodes per round — with max_iter too
    # small the loop CANNOT reach the fixpoint, and returning the
    # partial peel would be a silent superset of the true (empty)
    # 2-core.  strict (default) raises; strict=False warns and returns
    # the partial peel.
    import warnings

    import pytest

    from datafusion_dolomite_spark.functions.graph import k_core

    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "x long, y long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(df, "x", "y", 2, max_iter=3)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = k_core(df, "x", "y", 2, max_iter=3, strict=False)
        n = out.count()
    assert any("fixpoint" in str(x.message) for x in w)
    assert n > 0  # the partial peel (a superset) is returned on request
    # with enough rounds the true fixpoint (empty 2-core) is reached
    assert k_core(df, "x", "y", 2, max_iter=30).count() == 0


def test_cooccurrence_edges_basket_cap(spark):
    # ONE hot basket of 10k items must emit C(max_basket, 2) pairs,
    # not C(10k, 2) ≈ 5e7 — the quadratic scale trap the cap exists for
    from datafusion_dolomite_spark.functions.graph import cooccurrence_edges

    rows = [(1, i) for i in range(10_000)] + [(2, 5), (2, 7), (2, 9)]
    df = spark.createDataFrame(rows, "g long, item long")
    out = cooccurrence_edges(df, "g", "item", max_basket=64)
    n = out.count()
    assert n == 64 * 63 // 2 + 3
    # deterministic prefix: the capped basket keeps its SMALLEST ids
    mx = out.agg({"v": "max"}).collect()[0][0]
    assert mx == 63
    # uncapped small baskets are exact
    exact = cooccurrence_edges(
        df.filter("g = 2"), "g", "item", max_basket=64
    ).collect()
    assert sorted((r.u, r.v) for r in exact) == [(5, 7), (5, 9), (7, 9)]

    import pytest

    with pytest.raises(ValueError, match="max_basket"):
        cooccurrence_edges(df, "g", "item", max_basket=1)
