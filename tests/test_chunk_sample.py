"""DocChunk + StratifiedSample operators: plan shape, schema derivation,
execution semantics."""

import pytest

from datafusion_dolomite_spark import LogicalPlanBuilder, QueryPlanner, col
from tests.conftest import SF_DIR


def test_doc_chunk_schema_derivation(catalog):
    from datafusion_dolomite_spark.optimizer.rule import OptimizerContext

    plan = (
        LogicalPlanBuilder()
        .scan("documents")
        .doc_chunk("doc_id", "text", chunk_size=40, overlap=10)
        .build()
    )
    prop = plan.root.operator.derive_logical_prop(
        tuple(
            OptimizerContext(catalog).catalog.logical_prop("documents")
            for _ in (1,)
        )
    )
    assert prop.schema.names() == ("doc_id", "n_tokens", "chunk_idx", "chunk_text")


def test_doc_chunk_rejects_bad_overlap():
    with pytest.raises(ValueError):
        LogicalPlanBuilder().scan("documents").doc_chunk(
            "doc_id", "text", chunk_size=10, overlap=10
        )


def test_doc_chunk_is_map_only_jvm(spark, catalog):
    """The Spark plan must be Generate over the scan — no Exchange, no
    Python evals: chunking has to survive a 100 TB corpus as a pure map."""
    qp = QueryPlanner(spark, catalog)
    df = qp.dataframe(
        LogicalPlanBuilder()
        .scan("documents")
        .doc_chunk("doc_id", "text", chunk_size=40, overlap=10)
        .build()
    )
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str
    assert "Generate" in plan_str
    assert "Python" not in plan_str


def test_doc_chunk_window_arithmetic(spark, catalog):
    """10-token doc, size 5, overlap 2 → starts 0,3,6: windows of 5,5,4
    tokens; every token covered; chunk 1 repeats tokens 4-5 (overlap)."""
    qp = QueryPlanner(spark, catalog)
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")], ["doc_id", "text"]
    )
    from datafusion_dolomite_spark.functions.chunking import doc_chunks

    out = {
        r["chunk_idx"]: r["chunk_text"]
        for r in doc_chunks(df, "doc_id", "text", 5, 2).collect()
    }
    assert out == {
        0: "t1 t2 t3 t4 t5",
        1: "t4 t5 t6 t7 t8",
        2: "t7 t8 t9 t10",
    }


def test_stratified_sample_deterministic_and_bounded(spark, catalog):
    qp = QueryPlanner(spark, catalog)
    plan = (
        LogicalPlanBuilder()
        .scan("documents")
        .stratified_sample(["lang"], "doc_id", k=5)
        .build()
    )
    a = sorted(tuple(r) for r in qp.dataframe(plan).collect())
    b = sorted(tuple(r) for r in qp.dataframe(plan).collect())
    assert a == b  # same sample on every run
    from collections import Counter

    per = Counter(r[2] for r in a)  # lang column
    assert all(v <= 5 for v in per.values())
    assert len(per) > 1  # multiple strata present


def test_stratified_sample_output_hashed_on_strata(catalog):
    """Physical property: output hashed on strata → downstream per-stratum
    agg reuses the partitioning (no second shuffle)."""
    from datafusion_dolomite_spark.operators.extensions import (
        PhysicalStratifiedSample,
    )
    from datafusion_dolomite_spark.operators.properties import (
        DistributionSpec,
        PhysicalPropertySet,
    )

    op = PhysicalStratifiedSample(("lang",), "doc_id", 5)
    _, out = op.derive_properties((PhysicalPropertySet(),))
    assert out.dist.satisfies(DistributionSpec.hashed(("lang",)))


def test_sequence_pack_schema_derivation(catalog):
    from datafusion_dolomite_spark.plans.plan import LogicalPlanBuilder
    from datafusion_dolomite_spark.expr import Alias, col

    plan = (
        LogicalPlanBuilder()
        .scan("documents")
        .projection([col("doc_id"), col("lang"), Alias(col("n_chars"), "n_tok")])
        .sequence_pack("doc_id", "n_tok", budget=4096, n_shards=4,
                       partition_cols=("lang",))
        .build()
    )
    names = plan.root.operator.derive_logical_prop(
        (plan.root.inputs[0].operator.derive_logical_prop(
            (catalog.logical_prop("documents"),)
        ),)
    ).schema.names()
    assert names == ("doc_id", "lang", "n_tokens", "shard", "pack_id", "pack_offset")


def test_sequence_pack_invariants(spark, catalog):
    """Every pack honors the contiguous-fill contract: within each
    (lang, shard), offsets restart at pack boundaries and pack ids are
    non-decreasing in hash order; the assignment is deterministic."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.plans.plan import LogicalPlanBuilder
    from datafusion_dolomite_spark.expr import Alias, col

    qp = QueryPlanner(spark, catalog)
    plan = (
        LogicalPlanBuilder()
        .scan("documents")
        .projection([col("doc_id"), col("lang"), Alias(col("n_chars"), "n_tok")])
        .sequence_pack("doc_id", "n_tok", budget=4096, n_shards=4,
                       partition_cols=("lang",))
        .build()
    )
    rows = [tuple(r) for r in qp.dataframe(plan).collect()]
    assert len(rows) > 0
    # deterministic across runs
    again = [tuple(r) for r in qp.dataframe(plan).collect()]
    assert sorted(rows) == sorted(again)
    from collections import defaultdict

    by_group = defaultdict(list)
    for doc_id, lang, n_tokens, shard, pack_id, pack_offset in rows:
        assert 0 <= shard < 4
        assert 0 <= pack_offset < 4096
        by_group[(lang, shard)].append((pack_id, pack_offset, n_tokens))
    for grp, items in by_group.items():
        # reconstruct: cumulative start = pack_id * 4096 + pack_offset
        starts = sorted(p * 4096 + o for p, o, _t in items)
        cum = 0
        for s, (_p, _o, t) in zip(starts, sorted(items, key=lambda x: x[0] * 4096 + x[1])):
            assert s == cum  # contiguous fill, no gaps
            cum += t


# -- weighted (priority) sampling ---------------------------------------------

def test_weighted_sample_exact_python_replay(spark):
    """The selection is a pure function of the data: an independent
    Python replay of (md5_60(id)+1)/w picks the identical set."""
    import hashlib

    from datafusion_dolomite_spark.functions.sampling import weighted_sample

    rows = [(i, (i * 37) % 50 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = sorted(r["id"] for r in weighted_sample(df, "id", "w", k=25).collect())

    def pr(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return ((h + 1) / w, i)

    want = sorted(i for i, w in sorted(rows, key=lambda t: pr(*t))[:25])
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    from datafusion_dolomite_spark.functions.sampling import weighted_sample

    # weight 1000 vs 1: heavy rows should dominate the sample
    rows = [(i, 1000 if i < 100 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [r["id"] for r in weighted_sample(df, "id", "w", k=50).collect()]
    assert sum(1 for i in got if i < 100) >= 45


def test_weighted_sample_excludes_nonpositive(spark):
    from datafusion_dolomite_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], "id long, w long"
    )
    assert [r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()] == [3]
