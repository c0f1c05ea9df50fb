"""Persisted BPE tokenizer (functions/bpe.py artifact, r12 — VERDICT
r11 item 1): build-once/probe-many must be BIT-EQUAL to the inline
train-then-count chain with the same (num_merges, max_vocab) — training
is deterministic, the artifact is its output verbatim, which keeps the
DuckDB unrolled-CTE replay a valid oracle for both paths."""

import pytest

from datafusion_dolomite_spark.plans.plan import LogicalPlanBuilder


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _bpe_plan(num_merges=16, tokenizer_dir=""):
    return (
        LogicalPlanBuilder()
        .scan("documents")
        .bpe_tokens("doc_id", "text", num_merges=num_merges,
                    tokenizer_dir=tokenizer_dir)
        .build()
    )


def test_probe_bit_equal_to_inline_chain(tmp_path, planner):
    from datafusion_dolomite_spark.functions.bpe import bpe_tokenizer_build

    docs = planner.dataframe(
        LogicalPlanBuilder().scan("documents").build()
    )
    tok = str(tmp_path / "tok")
    meta = bpe_tokenizer_build(docs, tok, "text", num_merges=16)
    assert len(meta["merges"]) == 16
    inline = _rows(planner.dataframe(_bpe_plan()))
    probe_plan = _bpe_plan(tokenizer_dir=tok)
    assert "PhysicalBpeModelProbe" in planner.explain(probe_plan)
    assert _rows(planner.dataframe(probe_plan)) == inline


def test_artifact_matches_bpe_train(tmp_path, planner):
    """The persisted merge table IS bpe_train's output — both the
    _meta.json copy and the parquet merge table."""
    from datafusion_dolomite_spark.functions.bpe import (
        bpe_tokenizer_build,
        bpe_tokenizer_merges,
        bpe_train,
    )

    docs = planner.dataframe(
        LogicalPlanBuilder().scan("documents").build()
    )
    tok = str(tmp_path / "tok_eq")
    bpe_tokenizer_build(docs, tok, "text", num_merges=8)
    want = bpe_train(docs, "text", num_merges=8)
    assert bpe_tokenizer_merges(tok) == want
    pq = sorted(
        (r["seq"], r["left"], r["right"])
        for r in docs.sparkSession.read.parquet(tok + "/merges").collect()
    )
    assert [(lft, rgt) for _, lft, rgt in pq] == want


def test_meta_guard(tmp_path, planner):
    from datafusion_dolomite_spark.functions.bpe import (
        bpe_meta_matches,
        bpe_tokenizer_build,
        bpe_tokenizer_merges,
        read_bpe_meta,
    )

    with pytest.raises(ValueError, match="build first"):
        bpe_tokenizer_merges(str(tmp_path / "nope"))
    docs = planner.dataframe(
        LogicalPlanBuilder().scan("documents").build()
    )
    tok = str(tmp_path / "tok_m")
    bpe_tokenizer_build(docs, tok, "text", num_merges=8, max_vocab=1024)
    meta = read_bpe_meta(tok)
    assert bpe_meta_matches(meta, 8, 1024)
    assert not bpe_meta_matches(meta, 16, 1024)   # different model
    assert not bpe_meta_matches(meta, 8, 65536)   # different vocab cap
    assert not bpe_meta_matches(None, 8, 1024)
    # mismatched query parameterization stays inline
    mism = _bpe_plan(num_merges=16, tokenizer_dir=tok)
    spine = planner.explain(mism)
    assert "PhysicalBpeModelProbe" not in spine
    assert "PhysicalBpeTokens" in spine


def test_sql_ddl_and_auto_attach(tmp_path, planner):
    tok = str(tmp_path / "ddl_tok")
    st = planner.sql(
        "create tokenizer on documents (text) with "
        f"(merges=16, location='{tok}')"
    ).collect()[0]
    assert st["action"] == "built" and st["tokenizer_dir"] == tok
    # idempotent re-create registers without retraining
    st2 = planner.sql(
        "create tokenizer on documents (text) with "
        f"(merges=16, location='{tok}')"
    ).collect()[0]
    assert st2["action"] == "exists"
    try:
        # a plan WITHOUT tokenizer_dir now auto-attaches and probes
        plan = _bpe_plan()
        assert "PhysicalBpeModelProbe" in planner.explain(plan)
        # parameter mismatch → no attach
        assert "PhysicalBpeModelProbe" not in planner.explain(
            _bpe_plan(num_merges=8)
        )
        # bare-scan guard: a filtered corpus would retrain differently
        # inline — must NOT probe the full-table artifact
        from datafusion_dolomite_spark.expr import BinOp, Col, Lit

        filt = (
            LogicalPlanBuilder()
            .scan("documents")
            .filter(BinOp("<", Col("doc_id"), Lit(100)))
            .bpe_tokens("doc_id", "text", num_merges=16)
            .build()
        )
        assert "PhysicalBpeModelProbe" not in planner.explain(filt)
        # probed results equal the inline chain
        got = _rows(planner.dataframe(plan))
    finally:
        planner.sql("drop tokenizer on documents (text)")
    inline = _rows(planner.dataframe(_bpe_plan()))
    assert "PhysicalBpeModelProbe" not in planner.explain(_bpe_plan())
    assert got == inline
