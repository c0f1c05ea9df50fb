"""Implementation rules for the LLM-pipeline operators.

Note ``Knn2BruteRule`` / ``Knn2IvfRule``: like the join strategies, BOTH
physical forms enter the memo and the cost model decides — brute is
exact but touches queries × corpus; IVF touches ~nprobe/ncells of it.
A ``method`` pin on the logical operator restricts the choice (users
asking for ground truth get ground truth).
"""

from __future__ import annotations

from ...expr import Col
from ...operators import extensions as X
from ...operators.logical import LogicalFilter, LogicalProjection
from ..pattern import Pattern, pattern_of
from ..rule import OptExpression, RulePromise, RuleResult, Rule
from .pushdown import _and_all, _conjuncts, _handle_columns

__all__ = [
    "ExactDedupImplRule",
    "MinHashDedupImplRule",
    "SimHashImplRule",
    "Knn2BruteRule",
    "Knn2PandasRule",
    "Knn2IvfRule",
    "Knn2PqRule",
    "Knn2IndexProbeRule",
    "AttachAnnIndexRule",
    "CosineNearDupImplRule",
    "NgramJaccardImplRule",
    "SetSimJoinImplRule",
    "UnpivotImplRule",
    "AsofJoinImplRule",
    "RangeJoinImplRule",
    "RangeJoinFromConditionRule",
    "OverlapJoinImplRule",
    "OverlapJoinFromConditionRule",
    "UnnestImplRule",
    "DocChunkImplRule",
    "StratifiedSampleImplRule",
    "SequencePackImplRule",
    "Bpe2TrainRule",
    "Bpe2ModelProbeRule",
    "AttachBpeTokenizerRule",
    "PruneScanUnderBpeTokensRule",
    "SinkImplRule",
    "PushFilterThroughLeftPreservingJoinRule",
    "PushFilterThroughUnnestRule",
    "PruneUnnestInputRule",
    "EXTENSION_RULES",
]


class ExactDedupImplRule(Rule):
    name = "ExactDedupImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalExactDedup)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalExactDedup = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalExactDedup(op.key_cols, op.id_col), *input.root.inputs
            )
        )


class MinHashDedupImplRule(Rule):
    name = "MinHashDedupImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalMinHashDedup)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalMinHashDedup = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalMinHashDedup(
                    op.id_col,
                    op.text_col,
                    op.shingle_k,
                    op.num_hashes,
                    op.bands,
                    op.threshold_1000,
                ),
                *input.root.inputs,
            )
        )


class SimHashImplRule(Rule):
    name = "SimHashImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalSimHash)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalSimHash = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalSimHash(op.id_col, op.text_col, op.bits),
                *input.root.inputs,
            )
        )


class Knn2BruteRule(Rule):
    name = "Knn2BruteRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalKnn)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalKnn = input.root.operator
        if op.method not in ("brute", "any"):
            return
        result.add(
            OptExpression.op(
                X.PhysicalKnnBrute(op.id_col, op.vec_col, op.n_queries, op.k),
                *input.root.inputs,
            )
        )


class Knn2PandasRule(Rule):
    """Arrow-vectorized exact strategy — same results as brute; wins when
    per-row SQL scoring is the bottleneck (high-dim vectors)."""

    name = "Knn2PandasRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalKnn)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalKnn = input.root.operator
        if op.method not in ("pandas", "any"):
            return
        result.add(
            OptExpression.op(
                X.PhysicalKnnPandas(op.id_col, op.vec_col, op.n_queries, op.k),
                *input.root.inputs,
            )
        )


class Knn2IvfRule(Rule):
    name = "Knn2IvfRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalKnn)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalKnn = input.root.operator
        if op.method not in ("ivf", "any"):
            return
        result.add(
            OptExpression.op(
                X.PhysicalKnnIvf(
                    op.id_col, op.vec_col, op.n_queries, op.k, op.ncells,
                    op.nprobe, op.kmeans_iters,
                ),
                *input.root.inputs,
            )
        )


class Knn2PqRule(Rule):
    name = "Knn2PqRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalKnn)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalKnn = input.root.operator
        if op.method not in ("pq", "any"):
            return
        result.add(
            OptExpression.op(
                X.PhysicalKnnPq(
                    op.id_col, op.vec_col, op.n_queries, op.k,
                    op.pq_m, op.pq_ksub, op.pq_refine,
                    op.pq_ncells, op.pq_nprobe,
                    getattr(op, "pq_residual", False),
                    getattr(op, "kmeans_iters", 0),
                    getattr(op, "train_iters", 0),
                ),
                *input.root.inputs,
            )
        )


class AttachAnnIndexRule(Rule):
    """Heuristic-phase auto-attach (r11): a kNN query over a table with
    a catalog-REGISTERED ANN index (``Catalog.register_ann_index`` —
    the ``CREATE VECTOR INDEX`` DDL's bookkeeping) gets its empty
    ``index_dir`` filled, so the build-once index serves every later
    query WITHOUT the caller naming it.  The ``_meta.json``
    parameterization guard still decides: a registered index that
    doesn't match the query's m/ksub/ncells/residual simply never
    attaches, and Knn2IndexProbeRule re-checks at implementation
    time."""

    name = "AttachAnnIndexRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalKnn)

    def promise(self) -> RulePromise:
        return RulePromise.LOW

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalKnn = input.root.operator
        if op.index_dir or op.method not in ("pq", "any") or not op.pq_ncells:
            return
        cat = getattr(ctx, "catalog", None)
        if cat is None or not hasattr(cat, "ann_index_for"):
            return
        h = getattr(input.root.inputs[0], "handle", None)
        if h is None:
            return

        # the persisted codes cover the FULL table: attach ONLY when
        # the knn input is a bare, un-narrowed Scan of it — a Filter/
        # Join (or even a Scan-fused filter/limit) between scan and knn
        # means the query's corpus is a SUBSET, and probing full-table
        # codes would return neighbors the inline chain excludes
        # (ADVICE r11).  A pure column-pruning projection keeps the row
        # set intact, so it stays attachable.
        node = h
        while (
            node.operator.operator_name() == "Projection"
            and len(node.inputs) == 1
            and all(
                type(e).__name__ == "Col" for e in node.operator.exprs
            )
        ):
            node = node.inputs[0]
        sop = node.operator
        if (
            sop.operator_name() != "Scan"
            or sop.limit is not None
            or getattr(sop, "filters", ())
        ):
            return
        table = sop.table_name
        idx = cat.ann_index_for(table, op.vec_col) if table else None
        if not idx:
            return
        from ...functions.ann_index import ann_meta_matches, read_ann_meta

        if not ann_meta_matches(
            read_ann_meta(idx), op.pq_m, op.pq_ksub, op.pq_ncells,
            getattr(op, "pq_residual", False),
            getattr(op, "kmeans_iters", 0),
            getattr(op, "train_iters", 0),
        ):
            return
        import dataclasses

        result.add(
            OptExpression.op(
                dataclasses.replace(op, index_dir=idx),
                *input.root.inputs,
            )
        )


class Knn2IndexProbeRule(Rule):
    """Build-once/probe-many alternative (r11, VERDICT r10 item 1):
    when the query names a persisted ANN index whose parameterization
    matches (m/ksub/ncells/residual — the ``ann_meta_matches`` guard a
    mismatched probe would silently mis-score against), add
    ``PhysicalKnnIndexProbe`` to the memo.  The cost model prices the
    probe strictly under the inline PQ chain (the index already paid
    for training + encoding), so the race picks it whenever it's
    legal — the inline chain remains the fallback when the index is
    absent or parameterized differently."""

    name = "Knn2IndexProbeRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalKnn)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalKnn = input.root.operator
        if not op.index_dir or op.method not in ("pq", "any"):
            return
        from ...functions.ann_index import ann_meta_matches, read_ann_meta

        meta = read_ann_meta(op.index_dir)
        if not ann_meta_matches(
            meta, op.pq_m, op.pq_ksub, op.pq_ncells,
            getattr(op, "pq_residual", False),
            getattr(op, "kmeans_iters", 0),
            getattr(op, "train_iters", 0),
        ):
            return
        nprobe = op.pq_nprobe
        if nprobe == 0:
            # ADAPTIVE nprobe (r12, VERDICT r11 item 6): pick the probe
            # count from the index's cell-occupancy stats — the
            # smallest worst-case coverage of 25% of the indexed rows
            from ...functions.ann_index import ann_adaptive_nprobe

            nprobe = ann_adaptive_nprobe(meta)
        result.add(
            OptExpression.op(
                X.PhysicalKnnIndexProbe(
                    op.id_col, op.vec_col, op.n_queries, op.k,
                    nprobe, op.pq_refine, op.index_dir,
                ),
                *input.root.inputs,
            )
        )


class EmbedQuantize2SqlRule(Rule):
    """HOF-lambda strategy: JVM-side, no Python — but interpreted per
    array element with several folds per row; the cost model charges
    rows x dim at the interpreted rate."""

    name = "EmbedQuantize2SqlRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalEmbedQuantize)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalEmbedQuantize = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalEmbedQuantizeSql(
                    op.id_col, op.vec_col, op.prefix_dim, op.dim
                ),
                *input.root.inputs,
            )
        )


class EmbedQuantize2PandasRule(Rule):
    """Arrow/numpy strategy (VERDICT r6 item 6): one vectorized pass per
    Arrow batch; pays the Python transfer once — the cost race picks it
    when rows x dim outweighs the worker startup."""

    name = "EmbedQuantize2PandasRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalEmbedQuantize)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalEmbedQuantize = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalEmbedQuantizePandas(
                    op.id_col, op.vec_col, op.prefix_dim, op.dim
                ),
                *input.root.inputs,
            )
        )


class CosineNearDupImplRule(Rule):
    name = "CosineNearDupImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalCosineNearDup)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalCosineNearDup = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalCosineNearDup(
                    op.id_col, op.vec_col, op.nbits, op.threshold_1000
                ),
                *input.root.inputs,
            )
        )


class NgramJaccardImplRule(Rule):
    name = "NgramJaccardImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalNgramJaccard)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalNgramJaccard = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalNgramJaccard(
                    op.id_col, op.text_col, op.n, op.max_df, op.threshold_1000
                ),
                *input.root.inputs,
            )
        )


class UnpivotImplRule(Rule):
    name = "UnpivotImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalUnpivot)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalUnpivot = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalUnpivot(
                    op.id_cols, op.value_cols, op.name_col, op.value_col,
                    op.include_nulls,
                ),
                *input.root.inputs,
            )
        )


class SetSimJoinImplRule(Rule):
    name = "SetSimJoinImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalSetSimJoin)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalSetSimJoin = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalSetSimJoin(
                    op.id_col, op.text_col, op.side_col, op.gram,
                    op.threshold_1000,
                ),
                *input.root.inputs,
            )
        )


class AsofJoinImplRule(Rule):
    name = "AsofJoinImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalAsofJoin)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalAsofJoin = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalAsofJoinUnion(
                    op.left_keys, op.right_keys, op.left_ts, op.right_ts,
                    op.right_cols, op.tolerance, op.direction, op.strict,
                ),
                *input.root.inputs,
            )
        )


class OverlapJoinImplRule(Rule):
    name = "OverlapJoinImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalIntervalOverlapJoin)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalIntervalOverlapJoin = input.root.operator
        fields = (
            op.left_keys, op.right_keys, op.l_lo, op.l_hi,
            op.r_lo, op.r_hi, op.right_cols, op.bucket_width,
            op.incl_lr, op.incl_rl,
        )
        # both strategies enter the memo; the cost model decides (the
        # same bucketed-vs-broadcast race as the range join)
        result.add(
            OptExpression.op(
                X.PhysicalOverlapJoin(
                    *fields, op.long_left, op.long_right
                ),
                *input.root.inputs,
            )
        )
        result.add(
            OptExpression.op(
                X.PhysicalBroadcastOverlapJoin(*fields),
                *input.root.inputs,
            )
        )


class RangeJoinImplRule(Rule):
    name = "RangeJoinImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalRangeJoin)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalRangeJoin = input.root.operator
        fields = (
            op.left_keys, op.right_keys, op.point, op.lo, op.hi,
            op.right_cols, op.bucket_width,
            getattr(op, "inclusive_hi", False),
        )
        # both strategies enter the memo; the cost model decides
        result.add(
            OptExpression.op(
                X.PhysicalBucketedRangeJoin(*fields), *input.root.inputs
            )
        )
        result.add(
            OptExpression.op(
                X.PhysicalBroadcastRangeJoin(*fields), *input.root.inputs
            )
        )


def _col_affine(node, name: str, ctx):
    """Resolve output column ``name`` of a real (hep-phase) plan
    subtree to ``(base_col, a, b)``: the column's value equals
    ``a * base_col + b`` for a BASE SCAN column — walking through
    projections (via ``affine_of`` composition) and schema-passthrough
    operators.  None = not resolvable (joins, aggregates, non-affine
    exprs)."""
    from ...operators.logical import output_name
    from ..cascades.cost import affine_of

    op = node.operator
    kind = op.operator_name()
    if kind == "Projection":
        for e in op.exprs:
            if output_name(e) != name:
                continue
            aff = affine_of(e)
            if aff is None:
                return None
            s, a, b = aff
            base = _col_affine(node.inputs[0], s, ctx)
            if base is None:
                return None
            s0, a0, b0 = base
            return (s0, a * a0, a * b0 + b)
        return None
    if kind in ("Filter", "Sort", "Limit", "Distinct"):
        return _col_affine(node.inputs[0], name, ctx)
    if kind == "Scan":
        try:
            if name in ctx.catalog.schema(op.table_name).names():
                return (name, 1.0, 0.0)
        except Exception:
            pass
        return None
    return None


def _max_interval_width(node, lo: str, hi: str, ctx) -> float:
    """Upper bound on ``max(hi - lo)`` over a subtree's rows, from
    plan structure + catalog stats:

    1. when both bounds are affine images of the SAME base column with
       the SAME scale (``[x + 0, x + 30000]``), the width is the
       CONSTANT ``b_hi - b_lo`` — exact, no stats needed;
    2. otherwise ``max(hi) - min(lo)`` from the propagated column
       stats (affine projection mapping keeps footer bounds alive
       through derived tables) — loose but sound;
    3. unknown → +inf (callers keep the conservative plan).
    """
    a_lo = _col_affine(node, lo, ctx)
    a_hi = _col_affine(node, hi, ctx)
    if (
        a_lo is not None
        and a_hi is not None
        and a_lo[0] == a_hi[0]
        and abs(a_lo[1] - a_hi[1]) < 1e-12
    ):
        return abs(a_hi[2] - a_lo[2])
    try:
        from .pushdown import _subtree_stats

        st = _subtree_stats(node, ctx)
        clo, chi = st.col(lo), st.col(hi)
        return float(chi.max) - float(clo.min)
    except Exception:
        return float("inf")


class UnnestImplRule(Rule):
    name = "UnnestImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalUnnest)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalUnnest = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalGenerate(op.array_col, op.pos_col, op.val_col),
                *input.root.inputs,
            )
        )


class DocChunkImplRule(Rule):
    name = "DocChunkImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalDocChunk)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalDocChunk = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalDocChunk(
                    op.id_col, op.text_col, op.chunk_size, op.overlap
                ),
                *input.root.inputs,
            )
        )


class SinkImplRule(Rule):
    name = "SinkImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalSink)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalSink = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalSink(op.table_name, op.format, op.mv), *input.root.inputs
            )
        )


class SequencePackImplRule(Rule):
    name = "SequencePackImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalSequencePack)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalSequencePack = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalSequencePack(
                    op.id_col, op.tokens_col, op.budget, op.n_shards,
                    op.partition_cols,
                ),
                *input.root.inputs,
            )
        )


class Bpe2TrainRule(Rule):
    """Inline BPE chain: train the merge table, then count — always
    legal, and the fallback when no persisted tokenizer matches."""

    name = "Bpe2TrainRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalBpeTokens)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalBpeTokens = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalBpeTokens(
                    op.id_col, op.text_col, op.num_merges, op.max_vocab
                ),
                *input.root.inputs,
            )
        )


class Bpe2ModelProbeRule(Rule):
    """Build-once/probe-many alternative (r12, VERDICT r11 item 1 —
    the ANN-index pattern applied to the tokenizer): when the query
    names a persisted tokenizer whose (num_merges, max_vocab)
    parameterization matches, add ``PhysicalBpeModelProbe`` to the
    memo.  The cost model prices it strictly under the inline chain
    (training already paid); the inline chain remains the fallback
    when the artifact is absent or parameterized differently."""

    name = "Bpe2ModelProbeRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalBpeTokens)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalBpeTokens = input.root.operator
        if not op.tokenizer_dir:
            return
        from ...functions.bpe import bpe_meta_matches, read_bpe_meta

        if not bpe_meta_matches(
            read_bpe_meta(op.tokenizer_dir), op.num_merges, op.max_vocab
        ):
            return
        result.add(
            OptExpression.op(
                X.PhysicalBpeModelProbe(
                    op.id_col, op.text_col, op.num_merges, op.max_vocab,
                    op.tokenizer_dir,
                ),
                *input.root.inputs,
            )
        )


class PruneScanUnderBpeTokensRule(Rule):
    """``BpeTokens(Scan)`` reads exactly (id_col, text_col) — prune the
    scan so the parquet reader's ReadSchema carries only those two
    columns (the generic Projection(Scan) pruner can't see through the
    extension operator)."""

    name = "PruneScanUnderBpeTokensRule"

    def pattern(self) -> Pattern:
        from ...operators.logical import LogicalScan

        return pattern_of(X.LogicalBpeTokens,
                          children=(pattern_of(LogicalScan),))

    def apply(self, input, ctx, result: RuleResult) -> None:
        import dataclasses

        op: X.LogicalBpeTokens = input.root.operator
        scan = input.root.inputs[0].operator
        needed = [op.id_col, op.text_col]
        for f in scan.filters:
            for c in f.columns():
                if c not in needed:
                    needed.append(c)
        if scan.columns is not None and set(scan.columns) <= set(needed):
            return
        if ctx.catalog is not None:
            try:
                order = {
                    n: i
                    for i, n in enumerate(
                        ctx.catalog.schema(scan.table_name).names()
                    )
                }
            except KeyError:
                return
            if not set(needed) <= set(order):
                return
            needed.sort(key=lambda n: order[n])
        result.add(
            OptExpression.op(
                op,
                OptExpression.op(
                    dataclasses.replace(scan, columns=tuple(needed))
                ),
            )
        )


class AttachBpeTokenizerRule(Rule):
    """Heuristic-phase auto-attach (r12): a BPE-token query over a
    table with a catalog-REGISTERED tokenizer
    (``Catalog.register_bpe_tokenizer`` — the ``CREATE TOKENIZER``
    DDL's bookkeeping) gets its empty ``tokenizer_dir`` filled, so the
    build-once artifact serves every later query WITHOUT the caller
    naming it.  Same contract as ``AttachAnnIndexRule``: the artifact
    was trained on the FULL table, so it only attaches over a bare,
    un-narrowed scan (a filtered corpus would retrain differently
    inline — bit-equality demands the rows match), and the
    ``_meta.json`` guard still decides at implementation time."""

    name = "AttachBpeTokenizerRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalBpeTokens)

    def promise(self) -> RulePromise:
        return RulePromise.LOW

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalBpeTokens = input.root.operator
        if op.tokenizer_dir:
            return
        cat = getattr(ctx, "catalog", None)
        if cat is None or not hasattr(cat, "bpe_tokenizer_for"):
            return
        h = getattr(input.root.inputs[0], "handle", None)
        if h is None:
            return
        node = h
        while (
            node.operator.operator_name() == "Projection"
            and len(node.inputs) == 1
            and all(
                type(e).__name__ == "Col" for e in node.operator.exprs
            )
        ):
            node = node.inputs[0]
        sop = node.operator
        if (
            sop.operator_name() != "Scan"
            or sop.limit is not None
            or getattr(sop, "filters", ())
        ):
            return
        tok = cat.bpe_tokenizer_for(sop.table_name, op.text_col)
        if not tok:
            return
        from ...functions.bpe import bpe_meta_matches, read_bpe_meta

        if not bpe_meta_matches(
            read_bpe_meta(tok), op.num_merges, op.max_vocab
        ):
            return
        import dataclasses

        result.add(
            OptExpression.op(
                dataclasses.replace(op, tokenizer_dir=tok),
                *input.root.inputs,
            )
        )


class StratifiedSampleImplRule(Rule):
    name = "StratifiedSampleImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalStratifiedSample)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalStratifiedSample = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalStratifiedSample(op.stratum_cols, op.id_col, op.k),
                *input.root.inputs,
            )
        )


class CTERefImplRule(Rule):
    name = "CTERefImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalCTERef)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalCTERef = input.root.operator
        result.add(
            OptExpression.op(X.PhysicalCTERef(op.name, op.col_names))
        )


class RangeJoinFromConditionRule(Rule):
    """REWRITE: an inner join whose condition is equality conjuncts
    plus a point-in-interval pair — ``p >= lo AND p <(=) hi`` with the
    point on the LEFT side and both bounds on the RIGHT — lowers to
    ``LogicalRangeJoin`` (r9).  Written as a plain join (``FROM a JOIN
    b ON a.p BETWEEN b.lo AND b.hi``), Spark would execute the
    non-equi condition as a broadcast-nested-loop join — O(n·m) probes,
    the plan shape that dies first at 100 TB; the bucketed range join
    turns it into an interval-explode + EQUI-join whose cost scales
    with rows × (interval span / bucket width).  This is the rewrite
    Catalyst itself lacks (the commercial Spark runtimes ship it as
    the 'range join optimization' behind a hint — ours derives the
    bucket width from catalog statistics instead of asking the user).

    Safety: the rewrite fires only when EVERY conjunct is consumed
    (equis + the two bounds), the bounds strictly straddle sides, and
    no right column name collides with a left one — anything else
    keeps the original join.  Inclusive upper bounds (BETWEEN) carry
    through ``inclusive_hi``; the residual filter inside the physical
    operators is exact, so bucket width only affects performance."""

    name = "RangeJoinFromConditionRule"

    def pattern(self) -> Pattern:
        from ...operators.logical import LogicalJoin

        return pattern_of(LogicalJoin)

    def promise(self) -> RulePromise:
        return RulePromise.LOW  # after pushdown settles the condition

    def apply(self, input, ctx, result: RuleResult) -> None:
        from ...expr import BinOp
        from ...operators.logical import JoinType, LogicalJoin

        op: LogicalJoin = input.root.operator
        if op.join_type is not JoinType.INNER:
            return
        lh, rh = input.root.inputs
        if lh.handle is None or rh.handle is None:
            return
        lprop = getattr(lh.handle, "logical_prop", None)
        rprop = getattr(rh.handle, "logical_prop", None)
        if lprop is None or rprop is None:
            return
        lnames = list(lprop.schema.names())
        rnames = list(rprop.schema.names())
        lset, rset = set(lnames), set(rnames)
        if lset & rset:
            return  # ambiguous attribution
        conjs = _conjuncts(op.condition)
        equis: list = []
        ge = []  # (x, y) meaning x >= y, x left-side, y right-side
        lt = []  # (x, y, inclusive) meaning x < / <= y
        for c in conjs:
            if not (
                isinstance(c, BinOp)
                and isinstance(c.left, Col)
                and isinstance(c.right, Col)
            ):
                return
            a, b, cop = c.left.name, c.right.name, c.op
            if cop not in ("=", "<", "<=", ">", ">="):
                return
            # orient so the left operand is the LEFT-side column
            if a in rset and b in lset:
                a, b = b, a
                cop = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(
                    cop, cop
                )
            if not (a in lset and b in rset):
                return
            if cop == "=":
                equis.append((a, b))
            elif cop == ">=":
                ge.append((a, b))
            elif cop in ("<", "<="):
                lt.append((a, b, cop == "<="))
            else:
                return  # strict > lower bound: not the interval shape
        if len(ge) != 1 or len(lt) != 1:
            return
        (p, lo), (p2, hi, inclusive) = ge[0], lt[0]
        if p != p2 or lo == hi:
            return
        width = self._bucket_width(rh.handle, lo, hi, ctx)
        result.add(
            OptExpression.op(
                X.LogicalRangeJoin(
                    tuple(a for a, _ in equis),
                    tuple(b for _, b in equis),
                    p,
                    lo,
                    hi,
                    tuple(rnames),
                    float(width),
                    inclusive,
                ),
                *input.root.inputs,
            )
        )

    @staticmethod
    def _bucket_width(rnode, lo, hi, ctx) -> int:
        """Stats-derived bucket width: the bound columns' combined span
        over ~256 buckets — intervals then explode into a handful of
        buckets each while points spread across enough buckets to
        parallelize.  No usable stats → 1000 (correctness is the
        residual filter's either way)."""
        try:
            from .pushdown import _subtree_stats

            st = _subtree_stats(rnode, ctx)
            clo, chi = st.col(lo), st.col(hi)
            span = float(chi.max) - float(clo.min)
            if span > 0:
                return max(1, int(span // 256))
        except Exception:
            pass
        return 1000


class OverlapJoinFromConditionRule(Rule):
    """REWRITE (r10): an inner join whose condition is equality
    conjuncts plus the INTERVAL-OVERLAP pair — ``l_lo <=(<) r_hi AND
    r_lo <=(<) l_hi`` with both left bounds on the LEFT side and both
    right bounds on the RIGHT — lowers to
    ``LogicalIntervalOverlapJoin``.  This is the interval×interval
    companion of ``RangeJoinFromConditionRule`` (which needs the SAME
    left column in both inequalities — a point); written plainly,
    Spark nested-loops it.  Same safety gates: every conjunct
    consumed, bounds strictly straddle sides, no name collisions;
    anything else keeps the original join.  The residual filter inside
    the physical operator is exact, so bucket width only affects
    performance."""

    name = "OverlapJoinFromConditionRule"

    def pattern(self) -> Pattern:
        from ...operators.logical import LogicalJoin

        return pattern_of(LogicalJoin)

    def promise(self) -> RulePromise:
        return RulePromise.LOW  # after pushdown settles the condition

    def apply(self, input, ctx, result: RuleResult) -> None:
        from ...expr import BinOp
        from ...operators.logical import JoinType, LogicalJoin

        op: LogicalJoin = input.root.operator
        if op.join_type is not JoinType.INNER:
            return
        lh, rh = input.root.inputs
        if lh.handle is None or rh.handle is None:
            return
        lprop = getattr(lh.handle, "logical_prop", None)
        rprop = getattr(rh.handle, "logical_prop", None)
        if lprop is None or rprop is None:
            return
        lnames = list(lprop.schema.names())
        rnames = list(rprop.schema.names())
        lset, rset = set(lnames), set(rnames)
        if lset & rset:
            return
        conjs = _conjuncts(op.condition)
        equis: list = []
        le = []  # (l_col, r_col, inclusive): l_col <=(<) r_col
        ge = []  # (l_col, r_col, inclusive): l_col >=(>) r_col
        for c in conjs:
            if not (
                isinstance(c, BinOp)
                and isinstance(c.left, Col)
                and isinstance(c.right, Col)
            ):
                return
            a, b, cop = c.left.name, c.right.name, c.op
            if cop not in ("=", "<", "<=", ">", ">="):
                return
            if a in rset and b in lset:
                a, b = b, a
                cop = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(
                    cop, cop
                )
            if not (a in lset and b in rset):
                return
            if cop == "=":
                equis.append((a, b))
            elif cop in ("<", "<="):
                le.append((a, b, cop == "<="))
            else:
                ge.append((a, b, cop == ">="))
        if len(le) != 1 or len(ge) != 1:
            return
        (l_lo, r_hi, incl_lr) = le[0]
        (l_hi, r_lo, incl_rl) = ge[0]
        # the overlap shape needs FOUR distinct bound columns; a shared
        # left column is the point-in-interval shape —
        # RangeJoinFromConditionRule's territory
        if l_lo == l_hi or r_lo == r_hi:
            return
        width = RangeJoinFromConditionRule._bucket_width(
            rh.handle, r_lo, r_hi, ctx
        )
        # stats-gate the skew legs (r11, VERDICT r10 item 4): when the
        # widest interval a side can hold is provably under the explode
        # cap, that side's coarse legs are dead weight (~30% measured
        # on the all-short corpus).  The split is pure performance, so
        # an unprovable bound just keeps the insurance.
        from ...execute import SparkExecutor

        cap_span = SparkExecutor._RANGE_EXPLODE_CAP * float(width)
        long_left = _max_interval_width(lh.handle, l_lo, l_hi, ctx) > cap_span
        long_right = _max_interval_width(rh.handle, r_lo, r_hi, ctx) > cap_span
        result.add(
            OptExpression.op(
                X.LogicalIntervalOverlapJoin(
                    tuple(a for a, _ in equis),
                    tuple(b for _, b in equis),
                    l_lo,
                    l_hi,
                    r_lo,
                    r_hi,
                    tuple(rnames),
                    float(width),
                    incl_lr,
                    incl_rl,
                    long_left,
                    long_right,
                ),
                *input.root.inputs,
            )
        )


class RecursiveCTEImplRule(Rule):
    name = "RecursiveCTEImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalRecursiveCTE)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalRecursiveCTE = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalRecursiveCTE(
                    op.name, op.col_names, op.distinct, op.max_iter
                ),
                *input.root.inputs,
            )
        )


EXTENSION_RULES = [
    UnnestImplRule(),
    AsofJoinImplRule(),
    RangeJoinImplRule(),
    OverlapJoinImplRule(),
    ExactDedupImplRule(),
    MinHashDedupImplRule(),
    SimHashImplRule(),
    Knn2BruteRule(),
    Knn2PandasRule(),
    Knn2IvfRule(),
    Knn2PqRule(),
    Knn2IndexProbeRule(),
    EmbedQuantize2SqlRule(),
    EmbedQuantize2PandasRule(),
    CosineNearDupImplRule(),
    NgramJaccardImplRule(),
    SetSimJoinImplRule(),
    UnpivotImplRule(),
    DocChunkImplRule(),
    StratifiedSampleImplRule(),
    SequencePackImplRule(),
    Bpe2TrainRule(),
    Bpe2ModelProbeRule(),
    SinkImplRule(),
    RecursiveCTEImplRule(),
    CTERefImplRule(),
]


# -- pushdown rules through the extension operators -------------------------

class PushFilterThroughLeftPreservingJoinRule(Rule):
    """Filter above an as-of / range join: conjuncts that reference only
    LEFT columns commute with the join (both operators emit each left
    row independently of other left rows), so they push below — at 100TB
    that's the difference between filtering before or after the shuffle/
    explode.  Conjuncts touching carried right columns stay above (they
    depend on the match)."""

    name = "PushFilterThroughLeftPreservingJoinRule"

    def pattern(self) -> Pattern:
        return pattern_of(
            LogicalFilter,
            children=(pattern_of(X.LogicalAsofJoin, X.LogicalRangeJoin,
                               X.LogicalIntervalOverlapJoin),),
        )

    def promise(self) -> RulePromise:
        return RulePromise.HIGH

    def apply(self, input, ctx, result: RuleResult) -> None:
        filt: LogicalFilter = input.root.operator
        if filt.projected_columns:
            return
        join_node = input.root.inputs[0]
        op = join_node.operator
        left_h, right_h = join_node.inputs
        left_cols = _handle_columns(left_h)
        if left_cols is None:
            return
        push, keep = [], []
        for c in _conjuncts(filt.predicate):
            refs = set(c.columns())
            if refs and refs <= left_cols:
                push.append(c)
            else:
                keep.append(c)
        if not push:
            return
        new_left = OptExpression.op(LogicalFilter(_and_all(push)), left_h)
        new_join = OptExpression.op(op, new_left, OptExpression.handle(right_h.handle))
        if keep:
            result.add(OptExpression.op(LogicalFilter(_and_all(keep)), new_join))
        else:
            result.add(new_join)


class PushFilterThroughUnnestRule(Rule):
    """Filter above Unnest: conjuncts not referencing the generated
    pos/val columns push below the explode — filtering N rows instead of
    N × array_len."""

    name = "PushFilterThroughUnnestRule"

    def pattern(self) -> Pattern:
        return pattern_of(LogicalFilter, children=(pattern_of(X.LogicalUnnest),))

    def promise(self) -> RulePromise:
        return RulePromise.HIGH

    def apply(self, input, ctx, result: RuleResult) -> None:
        filt: LogicalFilter = input.root.operator
        if filt.projected_columns:
            return
        un_node = input.root.inputs[0]
        op: X.LogicalUnnest = un_node.operator
        gen = {op.pos_col, op.val_col}
        (child_h,) = un_node.inputs
        push, keep = [], []
        for c in _conjuncts(filt.predicate):
            refs = set(c.columns())
            if refs and not (refs & gen):
                push.append(c)
            else:
                keep.append(c)
        if not push:
            return
        new_child = OptExpression.op(LogicalFilter(_and_all(push)), child_h)
        new_un = OptExpression.op(op, new_child)
        if keep:
            result.add(OptExpression.op(LogicalFilter(_and_all(keep)), new_un))
        else:
            result.add(new_un)


class PruneUnnestInputRule(Rule):
    """Projection above Unnest: only the projected passthrough columns
    plus the array column are needed below — insert the narrowing
    projection so PruneScanColumns can push it into the parquet read
    (ReadSchema shrinks from the full table to 2 columns for a typical
    embedding scan)."""

    name = "PruneUnnestInputRule"

    def pattern(self) -> Pattern:
        return pattern_of(LogicalProjection, children=(pattern_of(X.LogicalUnnest),))

    def promise(self) -> RulePromise:
        return RulePromise.MEDIUM

    def apply(self, input, ctx, result: RuleResult) -> None:
        proj: LogicalProjection = input.root.operator
        un_node = input.root.inputs[0]
        op: X.LogicalUnnest = un_node.operator
        (child_h,) = un_node.inputs
        child_cols = _handle_columns(child_h)
        if child_cols is None:
            return
        used: set = set()
        for e in proj.exprs:
            used |= set(e.columns())
        needed = (used - {op.pos_col, op.val_col}) | {op.array_col}
        if child_cols <= needed:
            return  # already minimal — fixed point
        schema = child_h.handle.logical_prop.schema
        keep = [n for n in schema.names() if n in needed]
        new_child = OptExpression.op(
            LogicalProjection(tuple(Col(n) for n in keep)), child_h
        )
        result.add(OptExpression.op(proj, OptExpression.op(op, new_child)))
