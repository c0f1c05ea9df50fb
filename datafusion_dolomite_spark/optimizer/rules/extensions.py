"""Implementation rules for the LLM-pipeline operators.

Note ``Knn2BruteRule`` / ``Knn2IvfRule``: like the join strategies, BOTH
physical forms enter the memo and the cost model decides — brute is
exact but touches queries × corpus; IVF touches ~nprobe/ncells of it.
A ``method`` pin on the logical operator restricts the choice (users
asking for ground truth get ground truth).
"""

from __future__ import annotations

from ...operators import extensions as X
from ..pattern import Pattern, pattern_of
from ..rule import OptExpression, RuleResult, Rule

__all__ = [
    "ExactDedupImplRule",
    "MinHashDedupImplRule",
    "SimHashImplRule",
    "Knn2BruteRule",
    "Knn2PandasRule",
    "Knn2IvfRule",
    "CosineNearDupImplRule",
    "NgramJaccardImplRule",
    "AsofJoinImplRule",
    "RangeJoinImplRule",
    "UnnestImplRule",
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
                    op.id_col, op.vec_col, op.n_queries, op.k, op.ncells, op.nprobe
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
                    op.right_cols,
                ),
                *input.root.inputs,
            )
        )


class RangeJoinImplRule(Rule):
    name = "RangeJoinImplRule"

    def pattern(self) -> Pattern:
        return pattern_of(X.LogicalRangeJoin)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: X.LogicalRangeJoin = input.root.operator
        result.add(
            OptExpression.op(
                X.PhysicalBucketedRangeJoin(
                    op.left_keys, op.right_keys, op.point, op.lo, op.hi,
                    op.right_cols, op.bucket_width,
                ),
                *input.root.inputs,
            )
        )


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


EXTENSION_RULES = [
    UnnestImplRule(),
    AsofJoinImplRule(),
    RangeJoinImplRule(),
    ExactDedupImplRule(),
    MinHashDedupImplRule(),
    SimHashImplRule(),
    Knn2BruteRule(),
    Knn2PandasRule(),
    Knn2IvfRule(),
    CosineNearDupImplRule(),
    NgramJaccardImplRule(),
]
