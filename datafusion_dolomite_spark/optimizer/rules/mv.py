"""Materialized-view rewrite: aggregate queries answered from rollups.

The Calcite/`CREATE MATERIALIZED VIEW`-style transform: when the
catalog holds an MV that pre-aggregates ``source_table`` by a superset
of the query's group keys, an ``Aggregate(Scan(source))`` can instead
re-aggregate the MV's partials —

    Aggregate(G, A) over Scan(events)
      →  Aggregate(G, A') over [Filter] over Scan(events_mv)

with ``A'`` recombining partials exactly like eager aggregation's
final step (sum of sums, sum of counts, min/max of partials — the
``_DECOMPOSE`` table is shared).  Matching is by EXPRESSION EQUALITY:
a query aggregate rewrites only when its ``Func`` (casts stripped)
equals the expression the MV declared for one of its columns, so a
``sum(floor(value*100))`` query only matches an MV that stored exactly
that partial.  Pushed scan filters survive when they reference only MV
group columns (those columns exist verbatim in the MV).

Fired as a cascades EXPLORATION rule: both shapes enter the memo and
the cost model picks — the MV scan wins because its row count is the
group-key ndv product instead of the source cardinality.  At 100 TB
this is the continuous-aggregate pattern: the rollup is maintained
once (here: signature-keyed materialization; in production, an
incremental refresh like our streaming upsert) and every matching
query reads it instead of the fact table.

The reference has no statistics, no MVs, and two rewrite rules total;
this extends the same Rule/OptExpression machinery
(``rule.py:95-159``) the limit rules use.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

from ...expr import Alias, Cast, Col, Func
from ...operators.logical import LogicalAggregate, LogicalFilter, LogicalScan
from ..pattern import Pattern, pattern_of
from ..rule import OptExpression, OptimizerContext, Rule, RulePromise, RuleResult
from .agg import _DECOMPOSE

__all__ = [
    "MaterializedView",
    "RewriteAggOnMaterializedViewRule",
    "RewriteAggOnViewSubtreeRule",
]


@dataclass(frozen=True, eq=False)
class MaterializedView:
    """MV metadata: ``name`` is the registered catalog table holding the
    partials; ``agg_defs`` maps each partial column to the EXACT source
    expression it pre-aggregates.

    ``definition_root`` (optional) holds the Hep-NORMALIZED logical
    subtree the definition aggregated over — a single scan for simple
    rollups, a join tree for denormalized views.  When present,
    ``RewriteAggOnViewSubtreeRule`` matches query aggregates whose
    (equally normalized) input subtree is ``semantic_eq`` to it — the
    join-aware view matching simple source-table matching can't do."""

    name: str
    source_table: str
    group_cols: Tuple[str, ...]
    agg_defs: Tuple[Tuple[str, Func], ...]  # (mv_column, partial expr)
    definition_root: object = None  # PlanNode | None
    #: EXPLICIT opt-in for answering ``approx_count_distinct`` from the
    #: stored HLL sketches.  The estimator differs from Spark's native
    #: HLL++ (same error class, different estimates), so registering a
    #: sketch MV must not silently change the numbers existing queries
    #: return — the owner opts in per view.
    sketch_rewrite: bool = False


#: approx aggregates answered from RE-AGGREGABLE SKETCHES (the
#: Druid/BigQuery rollup pattern): the MV stores a mergeable sketch per
#: group (``hll_sketch_agg``), any coarser query unions them.  NOTE the
#: estimator changes (Spark's approx_count_distinct is HLL++, the
#: sketch path is DataSketches HLL) — both honor the same error class,
#: which is the only contract an approx aggregate offers; the rewrite
#: additionally requires ``MaterializedView.sketch_rewrite=True`` so a
#: registered sketch column can't silently change existing estimates.
_SKETCH_PARTIALS = {"approx_count_distinct": "hll_sketch_agg"}


def _decompose_against(agg: LogicalAggregate, mv: MaterializedView):
    """Final agg exprs recombining ``agg`` from ``mv``'s partials, or
    None when any group key / aggregate doesn't match (exact-expression
    matching; output casts re-wrap the final)."""
    if not {g.name for g in agg.group_exprs} <= set(mv.group_cols):
        return None
    defs = {expr: col_name for col_name, expr in mv.agg_defs}
    finals = []
    for a in agg.agg_exprs:
        if not isinstance(a, Alias):
            return None
        inner = a.expr
        casts: list[str] = []
        while isinstance(inner, Cast):
            casts.append(inner.to_type)
            inner = inner.expr
        if not isinstance(inner, Func):
            return None
        final: object = None
        deco = _DECOMPOSE.get(inner.name)
        if deco is not None:
            mv_col = defs.get(inner)
            if mv_col is None:
                return None
            final = Func(deco[1], (Col(mv_col),))
        elif inner.name == "avg" and len(inner.args) == 1:
            # avg recombines from a sum AND a count(x) partial (count(x),
            # not count(*): NULLs must stay excluded)
            s_col = defs.get(Func("sum", inner.args))
            c_col = defs.get(Func("count", inner.args))
            if s_col is None or c_col is None:
                return None
            from ...expr import BinOp as _BinOp

            final = _BinOp(
                "/",
                Func("sum", (Col(s_col),)),
                Func("sum", (Col(c_col),)),
            )
        elif inner.name in _SKETCH_PARTIALS and len(inner.args) == 1:
            if not mv.sketch_rewrite:
                return None
            mv_col = defs.get(Func(_SKETCH_PARTIALS[inner.name], inner.args))
            if mv_col is None:
                return None
            final = Func(
                "hll_sketch_estimate",
                (Func("hll_union_agg", (Col(mv_col),)),),
            )
        else:
            return None
        for t in reversed(casts):
            final = Cast(final, t)
        finals.append(Alias(final, a.name))
    return tuple(finals)


class RewriteAggOnMaterializedViewRule(Rule):
    name = "RewriteAggOnMaterializedViewRule"
    transformation = True

    def pattern(self) -> Pattern:
        return pattern_of(LogicalAggregate, children=(pattern_of(LogicalScan),))

    def promise(self) -> RulePromise:
        return RulePromise.LOW

    def apply(
        self, input: OptExpression, ctx: OptimizerContext, result: RuleResult
    ) -> None:
        agg: LogicalAggregate = input.root.operator
        scan: LogicalScan = input.root.inputs[0].operator
        if agg.mode != "groupby" or scan.limit is not None:
            return
        catalog = getattr(ctx, "catalog", None)
        if catalog is None or not hasattr(catalog, "materialized_views_for"):
            return
        if not all(isinstance(g, Col) for g in agg.group_exprs):
            return
        group_names = {g.name for g in agg.group_exprs}
        for mv in catalog.materialized_views_for(scan.table_name):
            alt = self._rewrite(agg, scan, mv)
            if alt is not None:
                result.add(alt)

    def _rewrite(self, agg, scan, mv):
        # pushed filters survive only over columns the MV carries verbatim
        for f in scan.filters or ():
            if not set(f.columns()) <= set(mv.group_cols):
                return None
        finals = _decompose_against(agg, mv)
        if finals is None:
            return None
        mv_scan = OptExpression.op(LogicalScan(mv.name, filters=scan.filters))
        new_agg = LogicalAggregate(
            group_exprs=agg.group_exprs, agg_exprs=finals
        )
        return OptExpression.op(new_agg, mv_scan)


class RewriteAggOnViewSubtreeRule(Rule):
    """JOIN-AWARE view matching (Hep phase): rewrite
    ``Aggregate(G, A) over S`` to re-aggregate an MV whose Hep-normalized
    definition subtree is ``semantic_eq`` to ``S`` — for denormalized
    views, ``S`` is a whole join tree.

    Why Hep, not cascades: the comparison needs the CONCRETE query
    subtree (cascades children are memo groups), and both sides must be
    in the same normal form — the definition subtree is captured after
    the definition's own Hep pass, and this rule participates in the
    query's Hep fixed point, so it keeps retrying until the query
    subtree reaches the same normal form and either matches or never
    will.  Exact-subtree matching is deliberately conservative: an extra
    WHERE or a different join set simply doesn't match (view matching
    beyond equality — predicate containment etc. — is the Calcite
    research program; equality is the sound core of it).  A matched
    rollup is strictly smaller than its input (one row per group), so
    the rewrite needs no cost race."""

    name = "RewriteAggOnViewSubtreeRule"

    def pattern(self) -> Pattern:
        return pattern_of(LogicalAggregate)

    def promise(self) -> RulePromise:
        return RulePromise.LOW

    def apply(
        self, input: OptExpression, ctx: OptimizerContext, result: RuleResult
    ) -> None:
        agg: LogicalAggregate = input.root.operator
        if agg.mode != "groupby":
            return
        if not all(isinstance(g, Col) for g in agg.group_exprs):
            return
        handle = input.root.inputs[0]
        child = getattr(handle, "handle", None)
        if child is None or not hasattr(child, "semantic_eq"):
            return
        catalog = getattr(ctx, "catalog", None)
        if catalog is None or not hasattr(catalog, "materialized_views"):
            return
        for mv in catalog.materialized_views():
            if mv.definition_root is None:
                continue
            if not child.semantic_eq(mv.definition_root):
                continue
            finals = _decompose_against(agg, mv)
            if finals is None:
                continue
            result.add(
                OptExpression.op(
                    LogicalAggregate(
                        group_exprs=agg.group_exprs, agg_exprs=finals
                    ),
                    OptExpression.op(LogicalScan(mv.name)),
                )
            )
            return
