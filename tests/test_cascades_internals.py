"""Cascades internals: binding enumeration, OptimizeInputs phases,
enforcers, branch-and-bound, duplicate marking.

Tier-1 parity with the reference's subtlest tests:
* multi-binding cartesian product — ``cascades/binding.rs:125-318``
* apply-rule inside memo — ``cascades/task.rs:620-694``
* winner bookkeeping — ``memo.rs:605-629``
* mark-don't-merge duplicates — ``task.rs:146-149``
"""

import pytest

from datafusion_dolomite_spark import JoinType, LogicalPlanBuilder, col
from datafusion_dolomite_spark.operators.logical import LogicalJoin, LogicalScan
from datafusion_dolomite_spark.operators.physical import Exchange, PhysicalHashJoin
from datafusion_dolomite_spark.operators.properties import (
    DistributionKind,
    DistributionSpec,
    OrderSpec,
    PhysicalPropertySet,
)
from datafusion_dolomite_spark.optimizer.cascades.cost import (
    SimpleCostModel,
    SparkCostModel,
)
from datafusion_dolomite_spark.optimizer.cascades.memo import Memo
from datafusion_dolomite_spark.optimizer.cascades.optimizer import CascadesOptimizer
from datafusion_dolomite_spark.optimizer.cascades.tasks import TaskRunner, _bindings
from datafusion_dolomite_spark.optimizer.pattern import pattern_of
from datafusion_dolomite_spark.optimizer.rules.impl_rules import IMPLEMENTATION_RULES
from datafusion_dolomite_spark.optimizer.rules.join import (
    CommutateJoinRule,
    Join2HashJoinRule,
)
from datafusion_dolomite_spark.optimizer.rules.impl_rules import Scan2TableScanRule
from datafusion_dolomite_spark.planner import default_cascades_rules


def _join_plan():
    return (
        LogicalPlanBuilder()
        .scan("customer")
        .join(
            LogicalPlanBuilder().scan("nation"),
            JoinType.INNER,
            col("c_nationkey").eq(col("n_nationkey")),
        )
        .build()
    )


# --- binding enumeration (ref binding.rs:125-318) -------------------------

def test_binding_wildcard_leaf(ctx):
    memo = Memo.from_plan(_join_plan(), ctx)
    join_expr = memo.group(memo.root_group_id).logical_exprs[0]
    binds = _bindings(memo, pattern_of(LogicalJoin), join_expr)
    assert len(binds) == 1
    # children are opaque group handles
    assert all(b.is_handle for b in binds[0].inputs)


def test_binding_cartesian_product_across_group_exprs(ctx):
    """After commutation the root group has TWO logical join exprs; a
    pattern with a Join CHILD pattern must enumerate one binding per
    (outer, inner) combination — the cartesian product."""
    opt = CascadesOptimizer(
        [Scan2TableScanRule(), Join2HashJoinRule(), CommutateJoinRule()],
        ctx,
        cost_model=SimpleCostModel(),
    )
    # join ON TOP of a join group that gets commutated
    inner = (
        LogicalPlanBuilder()
        .scan("customer")
        .join(
            LogicalPlanBuilder().scan("nation"),
            JoinType.INNER,
            col("c_nationkey").eq(col("n_nationkey")),
        )
    )
    plan = inner.join(
        LogicalPlanBuilder().scan("region"),
        JoinType.INNER,
        col("n_regionkey").eq(col("r_regionkey")),
    ).build()
    opt.find_best_plan(plan)
    memo = opt.memo
    root_expr = memo.group(memo.root_group_id).logical_exprs[0]
    inner_join_gid = root_expr.inputs[0]
    inner_exprs = [
        e for e in memo.group(inner_join_gid).logical_exprs
        if isinstance(e.operator, LogicalJoin)
    ]
    assert len(inner_exprs) == 2  # original + commutated
    binds = _bindings(
        memo,
        pattern_of(LogicalJoin, children=(pattern_of(LogicalJoin), pattern_of(LogicalScan))),
        root_expr,
    )
    assert len(binds) == 2  # one per inner-join alternative


# --- winners / properties -------------------------------------------------

def test_winner_has_input_props_for_extraction(ctx):
    opt = CascadesOptimizer(
        default_cascades_rules(), ctx, cost_model=SparkCostModel()
    )
    best = opt.find_best_plan(_join_plan())
    default = PhysicalPropertySet()
    w = opt.memo.group(opt.memo.root_group_id).winner(default)
    assert w is not None
    assert len(w.input_props) == len(w.expr.inputs)


def test_enforcer_exchange_emitted_for_forced_hash_join(ctx):
    """With ONLY the shuffle-hash strategy available, children must be
    hash-distributed → scans get Exchange enforcers."""
    rules = [*IMPLEMENTATION_RULES, Join2HashJoinRule()]
    opt = CascadesOptimizer(rules, ctx, cost_model=SparkCostModel())
    best = opt.find_best_plan(_join_plan())
    ops = [type(n.operator) for n in best.bfs_iterator()]
    assert ops.count(Exchange) == 2
    exchanges = [n.operator for n in best.bfs_iterator() if isinstance(n.operator, Exchange)]
    assert {e.dist.columns for e in exchanges} == {("c_nationkey",), ("n_nationkey",)}


def test_satisfies_real_not_stubbed():
    """The reference stubs satisfies to true (distribution.rs:16-20,
    order.rs:21-25); ours is real."""
    hashed = DistributionSpec.hashed(("a",))
    assert not DistributionSpec.random().satisfies(hashed)
    assert DistributionSpec.singleton().satisfies(hashed)
    assert DistributionSpec.hashed(("a",)).satisfies(hashed)
    assert not DistributionSpec.hashed(("b",)).satisfies(hashed)
    o1 = OrderSpec((("a", True, True),))
    assert OrderSpec((("a", True, True), ("b", True, True))).satisfies(o1)
    assert not OrderSpec((("b", True, True),)).satisfies(o1)


def test_branch_and_bound_prunes(ctx, monkeypatch):
    """Second join strategy must be pruned once a cheaper winner exists:
    count cost-model calls with/without an existing winner."""
    calls = []
    model = SparkCostModel()
    orig = model.estimate_cost

    def counting(op, stats, c=None):
        calls.append(type(op).__name__)
        return orig(op, stats, c)

    model.estimate_cost = counting
    opt = CascadesOptimizer(default_cascades_rules(), ctx, cost_model=model)
    opt.find_best_plan(_join_plan())
    # all three join strategies were COSTED (search explored them)…
    assert "PhysicalBroadcastHashJoin" in calls
    # …but the chosen plan is the broadcast one (cheapest)
    w = opt.memo.group(opt.memo.root_group_id).winner(PhysicalPropertySet())
    assert "Broadcast" in type(w.expr.operator).__name__


def test_duplicate_detection_marks_not_merges(ctx):
    """Commutating twice regenerates an existing expr → dedup hit, no new
    group, groups never merged (ref task.rs:146-149)."""
    opt = CascadesOptimizer(
        [Scan2TableScanRule(), Join2HashJoinRule(), CommutateJoinRule()],
        ctx,
        cost_model=SimpleCostModel(),
    )
    opt.find_best_plan(_join_plan())
    memo = opt.memo
    assert len(memo.group(memo.root_group_id).logical_exprs) == 2  # not 3+
    # group count stays 3 (2 scans + join) — no accidental group creation
    assert len(memo.groups) == 3


def test_memoization_hit_skips_reoptimization(ctx):
    opt = CascadesOptimizer(default_cascades_rules(), ctx, cost_model=SparkCostModel())
    opt.find_best_plan(_join_plan())
    runner_groups = opt.memo.groups
    # every group's winner map contains the default prop exactly once
    default = PhysicalPropertySet()
    for g in runner_groups.values():
        assert default in g.winners


def test_scheduler_budget_guard(ctx):
    runner = TaskRunner(Memo.from_plan(_join_plan(), ctx), [], SimpleCostModel(), ctx)

    class Loop:
        def execute(self, r):
            r.push(Loop())

    runner.push(Loop())
    with pytest.raises(RuntimeError, match="budget"):
        # drain manually with the guard
        steps = 0
        while runner.stack:
            runner.stack.pop().execute(runner)
            steps += 1
            if steps > 2_000_000:
                raise RuntimeError("cascades task budget exceeded")


def _dup_subtree_plan():
    """Two syntactically different routes to the same subtree: after
    commutation, Join(region, nation) in one group and Join(nation,
    region) in another produce identical child exprs — duplicate-group
    detection territory (ref task.rs:146-149)."""
    from datafusion_dolomite_spark import JoinType, LogicalPlanBuilder, col

    left = (
        LogicalPlanBuilder()
        .scan("nation")
        .join(
            LogicalPlanBuilder().scan("region"),
            JoinType.INNER,
            col("n_regionkey").eq(col("r_regionkey")),
        )
    )
    return (
        left.join(
            LogicalPlanBuilder().scan("customer"),
            JoinType.INNER,
            col("n_nationkey").eq(col("c_nationkey")),
        )
        .build()
    )


def test_group_merge_flag_off_marks_pending(ctx):
    from datafusion_dolomite_spark.optimizer.cascades.optimizer import (
        CascadesOptimizer,
    )
    from datafusion_dolomite_spark.optimizer.cascades.cost import SparkCostModel
    from datafusion_dolomite_spark.planner import default_cascades_rules

    opt = CascadesOptimizer(
        default_cascades_rules(), ctx, cost_model=SparkCostModel()
    )
    opt.find_best_plan(_dup_subtree_plan())
    # default = the reference's mark-don't-merge behavior
    assert opt.memo.enable_group_merge is False


def test_group_merge_flag_on_merges_and_plan_unchanged(ctx):
    """With merging enabled: no pending merges remain recorded, the memo
    has no two groups holding an identical expr key, and the chosen plan
    equals the flag-off plan (merging dedups the search space, it must
    not change the winner)."""
    from datafusion_dolomite_spark.optimizer.cascades.optimizer import (
        CascadesOptimizer,
    )
    from datafusion_dolomite_spark.optimizer.cascades.cost import SparkCostModel
    from datafusion_dolomite_spark.planner import default_cascades_rules

    off = CascadesOptimizer(
        default_cascades_rules(), ctx, cost_model=SparkCostModel()
    )
    plan_off = off.find_best_plan(_dup_subtree_plan())

    on = CascadesOptimizer(
        default_cascades_rules(), ctx, cost_model=SparkCostModel(),
        enable_group_merge=True,
    )
    plan_on = on.find_best_plan(_dup_subtree_plan())

    assert plan_on.explain() == plan_off.explain()
    # structural invariant: each expr key lives in exactly one group
    seen = {}
    for gid, g in on.memo.groups.items():
        for e in g.logical_exprs + g.physical_exprs:
            assert e.key() not in seen or seen[e.key()] == gid, (
                f"expr {e} appears in groups {seen[e.key()]} and {gid}"
            )
            seen[e.key()] = gid
    # with merging on, fewer (or equal) groups than with it off
    assert len(on.memo.groups) <= len(off.memo.groups)


def test_group_merge_direct_insert():
    """Unit-level: inserting the same (operator, inputs) key into two
    different target groups merges them when the flag is on."""
    from datafusion_dolomite_spark.operators.logical import LogicalLimit, LogicalScan
    from datafusion_dolomite_spark.optimizer.cascades.memo import Memo

    m = Memo(enable_group_merge=True)
    scan_expr, _ = m.insert_expr(LogicalScan("t"), (), None)
    g_scan = scan_expr.group_id
    a, _ = m.insert_expr(LogicalLimit(5), (g_scan,), None)
    b, _ = m.insert_expr(LogicalLimit(7), (g_scan,), None)
    assert a.group_id != b.group_id
    # same key as `a` but forced into b's group → groups merge
    c, _ = m.insert_expr(LogicalLimit(5), (g_scan,), b.group_id)
    assert m._resolve(a.group_id) == m._resolve(b.group_id) == c.group_id
    merged = m.group(c.group_id)
    keys = {e.key() for e in merged.logical_exprs}
    assert (LogicalLimit(5), (g_scan,)) in keys
    assert (LogicalLimit(7), (g_scan,)) in keys

    m2 = Memo(enable_group_merge=False)
    s2, _ = m2.insert_expr(LogicalScan("t"), (), None)
    x, _ = m2.insert_expr(LogicalLimit(5), (s2.group_id,), None)
    y, _ = m2.insert_expr(LogicalLimit(7), (s2.group_id,), None)
    m2.insert_expr(LogicalLimit(5), (s2.group_id,), y.group_id)
    assert m2.pending_merges  # marked, not merged — reference behavior
    assert x.group_id != y.group_id
