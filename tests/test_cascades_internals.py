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
        default_cascades_rules(), ctx, cost_model=SparkCostModel(),
        enable_group_merge=False,
    )
    opt.find_best_plan(_dup_subtree_plan())
    # flag off = the reference's mark-don't-merge behavior (our DEFAULT
    # deviates: r5 flipped it on after suite-wide green with plans
    # unchanged — see CascadesOptimizer.__init__)
    assert opt.memo.enable_group_merge is False

    default_opt = CascadesOptimizer(
        default_cascades_rules(), ctx, cost_model=SparkCostModel()
    )
    default_opt.find_best_plan(_dup_subtree_plan())
    assert default_opt.memo.enable_group_merge is True


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
        default_cascades_rules(), ctx, cost_model=SparkCostModel(),
        enable_group_merge=False,
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


# --- OptimizeInputs state transitions (ref task.rs:211-511) ---------------

class TestOptimizeInputsStateTransitions:
    """The reference runs OptimizeInputs as an explicit state machine
    Init → BeforeOptimizeInput(i) → AfterOptimizeInput(i) → OptimizeSelf
    (``task.rs:211-511``); ours compresses it into a two-phase
    continuation (init / optimize_self).  These tests pin the observable
    semantics the 4-state machine guarantees:

    * Init schedules every child group BELOW the continuation, so
      optimize_self runs only after all children are fully optimized;
    * a child with no plan for its required property fails the expr
      before any cost work (BeforeOptimizeInput's bail-out);
    * the branch-and-bound bound fires MID-INPUT — accumulated child
      cost ≥ current best aborts before later children are consulted or
      the operator is costed (bound check ``task.rs:417-420``);
    * enforcer cost is included in the recorded winner's cost, and the
      un-enforced total is memoized under the default property
      (enforcer hook ``task.rs:431-462``).
    """

    @staticmethod
    def _memo_with_join():
        from datafusion_dolomite_spark.operators.physical import (
            PhysicalHashJoin,
            PhysicalTableScan,
        )

        m = Memo()
        s1, _ = m.insert_expr(PhysicalTableScan("customer"), (), None)
        s2, _ = m.insert_expr(PhysicalTableScan("nation"), (), None)
        join_op = PhysicalHashJoin(
            JoinType.INNER,
            col("c_nationkey").eq(col("n_nationkey")),
            ("c_nationkey",),
            ("n_nationkey",),
        )
        j, _ = m.insert_expr(join_op, (s1.group_id, s2.group_id), None)
        return m, s1, s2, j

    def _runner(self, memo, cost_model):
        return TaskRunner(memo, [], cost_model, None)

    def test_child_without_plan_fails_expr_before_costing(self):
        """BeforeOptimizeInput semantics: a child group with no winner
        for its required property kills the candidate — the cost model
        must never run."""
        from datafusion_dolomite_spark.optimizer.cascades.memo import Winner
        from datafusion_dolomite_spark.optimizer.cascades.tasks import (
            OptimizeInputsTask,
            _DEFAULT_PROP,
        )

        m, s1, s2, j = self._memo_with_join()
        lreq = PhysicalPropertySet(dist=DistributionSpec.hashed(("c_nationkey",)))
        rreq = PhysicalPropertySet(dist=DistributionSpec.hashed(("n_nationkey",)))
        m.group(s1.group_id).winners[lreq] = Winner(s1, 1.0, ())
        # s2 deliberately has NO winner for rreq

        class ExplodingModel:
            def estimate_cost(self, *a, **k):
                raise AssertionError("cost model must not run")

        r = self._runner(m, ExplodingModel())
        OptimizeInputsTask(j, _DEFAULT_PROP, "optimize_self", (lreq, rreq)).execute(r)
        assert m.group(j.group_id).winners == {}

    def test_bound_prunes_mid_input_without_consulting_later_children(self):
        """The task.rs:417-420 bound check runs after EACH child: once
        child 0's accumulated cost reaches the group's current best,
        child 1's group is never consulted and the operator never
        costed."""
        from datafusion_dolomite_spark.optimizer.cascades.memo import Winner
        from datafusion_dolomite_spark.optimizer.cascades.tasks import (
            OptimizeInputsTask,
            _DEFAULT_PROP,
        )

        m, s1, s2, j = self._memo_with_join()
        lreq = PhysicalPropertySet(dist=DistributionSpec.hashed(("c_nationkey",)))
        rreq = PhysicalPropertySet(dist=DistributionSpec.hashed(("n_nationkey",)))
        m.group(s1.group_id).winners[lreq] = Winner(s1, 100.0, ())
        m.group(s2.group_id).winners[rreq] = Winner(s2, 1.0, ())
        # current best for the join group: cheaper than child 0 alone
        m.group(j.group_id).winners[_DEFAULT_PROP] = Winner(j, 50.0, (lreq, rreq))

        class ExplodingModel:
            def estimate_cost(self, *a, **k):
                raise AssertionError("pruned candidate must not be costed")

        r = self._runner(m, ExplodingModel())
        consulted = []
        orig_group = r.group

        def recording_group(gid):
            consulted.append(gid)
            return orig_group(gid)

        r.group = recording_group
        OptimizeInputsTask(j, _DEFAULT_PROP, "optimize_self", (lreq, rreq)).execute(r)
        # winner unchanged, child 1 never consulted after the mid-input prune
        assert m.group(j.group_id).winners[_DEFAULT_PROP].cost == 50.0
        assert s2.group_id not in consulted

    def test_enforcer_cost_included_and_default_prop_memoized(self):
        """OptimizeSelf semantics: when the derived output property
        doesn't satisfy the requirement, the winner carries the Exchange
        enforcer and its cost (3·rows); the UN-enforced total is also
        memoized under the default property for reuse by other parents
        (enforcer hook task.rs:431-462)."""
        from datafusion_dolomite_spark.operators.properties import Statistics
        from datafusion_dolomite_spark.optimizer.cascades.memo import Winner
        from datafusion_dolomite_spark.optimizer.cascades.tasks import (
            OptimizeInputsTask,
            _DEFAULT_PROP,
        )

        m, s1, s2, j = self._memo_with_join()
        lreq = PhysicalPropertySet(dist=DistributionSpec.hashed(("c_nationkey",)))
        rreq = PhysicalPropertySet(dist=DistributionSpec.hashed(("n_nationkey",)))
        m.group(s1.group_id).winners[lreq] = Winner(s1, 1.0, ())
        m.group(s2.group_id).winners[rreq] = Winner(s2, 2.0, ())
        m.group(j.group_id).stats = Statistics(row_count=10.0)

        class FixedModel:
            def estimate_cost(self, *a, **k):
                return 5.0

        # the join outputs Hashed(c_nationkey); require a DIFFERENT hash
        required = PhysicalPropertySet(dist=DistributionSpec.hashed(("other",)))
        r = self._runner(m, FixedModel())
        OptimizeInputsTask(j, required, "optimize_self", (lreq, rreq)).execute(r)

        w = m.group(j.group_id).winners[required]
        assert w.enforcer == required.dist
        assert w.cost == pytest.approx(5.0 + 1.0 + 2.0 + 3.0 * 10.0)
        w_def = m.group(j.group_id).winners[_DEFAULT_PROP]
        assert w_def.enforcer is None
        assert w_def.cost == pytest.approx(8.0)

    def test_init_schedules_children_below_continuation(self):
        """Init semantics: the continuation is pushed BELOW the child
        OptimizeGroup tasks, so by stack discipline optimize_self pops
        only after both children are fully optimized — observed by
        stepping the scheduler and recording the pop order."""
        from datafusion_dolomite_spark.optimizer.cascades.tasks import (
            OptimizeGroupTask,
            OptimizeInputsTask,
            _DEFAULT_PROP,
        )

        m, s1, s2, j = self._memo_with_join()
        r = self._runner(m, SimpleCostModel())
        r.push(OptimizeInputsTask(j, _DEFAULT_PROP))
        popped = []
        while r.stack:
            t = r.stack.pop()
            popped.append(t)
            t.execute(r)
        self_idx = [
            i
            for i, t in enumerate(popped)
            if isinstance(t, OptimizeInputsTask)
            and t.phase == "optimize_self"
            and t.expr is j
        ]
        child_idx = [
            i
            for i, t in enumerate(popped)
            if isinstance(t, OptimizeGroupTask)
            and t.gid in (s1.group_id, s2.group_id)
        ]
        assert self_idx and child_idx
        assert min(self_idx) > max(child_idx)
        # and optimize_self found both child winners → a join winner exists
        assert m.group(j.group_id).winners.get(_DEFAULT_PROP) is not None
