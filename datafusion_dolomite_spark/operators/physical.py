"""Physical operators.

The reference reuses the logical structs under a ``Physical`` enum variant
(``dolomite/src/operator/physical.rs:15-20``) and adds a
``derive_properties`` trait (required child props + output prop,
``physical.rs:34-41``).  We model each physical choice as its own
dataclass, because — unlike the reference, which has exactly one join
strategy (``PhysicalHashJoin``) and no physical Limit at all (SURVEY
§2.2) — a Spark-backed engine must distinguish strategies that differ by
orders of magnitude at scale:

* shuffle hash join vs **broadcast** hash join vs sort-merge join,
* global sort vs **top-k** (Spark ``TakeOrderedAndProject``),
* hash aggregate (map-side partial agg comes free from Spark).

``derive_properties(children_props) -> (required_child_props, output_prop)``
mirrors the reference trait; ``Exchange``/``SortEnforcer`` are the enforcer
operators the reference declares but never emits
(``properties/physical.rs:16-25``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from ..expr import Alias, Expr, SortKey
from .logical import JoinType, Operator
from .properties import DistributionSpec, OrderSpec, PhysicalPropertySet

__all__ = [
    "PhysicalOperator",
    "PhysicalTableScan",
    "PhysicalValues",
    "PhysicalFilter",
    "PhysicalProjection",
    "PhysicalHashJoin",
    "PhysicalBroadcastHashJoin",
    "PhysicalSaltedReplicateJoin",
    "PhysicalSortMergeJoin",
    "PhysicalLimit",
    "PhysicalHashAggregate",
    "PhysicalSaltedHashAggregate",
    "PhysicalSort",
    "PhysicalTopK",
    "PhysicalDistinct",
    "PhysicalWindow",
    "PhysicalUnion",
    "PhysicalIntersect",
    "PhysicalExcept",
    "Exchange",
]

_DEFAULT = PhysicalPropertySet()


class PhysicalOperator(Operator):
    def derive_properties(
        self, children_props: Tuple[PhysicalPropertySet, ...]
    ) -> Tuple[Tuple[PhysicalPropertySet, ...], PhysicalPropertySet]:
        """Return (required properties per child, output property).

        Default: no requirements, Random/unordered output — matching the
        reference's scan derivation (``table_scan.rs:43-53``).
        """
        return tuple(_DEFAULT for _ in children_props), _DEFAULT


@dataclass(frozen=True)
class PhysicalTableScan(PhysicalOperator):
    table_name: str
    limit: Optional[int] = None
    filters: Tuple[Expr, ...] = ()
    columns: Optional[Tuple[str, ...]] = None

    def pretty(self) -> str:
        parts = [f'table_name: "{self.table_name}"']
        if self.limit is not None:
            parts.append(f"limit: {self.limit}")
        if self.filters:
            parts.append(f"filters: [{', '.join(f.pretty() for f in self.filters)}]")
        if self.columns is not None:
            parts.append(f"columns: [{', '.join(self.columns)}]")
        return "PhysicalTableScan { " + ", ".join(parts) + " }"


@dataclass(frozen=True)
class PhysicalValues(PhysicalOperator):
    """Driver-local literal relation (Spark ``LocalRelation``)."""

    rows: Tuple[Tuple, ...]
    names: Tuple[str, ...]
    dtypes: Tuple[str, ...]

    def pretty(self) -> str:
        return (
            f"PhysicalValues {{ rows: {len(self.rows)}, "
            f"cols: [{', '.join(self.names)}] }}"
        )


@dataclass(frozen=True)
class PhysicalFilter(PhysicalOperator):
    predicate: Expr
    projected_columns: Tuple[str, ...] = ()

    def derive_properties(self, children_props):
        # Filter preserves child distribution/order.
        return (_DEFAULT,), (children_props[0] if children_props else _DEFAULT)

    def pretty(self) -> str:
        return f"PhysicalFilter {{ expr: {self.predicate.pretty()} }}"


@dataclass(frozen=True)
class PhysicalProjection(PhysicalOperator):
    exprs: Tuple[Expr, ...]

    def derive_properties(self, children_props):
        return (_DEFAULT,), (children_props[0] if children_props else _DEFAULT)

    def pretty(self) -> str:
        return (
            "PhysicalProjection { expr: ["
            + ", ".join(e.pretty() for e in self.exprs)
            + "] }"
        )


@dataclass(frozen=True)
class PhysicalHashJoin(PhysicalOperator):
    """Shuffle hash join: both sides hash-partitioned on the join keys.

    Ref ``PhysicalHashJoin`` requires default child props
    (``operator/join.rs:34-47``); ours states the real requirement —
    ``Hashed(left_keys)`` / ``Hashed(right_keys)`` — which Spark's
    ``EnsureRequirements`` satisfies with shuffle exchanges.
    """

    join_type: JoinType
    condition: Expr
    left_keys: Tuple[str, ...] = ()
    right_keys: Tuple[str, ...] = ()
    #: user hint pinned this strategy — the cost model lets it win
    forced: bool = False
    #: see LogicalJoin.stream_repartition (carried through lowering)
    stream_repartition: str = ""

    def derive_properties(self, children_props):
        if self.left_keys:
            req = (
                PhysicalPropertySet(dist=DistributionSpec.hashed(self.left_keys)),
                PhysicalPropertySet(dist=DistributionSpec.hashed(self.right_keys)),
            )
            out = PhysicalPropertySet(dist=DistributionSpec.hashed(self.left_keys))
        else:
            req = (_DEFAULT, _DEFAULT)
            out = _DEFAULT
        return req, out

    def pretty(self) -> str:
        return (
            f"PhysicalHashJoin {{ join_type: {self.join_type.name.title()}, "
            f"expr: {self.condition.pretty()} }}"
        )


@dataclass(frozen=True)
class PhysicalBroadcastHashJoin(PhysicalOperator):
    """Broadcast the (small) right side to every executor — no shuffle of
    the big side.  THE key join strategy at 100 TB: a dimension table a few
    MB wide must never force a 100 TB fact-table shuffle.  Emitted when the
    cost model sees build-side row count under the broadcast threshold.
    Equivalent of DataFusion's ``HashJoinExec mode=CollectLeft``
    (``datafusion-dolomite-integration/src/planner.rs:206``) — Spark's
    ``BroadcastHashJoinExec`` via ``F.broadcast`` hint.
    """

    join_type: JoinType
    condition: Expr
    #: user hint pinned this strategy — the cost model lets it win
    forced: bool = False
    #: see LogicalJoin.stream_repartition (carried through lowering)
    stream_repartition: str = ""

    def derive_properties(self, children_props):
        # Probe side streams through unchanged; its distribution survives.
        return (_DEFAULT, _DEFAULT), (
            children_props[0] if children_props else _DEFAULT
        )

    def pretty(self) -> str:
        return (
            f"PhysicalBroadcastHashJoin {{ join_type: {self.join_type.name.title()}, "
            f"expr: {self.condition.pretty()} }}"
        )


@dataclass(frozen=True)
class PhysicalSaltedReplicateJoin(PhysicalHashJoin):
    """Skew-proof shuffle equi-join: salt the (big, skew-keyed) LEFT
    probe side with a per-row salt in ``[0, n_salts)`` and REPLICATE the
    (smaller) right build side ``n_salts`` times, joining on
    (keys, salt).  The hot probe key — which a plain shuffle join sends
    to ONE reducer, the straggler that dominates wall-clock at 100 TB —
    fans out over ``n_salts`` reducers, at the price of shuffling the
    build side ``n_salts``× .

    A cost-raced ALTERNATIVE (``Join2SaltedReplicateJoinRule``): it wins
    exactly when the probe key's catalog mode frequency
    (``ColumnStatistics.top_count``) overhangs the fair per-reducer
    share by more than the replication cost, and when the build side is
    too big to broadcast outright (a broadcast join has no key shuffle
    at all, so it is immune to probe-key skew and beats this whenever
    it's admissible).  The manual ``functions/skew.py::
    salted_broadcast_replicate_join`` has offered this shape since r2;
    this operator is the optimizer CHOOSING it (VERDICT r6 item 4).

    Internally repartitions on (keys, salt), so it neither requires nor
    produces a ``Hashed(keys)`` distribution — stated honestly below so
    a downstream aggregate on the join key still gets its Exchange."""

    n_salts: int = 8

    def derive_properties(self, children_props):
        # Spark inserts the (keys + salt) exchanges for the inner join;
        # the output is partitioned on (keys, salt) which does NOT
        # satisfy Hashed(keys) — no requirements, no claims.
        return (_DEFAULT, _DEFAULT), _DEFAULT

    def pretty(self) -> str:
        return (
            f"PhysicalSaltedReplicateJoin {{ salts: {self.n_salts}, "
            f"join_type: {self.join_type.name.title()}, "
            f"expr: {self.condition.pretty()} }}"
        )


@dataclass(frozen=True)
class PhysicalSortMergeJoin(PhysicalOperator):
    """Sort-merge join: requires hash distribution + sort on keys.
    Spark's default for large-large equi-joins; spills gracefully where a
    hash join would OOM — the safe strategy when BOTH sides are huge."""

    join_type: JoinType
    condition: Expr
    left_keys: Tuple[str, ...] = ()
    right_keys: Tuple[str, ...] = ()
    #: user hint pinned this strategy — the cost model lets it win
    forced: bool = False

    def derive_properties(self, children_props):
        lreq = PhysicalPropertySet(
            dist=DistributionSpec.hashed(self.left_keys),
            order=OrderSpec(tuple((k, True, True) for k in self.left_keys)),
        )
        rreq = PhysicalPropertySet(
            dist=DistributionSpec.hashed(self.right_keys),
            order=OrderSpec(tuple((k, True, True) for k in self.right_keys)),
        )
        out = PhysicalPropertySet(dist=DistributionSpec.hashed(self.left_keys))
        return (lreq, rreq), out

    def pretty(self) -> str:
        return (
            f"PhysicalSortMergeJoin {{ join_type: {self.join_type.name.title()}, "
            f"expr: {self.condition.pretty()} }}"
        )


@dataclass(frozen=True)
class PhysicalLimit(PhysicalOperator):
    """The reference has NO physical limit (cascades cannot implement Limit
    plans — SURVEY §2.2 flags the gap and tells us not to copy it)."""

    limit: int
    offset: int = 0

    def derive_properties(self, children_props):
        # Global limit gathers to a single partition.
        return (_DEFAULT,), PhysicalPropertySet(dist=DistributionSpec.singleton())

    def pretty(self) -> str:
        if self.offset:
            return f"PhysicalLimit {{ limit: {self.limit}, offset: {self.offset} }}"
        return f"PhysicalLimit {{ limit: {self.limit} }}"


@dataclass(frozen=True)
class PhysicalHashAggregate(PhysicalOperator):
    """Hash aggregate; Spark performs the partial (map-side) aggregation
    automatically, so one node covers partial+final."""

    group_exprs: Tuple[Expr, ...] = ()
    agg_exprs: Tuple[Alias, ...] = ()
    mode: str = "groupby"
    grouping_sets: Tuple[Tuple[int, ...], ...] = ()

    def derive_properties(self, children_props):
        keys = tuple(
            e.name for e in self.group_exprs if hasattr(e, "name") and isinstance(getattr(e, "name"), str)
        )
        if keys:
            out = PhysicalPropertySet(dist=DistributionSpec.hashed(keys))
        else:
            out = PhysicalPropertySet(dist=DistributionSpec.singleton())
        return (_DEFAULT,), out

    def pretty(self) -> str:
        return (
            "PhysicalHashAggregate { group: ["
            + ", ".join(e.pretty() for e in self.group_exprs)
            + "], agg: ["
            + ", ".join(e.pretty() for e in self.agg_exprs)
            + "] }"
        )


@dataclass(frozen=True)
class PhysicalSaltedHashAggregate(PhysicalHashAggregate):
    """Skew-proof two-stage aggregate: stage 1 groups by
    (keys + salt) so the hottest key fans out over ``n_salts`` reducers,
    stage 2 merges the partials by the true keys (count→sum, sum→sum,
    min→min, max→max, collect_list→flatten, collect_set→flatten+dedup).

    An ALTERNATIVE the cost race picks over the plain hash aggregate
    when the group key's mode frequency (``ColumnStatistics.top_count``)
    exceeds the fair per-reducer share AND the aggregates carry payload
    (collect_*) that map-side combine cannot shrink — the one
    aggregation shape where a hot key genuinely ships every row to one
    reducer.  For collapsible aggregates (count/sum/min/max) partial
    aggregation already bounds the hot key at one partial per map
    partition, so the salted plan's extra shuffle loses the race — by
    design, not by gating (see SparkCostModel).  Derived properties are
    the parent's: stage 2 leaves the data hash-distributed on the true
    keys."""

    n_salts: int = 8

    def pretty(self) -> str:
        return (
            f"PhysicalSaltedHashAggregate {{ salts: {self.n_salts}, group: ["
            + ", ".join(e.pretty() for e in self.group_exprs)
            + "], agg: ["
            + ", ".join(e.pretty() for e in self.agg_exprs)
            + "] }"
        )


@dataclass(frozen=True)
class PhysicalSort(PhysicalOperator):
    """Global (range-partitioned) sort."""

    keys: Tuple[SortKey, ...]

    def derive_properties(self, children_props):
        from ..expr import Col

        order = OrderSpec(
            tuple(
                (k.expr.name if isinstance(k.expr, Col) else k.expr.pretty(), k.asc, k.nulls_first)
                for k in self.keys
            )
        )
        return (_DEFAULT,), PhysicalPropertySet(order=order)

    def pretty(self) -> str:
        return "PhysicalSort { keys: [" + ", ".join(k.pretty() for k in self.keys) + "] }"


@dataclass(frozen=True)
class PhysicalTopK(PhysicalOperator):
    """Fused Sort+Limit → Spark ``TakeOrderedAndProject``: each partition
    keeps k rows, driver merges — no global sort shuffle.  At 100 TB a
    global sort for a LIMIT 100 would be catastrophic; this is the plan a
    scale-aware optimizer must pick."""

    keys: Tuple[SortKey, ...]
    limit: int = 0

    def derive_properties(self, children_props):
        from ..expr import Col

        order = OrderSpec(
            tuple(
                (k.expr.name if isinstance(k.expr, Col) else k.expr.pretty(), k.asc, k.nulls_first)
                for k in self.keys
            )
        )
        return (_DEFAULT,), PhysicalPropertySet(
            dist=DistributionSpec.singleton(), order=order
        )

    def pretty(self) -> str:
        return (
            "PhysicalTopK { keys: ["
            + ", ".join(k.pretty() for k in self.keys)
            + f"], limit: {self.limit} }}"
        )


@dataclass(frozen=True)
class PhysicalDistinct(PhysicalOperator):
    columns: Tuple[str, ...] = ()

    def derive_properties(self, children_props):
        if self.columns:
            out = PhysicalPropertySet(dist=DistributionSpec.hashed(self.columns))
        else:
            out = _DEFAULT
        return (_DEFAULT,), out

    def pretty(self) -> str:
        if self.columns:
            return f"PhysicalDistinct {{ columns: [{', '.join(self.columns)}] }}"
        return "PhysicalDistinct"


@dataclass(frozen=True)
class PhysicalWindow(PhysicalOperator):
    """Window exec: requires hash distribution on the partition keys +
    sort within partitions (Spark inserts both; stated here so the
    property framework reflects the real shuffle)."""

    window_exprs: Tuple = ()

    def derive_properties(self, children_props):
        from ..expr import Col

        keys = []
        for w in self.window_exprs:
            for e in w.partition_by:
                if isinstance(e, Col) and e.name not in keys:
                    keys.append(e.name)
        if keys:
            out = PhysicalPropertySet(dist=DistributionSpec.hashed(tuple(keys)))
        else:
            out = PhysicalPropertySet()
        return (PhysicalPropertySet(),), out

    def pretty(self) -> str:
        return (
            "PhysicalWindow { exprs: ["
            + ", ".join(w.pretty() for w in self.window_exprs)
            + "] }"
        )


@dataclass(frozen=True)
class PhysicalUnion(PhysicalOperator):
    by_name: bool = False

    def pretty(self) -> str:
        return "PhysicalUnion { by_name }" if self.by_name else "PhysicalUnion"


@dataclass(frozen=True)
class PhysicalIntersect(PhysicalOperator):
    """INTERSECT [ALL] — hash-shuffle both sides on all columns; Spark
    plans the distinct form as a left-semi aggregate, the ALL form as a
    count-compare over a full-columns aggregate."""

    all: bool = False

    def pretty(self) -> str:
        return "PhysicalIntersectAll" if self.all else "PhysicalIntersect"


@dataclass(frozen=True)
class PhysicalExcept(PhysicalOperator):
    """EXCEPT [ALL] — hash-shuffle both sides on all columns; Spark
    plans the distinct form as a left-anti aggregate, the ALL form as a
    count-difference replicate."""

    all: bool = False

    def pretty(self) -> str:
        return "PhysicalExceptAll" if self.all else "PhysicalExcept"


@dataclass(frozen=True)
class Exchange(PhysicalOperator):
    """Distribution enforcer (ref declares the mechanism but returns no
    enforcers, ``properties/physical.rs:16-25``; consumed at
    ``cascades/task.rs:431-462``).  Execution maps it to
    ``df.repartition(cols)`` — Spark elides it when redundant."""

    dist: DistributionSpec = None  # type: ignore[assignment]

    def derive_properties(self, children_props):
        return (_DEFAULT,), PhysicalPropertySet(dist=self.dist)

    def pretty(self) -> str:
        return f"Exchange {{ dist: {self.dist.pretty()} }}"
