"""Logical operators.

Reference parity (``dolomite/src/operator/logical.rs:12-18``):
``LogicalScan``/``LogicalFilter``/``LogicalProjection``/``LogicalJoin``/
``LogicalLimit`` with the same fields and schema-derivation semantics
(see SURVEY §2.1 for file:line citations).

Extensions beyond the reference (SURVEY §2.4 marks these absent there;
BASELINE.json's north star mandates them): ``LogicalAggregate``,
``LogicalSort``, ``LogicalDistinct``, ``LogicalUnion``, plus the
LLM-data-pipeline operators in ``datafusion_dolomite_spark/functions``
which compile down to these.

Every operator implements ``derive_logical_prop(input_props) ->
LogicalProperty`` bottom-up, exactly like the reference's
``DeriveLogicalProp`` (``operator/table_scan.rs:61-73`` for scan,
``filter.rs:38-57``, ``projection.rs:42-60``, ``join.rs:49-66``,
``limit.rs:22-32``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional, Tuple

from ..expr import Alias, Col, Expr, Func, SortKey, output_name
from .properties import Field, LogicalProperty, Schema

__all__ = [
    "Operator",
    "LogicalOperator",
    "JoinType",
    "LogicalScan",
    "LogicalValues",
    "LogicalFilter",
    "LogicalProjection",
    "LogicalJoin",
    "LogicalLimit",
    "LogicalAggregate",
    "LogicalSort",
    "LogicalDistinct",
    "LogicalUnion",
    "LogicalIntersect",
    "LogicalExcept",
    "WindowExprDef",
    "LogicalWindow",
]


class Operator:
    """Common base (ref ``operator/mod.rs:32-36`` wraps Logical|Physical)."""

    def operator_name(self) -> str:
        return type(self).__name__.removeprefix("Logical").removeprefix("Physical")

    def is_logical(self) -> bool:
        return isinstance(self, LogicalOperator)

    def pretty(self) -> str:  # overridden
        return type(self).__name__


class LogicalOperator(Operator):
    def derive_logical_prop(self, input_props) -> LogicalProperty:
        raise NotImplementedError


class JoinType(enum.Enum):
    """DataFusion's JoinType surface (``operator/join.rs``); the reference's
    rules only exercise INNER (``rules/join.rs:38``) but we support the
    full set end-to-end."""

    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    FULL = "full"
    LEFT_SEMI = "left_semi"
    LEFT_ANTI = "left_anti"


@dataclass(frozen=True)
class LogicalScan(LogicalOperator):
    """Read a named catalog table; optional fused limit, plus (extension)
    pushed-down filters and pruned columns.

    Ref: ``operator/table_scan.rs:14-32`` — ``{table_name, limit}``.
    The ``filters``/``columns`` fields are our addition so that rewrite
    rules can push predicates/pruning INTO the scan; at execution they sit
    adjacent to ``spark.read.parquet`` and Catalyst turns them into parquet
    ``PushedFilters`` / ``ReadSchema`` pruning — which is what makes a scan
    of a 100 TB table read only the bytes it must.
    """

    table_name: str
    limit: Optional[int] = None
    filters: Tuple[Expr, ...] = ()
    columns: Optional[Tuple[str, ...]] = None

    def derive_logical_prop(self, input_props, catalog=None) -> LogicalProperty:
        if catalog is None:
            raise ValueError(f"scan of {self.table_name!r} needs a catalog")
        schema = catalog.schema(self.table_name)
        if self.columns is not None:
            schema = schema.select(self.columns)
        return LogicalProperty(schema)

    def pretty(self) -> str:
        parts = [f'table_name: "{self.table_name}"']
        if self.limit is not None:
            parts.append(f"limit: {self.limit}")
        if self.filters:
            parts.append(f"filters: [{', '.join(f.pretty() for f in self.filters)}]")
        if self.columns is not None:
            parts.append(f"columns: [{', '.join(self.columns)}]")
        return "LogicalScan { " + ", ".join(parts) + " }"


@dataclass(frozen=True)
class LogicalValues(LogicalOperator):
    """Inline literal relation (SQL ``VALUES``) — a leaf like scan, but
    data lives in the plan.  The reference has only ``EmptyTable``
    (SURVEY §2.4); this mirrors DataFusion's ``LogicalPlan::Values`` /
    Spark's ``LocalRelation``.  Executes as a driver-local DataFrame
    (broadcast-friendly: a VALUES dim joined to a big fact always takes
    the broadcast side)."""

    rows: Tuple[Tuple, ...]
    names: Tuple[str, ...]
    dtypes: Tuple[str, ...]

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return LogicalProperty(
            Schema(
                tuple(
                    Field(n, t, True) for n, t in zip(self.names, self.dtypes)
                )
            )
        )

    def pretty(self) -> str:
        return (
            f"LogicalValues {{ rows: {len(self.rows)}, "
            f"cols: [{', '.join(self.names)}] }}"
        )


@dataclass(frozen=True)
class LogicalFilter(LogicalOperator):
    """Predicate + fused column pruning.

    Faithful to the reference's unusual shape: ``{filter: Expr,
    projected_columns: Vec<Column>}`` where the output schema is the
    projected subset of the input (``operator/filter.rs:14-18,38-57``).
    Empty ``projected_columns`` (our relaxation) means passthrough schema.
    """

    predicate: Expr
    projected_columns: Tuple[str, ...] = ()

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        if not self.projected_columns:
            return inp
        return LogicalProperty(inp.schema.select(self.projected_columns))

    def pretty(self) -> str:
        s = f"LogicalFilter {{ expr: {self.predicate.pretty()}"
        if self.projected_columns:
            s += f", projected_columns: [{', '.join(self.projected_columns)}]"
        return s + " }"


@dataclass(frozen=True)
class LogicalProjection(LogicalOperator):
    """Compute expression list (ref ``operator/projection.rs:15-18``);
    output schema from expression names/types (``projection.rs:42-60``)."""

    exprs: Tuple[Expr, ...]

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        fields = []
        for e in self.exprs:
            name = output_name(e)
            dtype = _infer_dtype(e, inp.schema)
            fields.append(Field(name, dtype))
        return LogicalProperty(Schema(tuple(fields)))

    def pretty(self) -> str:
        return (
            "LogicalProjection { expr: ["
            + ", ".join(e.pretty() for e in self.exprs)
            + "] }"
        )


@dataclass(frozen=True)
class LogicalJoin(LogicalOperator):
    """Binary join with arbitrary condition expression.

    Ref ``operator/join.rs:14-18``: ``{join_type, expr}``; output schema is
    left ⊕ right (``join.rs:49-66``). Semi/anti joins output only the left
    side (Spark semantics, matching DataFusion's).
    """

    join_type: JoinType
    condition: Expr
    #: non-empty → hash-repartition the LEFT (stream) side on this
    #: column before executing.  Set by the rowid-aggregation subquery
    #: lowering when the condition has no equality conjunct: Spark
    #: plans a BroadcastNestedLoopJoin there and sizes the stream side
    #: by BYTES (AQE coalesces a small-by-bytes outer to one task),
    #: but the compute is |outer|×|inner| — quadratic.  Pre-hashing on
    #: the unique rowid spreads that work evenly AND satisfies the
    #: post-join rowid re-aggregation's distribution (BNLJ preserves
    #: stream-side partitioning), so the exchange count is unchanged —
    #: the aggregate's shuffle just moves before the join.
    stream_repartition: str = ""

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        left, right = input_props
        if self.join_type in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI):
            return left
        return LogicalProperty(left.schema.concat(right.schema))

    def equi_keys(self) -> Optional[Tuple[Tuple[str, str], ...]]:
        """Extract ``l = r`` equi-join column pairs from a conjunction, or
        None if the condition isn't a pure equi-join."""
        from ..expr import BinOp

        pairs = []
        conjs = (
            self.condition.conjuncts()
            if isinstance(self.condition, BinOp)
            else (self.condition,)
        )
        for c in conjs:
            if (
                isinstance(c, BinOp)
                and c.op == "="
                and isinstance(c.left, Col)
                and isinstance(c.right, Col)
            ):
                pairs.append((c.left.name, c.right.name))
            else:
                return None
        return tuple(pairs)

    def pretty(self) -> str:
        return (
            f"LogicalJoin {{ join_type: {self.join_type.name.title()}, "
            f"expr: {self.condition.pretty()} }}"
        )


@dataclass(frozen=True)
class LogicalLimit(LogicalOperator):
    """Keep first N rows after skipping OFFSET; schema passthrough (ref
    ``operator/limit.rs``; the reference has no OFFSET,
    ``conversion/logical.rs:58-64`` — ours is an extension the limit
    rules respect by only fusing when offset == 0)."""

    limit: int
    offset: int = 0

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        return inp

    def pretty(self) -> str:
        if self.offset:
            return f"LogicalLimit {{ limit: {self.limit}, offset: {self.offset} }}"
        return f"LogicalLimit {{ limit: {self.limit} }}"


@dataclass(frozen=True)
class LogicalAggregate(LogicalOperator):
    """GROUP BY + aggregate expressions (absent in the reference —
    SURVEY §2.4 'Aggregations: absent' — added per north star).

    ``group_exprs`` are plain exprs (usually ``Col``); ``agg_exprs`` must
    be ``Alias(Func(...))`` so output column names are deterministic and
    match the DuckDB oracle (driver compares by sorted column name).
    """

    group_exprs: Tuple[Expr, ...] = ()
    agg_exprs: Tuple[Alias, ...] = ()
    mode: str = "groupby"  # 'groupby' | 'rollup' | 'cube' | 'grouping_sets'
    #: for mode='grouping_sets': each inner tuple holds indexes into
    #: ``group_exprs`` naming one grouping set
    grouping_sets: Tuple[Tuple[int, ...], ...] = ()

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        fields = []
        for e in self.group_exprs:
            fields.append(Field(output_name(e), _infer_dtype(e, inp.schema)))
        for a in self.agg_exprs:
            fields.append(Field(a.name, _infer_dtype(a, inp.schema)))
        return LogicalProperty(Schema(tuple(fields)))

    def pretty(self) -> str:
        mode = "" if self.mode == "groupby" else f", mode: {self.mode}"
        if self.mode == "grouping_sets":
            mode += f" {list(map(list, self.grouping_sets))}"
        return (
            "LogicalAggregate { group: ["
            + ", ".join(e.pretty() for e in self.group_exprs)
            + "], agg: ["
            + ", ".join(e.pretty() for e in self.agg_exprs)
            + f"]{mode} }}"
        )


@dataclass(frozen=True)
class LogicalSort(LogicalOperator):
    """Total-order sort (absent in the reference; ordering exists there only
    as a physical property, ``properties/order.rs``). Schema passthrough."""

    keys: Tuple[SortKey, ...]

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        return inp

    def pretty(self) -> str:
        return "LogicalSort { keys: [" + ", ".join(k.pretty() for k in self.keys) + "] }"


@dataclass(frozen=True)
class LogicalDistinct(LogicalOperator):
    """DISTINCT over optional column subset (extension).

    ``columns=()`` → distinct over all columns, schema passthrough;
    otherwise keeps one arbitrary-but-deterministic row per key when
    executed via aggregate-first semantics.
    """

    columns: Tuple[str, ...] = ()

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        return inp

    def pretty(self) -> str:
        if self.columns:
            return f"LogicalDistinct {{ columns: [{', '.join(self.columns)}] }}"
        return "LogicalDistinct"


@dataclass(frozen=True)
class WindowExprDef:
    """One windowed column: func OVER (PARTITION BY ... ORDER BY ...
    [ROWS|RANGE BETWEEN s AND e]).  ``frame`` = (kind, start, end) with
    kind in ('rows', 'range'); start/end are offsets (negative =
    preceding, 0 = current row, None = unbounded)."""

    func: Expr
    partition_by: Tuple[Expr, ...]
    order_by: Tuple[SortKey, ...]
    name: str
    frame: Optional[Tuple[str, Optional[int], Optional[int]]] = None

    def pretty(self) -> str:
        parts = ", ".join(e.pretty() for e in self.partition_by)
        orders = ", ".join(k.pretty() for k in self.order_by)
        fr = ""
        if self.frame is not None:
            kind, s_, e_ = self.frame

            def b(v, side):
                if v is None:
                    return f"unbounded {side}"
                if v == 0:
                    return "current row"
                return f"{abs(v)} {'preceding' if v < 0 else 'following'}"

            fr = f" {kind} between {b(s_, 'preceding')} and {b(e_, 'following')}"
        return (
            f"{self.func.pretty()} over (partition by [{parts}] "
            f"order by [{orders}]{fr}) as {self.name}"
        )


@dataclass(frozen=True)
class LogicalWindow(LogicalOperator):
    """Window functions (absent in the reference — SURVEY §2.4 'Window
    functions: absent').  Appends one column per window expression."""

    window_exprs: Tuple[WindowExprDef, ...]

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        extra = []
        for w in self.window_exprs:
            dtype = (
                "int"
                if isinstance(w.func, Func)
                and w.func.name in ("row_number", "rank", "dense_rank")
                else _infer_dtype(w.func, inp.schema)
            )
            extra.append(Field(w.name, dtype))
        return LogicalProperty(Schema(inp.schema.fields + tuple(extra)))

    def pretty(self) -> str:
        return (
            "LogicalWindow { exprs: ["
            + ", ".join(w.pretty() for w in self.window_exprs)
            + "] }"
        )


@dataclass(frozen=True)
class LogicalUnion(LogicalOperator):
    """UNION ALL of N inputs by column position (extension).
    ``by_name=True`` (DuckDB's UNION BY NAME, r11) matches columns by
    NAME instead, null-filling ones a side lacks — Spark's
    ``unionByName(allowMissingColumns=True)``."""

    by_name: bool = False

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        if not self.by_name:
            return input_props[0]
        from .properties import Field, LogicalProperty, Schema

        fields = []
        seen = set()
        for p in input_props:
            for f in p.schema.fields:
                if f.name not in seen:
                    seen.add(f.name)
                    fields.append(Field(f.name, f.dtype, True))
        return LogicalProperty(Schema(tuple(fields)))

    def pretty(self) -> str:
        return "LogicalUnion { by_name }" if self.by_name else "LogicalUnion"


@dataclass(frozen=True)
class LogicalIntersect(LogicalOperator):
    """INTERSECT [ALL], by column position (extension).  Default = SQL
    set semantics (distinct rows present in both inputs); ``all=True``
    keeps bag semantics (each row min(count_left, count_right) times)."""

    all: bool = False

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return input_props[0]

    def pretty(self) -> str:
        return "LogicalIntersectAll" if self.all else "LogicalIntersect"


@dataclass(frozen=True)
class LogicalExcept(LogicalOperator):
    """EXCEPT [ALL], by column position (extension).  Default = SQL set
    semantics (distinct left rows absent from the right); ``all=True``
    keeps bag semantics (each row max(count_left - count_right, 0)
    times)."""

    all: bool = False

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return input_props[0]

    def pretty(self) -> str:
        return "LogicalExceptAll" if self.all else "LogicalExcept"


# ---------------------------------------------------------------------------

_NUMERIC_RESULT = {
    "sum": "double",
    "avg": "double",
    "stddev": "double",
    # epoch extractors return bigint regardless of their timestamp arg
    # (without these, Func falls through to its Cast argument's type and
    # labels ts_us/hour_bucket columns 'timestamp')
    "unix_micros": "bigint",
    "unix_millis": "bigint",
    "unix_seconds": "bigint",
    "unix_timestamp": "bigint",
}


def _infer_dtype(e: Expr, schema: Schema) -> str:
    """Best-effort type inference for schema derivation.

    The reference gets exact types from DataFusion's ``expr.to_field``
    (``projection.rs:42-60``); we approximate — Spark itself re-derives
    exact types at execution, and our golden tests compare names/shape.
    """
    from ..expr import BinOp, Cast, Lit

    if isinstance(e, Alias):
        return _infer_dtype(e.expr, schema)
    if isinstance(e, Col):
        try:
            return schema.field(e.name).dtype
        except KeyError:
            return "string"
    if isinstance(e, Cast):
        return e.to_type
    if isinstance(e, Lit):
        v = e.value
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "bigint"
        if isinstance(v, float):
            return "double"
        return "string"
    if isinstance(e, Func):
        if e.name in ("count", "count_distinct", "approx_count_distinct"):
            return "bigint"
        if e.name in _NUMERIC_RESULT:
            return _NUMERIC_RESULT[e.name]
        if e.name == "split":
            return "array<string>"
        if e.name == "sequence":
            return "array<bigint>"
        if e.name in ("collect_list", "collect_set", "array"):
            elem = _infer_dtype(e.args[0], schema) if e.args else "string"
            return f"array<{elem}>"
        if e.name in ("array_distinct", "array_sort", "slice", "filter") and e.args:
            return _infer_dtype(e.args[0], schema)  # array in, array out
        if e.args:
            return _infer_dtype(e.args[0], schema)
        return "string"
    if isinstance(e, BinOp):
        if e.op in ("=", "!=", "<", "<=", ">", ">=", "and", "or"):
            return "boolean"
        return _infer_dtype(e.left, schema)
    return "string"
