"""Plan DAG + builder.

Reference parity:
* ``PlanNode`` = id + operator + inputs + optional logical prop / stats /
  physical props (``dolomite/src/plan/mod.rs:40-63,125-160``).  Like the
  reference, equality deliberately IGNORES ``id`` (``plan/mod.rs:54-63``).
* ``Plan`` is a single-root DAG with a BFS iterator
  (``plan/mod.rs:65-123``); "we use one data structure to represent a
  plan" across phases (``plan/mod.rs:42-44``) — one class serves logical,
  optimized-logical and physical plans here too.
* ``LogicalPlanBuilder`` mirrors ``dolomite/src/plan/logical.rs:19-98``
  (each call allocates a node and re-roots), extended with
  aggregate/sort/distinct/union which the reference lacks.
"""

from __future__ import annotations

import itertools
from collections import deque
from typing import Iterator, Optional, Sequence, Tuple

from ..expr import Alias, Expr, SortKey, _wrap
from ..operators.logical import (
    JoinType,
    LogicalAggregate,
    LogicalDistinct,
    LogicalExcept,
    LogicalFilter,
    LogicalIntersect,
    LogicalJoin,
    LogicalLimit,
    LogicalOperator,
    LogicalProjection,
    LogicalScan,
    LogicalValues,
    LogicalSort,
    LogicalUnion,
    Operator,
)
from ..operators.properties import LogicalProperty, PhysicalPropertySet, Statistics

__all__ = ["PlanNode", "Plan", "LogicalPlanBuilder", "next_plan_node_id"]

_ids = itertools.count(1)


def next_plan_node_id() -> int:
    return next(_ids)


class PlanNode:
    """Mutable node (the optimizers rewrite in place like the reference's
    petgraph-based HepOptimizer); hashed by identity, compared by content
    minus id."""

    __slots__ = ("id", "operator", "inputs", "logical_prop", "stats", "physical_props")

    def __init__(
        self,
        operator: Operator,
        inputs: Sequence["PlanNode"] = (),
        logical_prop: Optional[LogicalProperty] = None,
        stats: Optional[Statistics] = None,
        physical_props: Optional[PhysicalPropertySet] = None,
        id: Optional[int] = None,
    ):
        self.id = next_plan_node_id() if id is None else id
        self.operator = operator
        self.inputs: list[PlanNode] = list(inputs)
        self.logical_prop = logical_prop
        self.stats = stats
        self.physical_props = physical_props

    def __repr__(self) -> str:
        return f"PlanNode#{self.id}({self.operator.pretty()})"

    def semantic_eq(self, other: "PlanNode") -> bool:
        """Content equality ignoring ids (ref ``plan/mod.rs:54-63``)."""
        if self.operator != other.operator or len(self.inputs) != len(other.inputs):
            return False
        return all(a.semantic_eq(b) for a, b in zip(self.inputs, other.inputs))


class Plan:
    """Single-root DAG (ref ``plan/mod.rs:65-123``)."""

    def __init__(self, root: PlanNode):
        self.root = root

    def bfs_iterator(self) -> Iterator[PlanNode]:
        """Breadth-first, de-duplicated (the DAG may share subtrees)."""
        seen: set[int] = set()
        q: deque[PlanNode] = deque([self.root])
        while q:
            node = q.popleft()
            if node.id in seen:
                continue
            seen.add(node.id)
            yield node
            q.extend(node.inputs)

    def nodes_bottom_up(self) -> list[PlanNode]:
        return list(reversed(list(self.bfs_iterator())))

    def semantic_eq(self, other: "Plan") -> bool:
        return self.root.semantic_eq(other.root)

    def explain(self) -> str:
        from .explain import explain_to_string

        return explain_to_string(self)


class LogicalPlanBuilder:
    """Fluent builder (ref ``plan/logical.rs:19-98``).

    Binary ops (``join``/``union``) take the other side as a finished
    ``Plan`` or builder, matching the reference's
    ``builder.join(other_root, ...)`` shape (``dolomite/README.md:8-38``).
    """

    def __init__(self, root: Optional[PlanNode] = None):
        self._root = root

    def _push(self, op: LogicalOperator, inputs: Sequence[PlanNode]) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(PlanNode(op, inputs))

    def scan(
        self,
        table_name: str,
        limit: Optional[int] = None,
        filters: Sequence[Expr] = (),
        columns: Optional[Sequence[str]] = None,
    ) -> "LogicalPlanBuilder":
        op = LogicalScan(
            table_name,
            limit,
            tuple(filters),
            tuple(columns) if columns is not None else None,
        )
        return self._push(op, [])

    def values(
        self,
        rows: Sequence[Sequence],
        names: Sequence[str],
        dtypes: Sequence[str],
    ) -> "LogicalPlanBuilder":
        op = LogicalValues(
            tuple(tuple(r) for r in rows), tuple(names), tuple(dtypes)
        )
        return self._push(op, [])

    def filter(self, predicate: Expr, projected_columns: Sequence[str] = ()) -> "LogicalPlanBuilder":
        return self._push(
            LogicalFilter(predicate, tuple(projected_columns)), [self._require_root()]
        )

    def projection(self, exprs: Sequence[Expr]) -> "LogicalPlanBuilder":
        return self._push(
            LogicalProjection(tuple(_wrap(e) for e in exprs)), [self._require_root()]
        )

    # alias matching Spark vocabulary
    select = projection

    def join(
        self,
        other: "LogicalPlanBuilder | Plan | PlanNode",
        join_type: JoinType,
        condition: Expr,
        stream_repartition: str = "",
    ) -> "LogicalPlanBuilder":
        return self._push(
            LogicalJoin(join_type, condition, stream_repartition),
            [self._require_root(), _as_node(other)],
        )

    def limit(self, n: int, offset: int = 0) -> "LogicalPlanBuilder":
        return self._push(LogicalLimit(n, offset), [self._require_root()])

    def aggregate(
        self,
        group_exprs: Sequence[Expr],
        agg_exprs: Sequence[Alias],
        mode: str = "groupby",
        grouping_sets: Sequence[Sequence[int]] = (),
    ) -> "LogicalPlanBuilder":
        for a in agg_exprs:
            if not isinstance(a, Alias):
                raise TypeError(
                    "agg_exprs must be Alias(Func(...)) so output names are "
                    f"deterministic; got {a!r}"
                )
        if mode not in ("groupby", "rollup", "cube", "grouping_sets"):
            raise ValueError(f"unknown aggregate mode {mode!r}")
        if (mode == "grouping_sets") != bool(grouping_sets):
            raise ValueError("grouping_sets requires mode='grouping_sets'")
        return self._push(
            LogicalAggregate(
                tuple(group_exprs),
                tuple(agg_exprs),
                mode,
                tuple(tuple(g) for g in grouping_sets),
            ),
            [self._require_root()],
        )

    def sort(self, keys: Sequence[SortKey]) -> "LogicalPlanBuilder":
        return self._push(LogicalSort(tuple(keys)), [self._require_root()])

    def distinct(self, columns: Sequence[str] = ()) -> "LogicalPlanBuilder":
        return self._push(LogicalDistinct(tuple(columns)), [self._require_root()])

    def union(self, *others: "LogicalPlanBuilder | Plan | PlanNode") -> "LogicalPlanBuilder":
        return self._push(
            LogicalUnion(), [self._require_root(), *(_as_node(o) for o in others)]
        )

    def intersect(self, other: "LogicalPlanBuilder | Plan | PlanNode") -> "LogicalPlanBuilder":
        return self._push(
            LogicalIntersect(), [self._require_root(), _as_node(other)]
        )

    def except_(self, other: "LogicalPlanBuilder | Plan | PlanNode") -> "LogicalPlanBuilder":
        return self._push(
            LogicalExcept(), [self._require_root(), _as_node(other)]
        )

    def window(self, window_exprs) -> "LogicalPlanBuilder":
        from ..operators.logical import LogicalWindow

        return self._push(
            LogicalWindow(tuple(window_exprs)), [self._require_root()]
        )

    # -- LLM-pipeline extension operators (SURVEY §7 Phase 3) ----------
    def exact_dedup(self, key_cols: Sequence[str], id_col: str) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalExactDedup

        return self._push(
            LogicalExactDedup(tuple(key_cols), id_col), [self._require_root()]
        )

    def minhash_dedup(
        self,
        id_col: str,
        text_col: str,
        shingle_k: int = 3,
        num_hashes: int = 12,
        bands: int = 3,
        threshold_1000: int = 300,
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalMinHashDedup

        return self._push(
            LogicalMinHashDedup(
                id_col, text_col, shingle_k, num_hashes, bands, threshold_1000
            ),
            [self._require_root()],
        )

    def simhash(self, id_col: str, text_col: str, bits: int = 32) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalSimHash

        return self._push(
            LogicalSimHash(id_col, text_col, bits), [self._require_root()]
        )

    def doc_chunk(
        self,
        id_col: str,
        text_col: str,
        chunk_size: int = 64,
        overlap: int = 16,
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalDocChunk

        return self._push(
            LogicalDocChunk(id_col, text_col, chunk_size, overlap),
            [self._require_root()],
        )

    def stratified_sample(
        self, stratum_cols: Sequence[str], id_col: str, k: int = 100
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalStratifiedSample

        return self._push(
            LogicalStratifiedSample(tuple(stratum_cols), id_col, k),
            [self._require_root()],
        )

    def sink(
        self, table_name: str, format: str = "parquet"
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalSink

        return self._push(
            LogicalSink(table_name, format), [self._require_root()]
        )

    def sequence_pack(
        self,
        id_col: str,
        tokens_col: str,
        budget: int = 2048,
        n_shards: int = 8,
        partition_cols: Sequence[str] = (),
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalSequencePack

        return self._push(
            LogicalSequencePack(
                id_col, tokens_col, budget, n_shards, tuple(partition_cols)
            ),
            [self._require_root()],
        )

    def knn(
        self,
        id_col: str,
        vec_col: str,
        n_queries: int = 5,
        k: int = 10,
        method: str = "brute",
        ncells: int = 8,
        nprobe: int = 3,
        kmeans_iters: int = 0,
        pq_m: int = 8,
        pq_ksub: int = 16,
        pq_refine: int = 0,
        pq_ncells: int = 0,
        pq_nprobe: int = 3,
        pq_residual: bool = False,
        index_dir: str = "",
        train_iters: int = 0,
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalKnn

        return self._push(
            LogicalKnn(
                id_col, vec_col, n_queries, k, method, ncells, nprobe,
                kmeans_iters, pq_m, pq_ksub, pq_refine, pq_ncells,
                pq_nprobe, pq_residual, index_dir,
                train_iters=train_iters,
            ),
            [self._require_root()],
        )

    def bpe_tokens(
        self,
        id_col: str,
        text_col: str,
        num_merges: int = 16,
        max_vocab: int = 65536,
        tokenizer_dir: str = "",
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalBpeTokens

        return self._push(
            LogicalBpeTokens(
                id_col, text_col, num_merges, max_vocab, tokenizer_dir
            ),
            [self._require_root()],
        )

    def embed_quantize(
        self,
        id_col: str,
        vec_col: str,
        prefix_dim: int = 16,
        dim: int = 64,
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalEmbedQuantize

        return self._push(
            LogicalEmbedQuantize(id_col, vec_col, prefix_dim, dim),
            [self._require_root()],
        )

    def cosine_near_dup(
        self, id_col: str, vec_col: str, nbits: int = 12, threshold_1000: int = 900
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalCosineNearDup

        return self._push(
            LogicalCosineNearDup(id_col, vec_col, nbits, threshold_1000),
            [self._require_root()],
        )

    def ngram_jaccard(
        self,
        id_col: str,
        text_col: str,
        n: int = 12,
        max_df: int = 3,
        threshold_1000: int = 500,
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalNgramJaccard

        return self._push(
            LogicalNgramJaccard(id_col, text_col, n, max_df, threshold_1000),
            [self._require_root()],
        )

    def unpivot(
        self,
        id_cols: Sequence[str],
        value_cols: Sequence[str],
        name_col: str = "name",
        value_col: str = "value",
        include_nulls: bool = False,
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalUnpivot

        return self._push(
            LogicalUnpivot(
                tuple(id_cols), tuple(value_cols), name_col, value_col,
                include_nulls,
            ),
            [self._require_root()],
        )

    def set_sim_join(
        self,
        id_col: str,
        text_col: str,
        side_col: str,
        gram: int = 2,
        threshold_1000: int = 800,
    ) -> "LogicalPlanBuilder":
        from ..operators.extensions import LogicalSetSimJoin

        return self._push(
            LogicalSetSimJoin(id_col, text_col, side_col, gram, threshold_1000),
            [self._require_root()],
        )

    def asof_join(
        self,
        other: "LogicalPlanBuilder | Plan | PlanNode",
        left_keys: Sequence[str],
        right_keys: Sequence[str],
        left_ts: str,
        right_ts: str,
        right_cols: Sequence[str],
        tolerance: "int | None" = None,
        direction: str = "backward",
        strict: bool = False,
    ) -> "LogicalPlanBuilder":
        """As-of join — backward (default) / forward / nearest match,
        inclusive or strict (see LogicalAsofJoin docstring)."""
        from ..operators.extensions import LogicalAsofJoin

        return self._push(
            LogicalAsofJoin(
                tuple(left_keys), tuple(right_keys), left_ts, right_ts,
                tuple(right_cols), tolerance, direction, strict,
            ),
            [self._require_root(), _as_node(other)],
        )

    def overlap_join(
        self,
        other: "LogicalPlanBuilder | Plan | PlanNode",
        l_lo: str,
        l_hi: str,
        r_lo: str,
        r_hi: str,
        right_cols: Sequence[str],
        left_keys: Sequence[str] = (),
        right_keys: Sequence[str] = (),
        bucket_width: float = 1000.0,
        incl_lr: bool = True,
        incl_rl: bool = True,
    ) -> "LogicalPlanBuilder":
        """Interval OVERLAP join (see LogicalIntervalOverlapJoin)."""
        from ..operators.extensions import LogicalIntervalOverlapJoin

        return self._push(
            LogicalIntervalOverlapJoin(
                tuple(left_keys), tuple(right_keys), l_lo, l_hi,
                r_lo, r_hi, tuple(right_cols), float(bucket_width),
                incl_lr, incl_rl,
            ),
            [self._require_root(), _as_node(other)],
        )

    def range_join(
        self,
        other: "LogicalPlanBuilder | Plan | PlanNode",
        point: str,
        lo: str,
        hi: str,
        right_cols: Sequence[str],
        bucket_width: float,
        left_keys: Sequence[str] = (),
        right_keys: Sequence[str] = (),
    ) -> "LogicalPlanBuilder":
        """Point-in-interval join (see LogicalRangeJoin docstring)."""
        from ..operators.extensions import LogicalRangeJoin

        return self._push(
            LogicalRangeJoin(
                tuple(left_keys), tuple(right_keys), point, lo, hi,
                tuple(right_cols), bucket_width,
            ),
            [self._require_root(), _as_node(other)],
        )

    def unnest(
        self, array_col: str, pos_col: str = "pos", val_col: str = "val"
    ) -> "LogicalPlanBuilder":
        """Explode an array column (see LogicalUnnest docstring)."""
        from ..operators.extensions import LogicalUnnest

        return self._push(
            LogicalUnnest(array_col, pos_col, val_col), [self._require_root()]
        )

    def build(self) -> Plan:
        return Plan(self._require_root())

    def _require_root(self) -> PlanNode:
        if self._root is None:
            raise ValueError("builder is empty — call .scan() first")
        return self._root


def _as_node(x) -> PlanNode:
    if isinstance(x, LogicalPlanBuilder):
        return x._require_root()
    if isinstance(x, Plan):
        return x.root
    if isinstance(x, PlanNode):
        return x
    raise TypeError(f"expected builder/Plan/PlanNode, got {type(x)}")
