"""LLM-data-pipeline plan operators: dedup, similarity search.

These are FIRST-CLASS plan nodes — logical operator + implementation
rule + physical operator — in the same framework as scan/join/agg
(SURVEY §7 Phase 3: "additional logical operators + rules in the same
framework — not ad-hoc DataFrame calls").  Execution delegates to the
DataFrame pipelines in ``functions/dedup.py`` / ``functions/similarity.py``.

The reference has none of these (SURVEY §2.4); they are the
BASELINE.json north-star extensions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

from .logical import LogicalOperator
from .physical import PhysicalOperator, _DEFAULT
from .properties import DistributionSpec, Field, LogicalProperty, PhysicalPropertySet, Schema

__all__ = [
    "LogicalCTERef",
    "PhysicalCTERef",
    "LogicalRecursiveCTE",
    "PhysicalRecursiveCTE",
    "LogicalExactDedup",
    "PhysicalExactDedup",
    "LogicalMinHashDedup",
    "PhysicalMinHashDedup",
    "LogicalSimHash",
    "PhysicalSimHash",
    "LogicalKnn",
    "PhysicalKnnBrute",
    "PhysicalKnnIvf",
    "PhysicalKnnIndexProbe",
    "LogicalEmbedQuantize",
    "PhysicalEmbedQuantizeSql",
    "PhysicalEmbedQuantizePandas",
    "LogicalCosineNearDup",
    "PhysicalCosineNearDup",
    "PhysicalKnnPandas",
    "LogicalNgramJaccard",
    "PhysicalNgramJaccard",
    "LogicalAsofJoin",
    "PhysicalAsofJoinUnion",
    "LogicalRangeJoin",
    "PhysicalBucketedRangeJoin",
    "PhysicalBroadcastRangeJoin",
    "LogicalUnnest",
    "PhysicalGenerate",
    "LogicalDocChunk",
    "PhysicalDocChunk",
    "LogicalStratifiedSample",
    "PhysicalStratifiedSample",
    "LogicalSequencePack",
    "PhysicalSequencePack",
    "LogicalBpeTokens",
    "PhysicalBpeTokens",
    "PhysicalBpeModelProbe",
    "LogicalSink",
    "PhysicalSink",
]


# -- exact dedup ------------------------------------------------------------

@dataclass(frozen=True)
class LogicalExactDedup(LogicalOperator):
    """Keep one row per key (min ``id_col`` representative — deterministic,
    unlike ``dropDuplicates``).  Schema passthrough."""

    key_cols: Tuple[str, ...]
    id_col: str

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        return inp

    def pretty(self) -> str:
        return (
            f"LogicalExactDedup {{ keys: [{', '.join(self.key_cols)}], "
            f"id: {self.id_col} }}"
        )


@dataclass(frozen=True)
class PhysicalExactDedup(PhysicalOperator):
    key_cols: Tuple[str, ...]
    id_col: str

    def derive_properties(self, children_props):
        # the window shuffle leaves data hashed on the keys
        return (_DEFAULT,), PhysicalPropertySet(
            dist=DistributionSpec.hashed(self.key_cols)
        )

    def pretty(self) -> str:
        return (
            f"PhysicalExactDedup {{ keys: [{', '.join(self.key_cols)}], "
            f"id: {self.id_col} }}"
        )


# -- minhash LSH near-dup ---------------------------------------------------

_PAIR_SCHEMA = Schema(
    (Field("d1", "bigint", False), Field("d2", "bigint", False),
     Field("jaccard_1000", "bigint", True))
)


@dataclass(frozen=True)
class LogicalMinHashDedup(LogicalOperator):
    """Near-duplicate pairs by word-``k``-shingle MinHash + LSH banding,
    exact-Jaccard-verified at ``threshold_1000``/1000."""

    id_col: str
    text_col: str
    shingle_k: int = 3
    num_hashes: int = 12
    bands: int = 3
    threshold_1000: int = 300

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return LogicalProperty(_PAIR_SCHEMA)

    def pretty(self) -> str:
        return (
            f"LogicalMinHashDedup {{ id: {self.id_col}, text: {self.text_col}, "
            f"k: {self.shingle_k}, hashes: {self.num_hashes}, bands: {self.bands}, "
            f"threshold: {self.threshold_1000} }}"
        )


@dataclass(frozen=True)
class PhysicalMinHashDedup(PhysicalOperator):
    id_col: str
    text_col: str
    shingle_k: int = 3
    num_hashes: int = 12
    bands: int = 3
    threshold_1000: int = 300

    def pretty(self) -> str:
        return (
            f"PhysicalMinHashDedup {{ id: {self.id_col}, text: {self.text_col}, "
            f"k: {self.shingle_k}, hashes: {self.num_hashes}, bands: {self.bands}, "
            f"threshold: {self.threshold_1000} }}"
        )


# -- simhash fingerprint ----------------------------------------------------

@dataclass(frozen=True)
class LogicalSimHash(LogicalOperator):
    id_col: str
    text_col: str
    bits: int = 32

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        idf = inp.schema.field(self.id_col)
        return LogicalProperty(
            Schema((idf, Field("simhash", "bigint", True)))
        )

    def pretty(self) -> str:
        return (
            f"LogicalSimHash {{ id: {self.id_col}, text: {self.text_col}, "
            f"bits: {self.bits} }}"
        )


@dataclass(frozen=True)
class PhysicalSimHash(PhysicalOperator):
    id_col: str
    text_col: str
    bits: int = 32

    def derive_properties(self, children_props):
        return (_DEFAULT,), PhysicalPropertySet(
            dist=DistributionSpec.hashed((self.id_col,))
        )

    def pretty(self) -> str:
        return (
            f"PhysicalSimHash {{ id: {self.id_col}, text: {self.text_col}, "
            f"bits: {self.bits} }}"
        )


# -- n-gram Jaccard near-dup (exact score, inverted-index candidates) -------

@dataclass(frozen=True)
class LogicalNgramJaccard(LogicalOperator):
    """Near-duplicate pairs by exact character-``n``-gram Jaccard ≥
    threshold; candidates from rare grams (doc-freq ≤ ``max_df``)."""

    id_col: str
    text_col: str
    n: int = 12
    max_df: int = 3
    threshold_1000: int = 500

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return LogicalProperty(_PAIR_SCHEMA)

    def pretty(self) -> str:
        return (
            f"LogicalNgramJaccard {{ id: {self.id_col}, text: {self.text_col}, "
            f"n: {self.n}, max_df: {self.max_df}, "
            f"threshold: {self.threshold_1000} }}"
        )


@dataclass(frozen=True)
class PhysicalNgramJaccard(PhysicalOperator):
    id_col: str
    text_col: str
    n: int = 12
    max_df: int = 3
    threshold_1000: int = 500

    def pretty(self) -> str:
        return (
            f"PhysicalNgramJaccard {{ id: {self.id_col}, text: {self.text_col}, "
            f"n: {self.n}, max_df: {self.max_df}, "
            f"threshold: {self.threshold_1000} }}"
        )


@dataclass(frozen=True)
class LogicalSetSimJoin(LogicalOperator):
    """Cross-side set-similarity join: pairs from different ``side_col``
    groups with word-``gram``-shingle Jaccard ≥ threshold, candidates via
    AllPairs/PPJoin prefix filtering (exact-complete, unlike the rare-gram
    df cap of :class:`LogicalNgramJaccard`).  See
    ``functions/dedup.py::set_sim_join_pairs`` for the 100 TB shape."""

    id_col: str
    text_col: str
    side_col: str
    gram: int = 2
    threshold_1000: int = 800

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return LogicalProperty(_PAIR_SCHEMA)

    def pretty(self) -> str:
        return (
            f"LogicalSetSimJoin {{ id: {self.id_col}, text: {self.text_col}, "
            f"side: {self.side_col}, gram: {self.gram}, "
            f"threshold: {self.threshold_1000} }}"
        )


@dataclass(frozen=True)
class PhysicalSetSimJoin(PhysicalOperator):
    id_col: str
    text_col: str
    side_col: str
    gram: int = 2
    threshold_1000: int = 800

    def pretty(self) -> str:
        return (
            f"PhysicalSetSimJoin {{ id: {self.id_col}, text: {self.text_col}, "
            f"side: {self.side_col}, gram: {self.gram}, "
            f"threshold: {self.threshold_1000} }}"
        )


# -- knn / similarity search ------------------------------------------------

_KNN_SCHEMA = Schema(
    (Field("query_id", "bigint", False), Field("neighbor_id", "bigint", False),
     Field("rank", "int", False))
)


@dataclass(frozen=True)
class LogicalKnn(LogicalOperator):
    """Top-k cosine neighbors for each query vector (queries = rows with
    ``id < n_queries``).  ``method`` picks the physical strategy; the
    cascades search may also choose: brute (SQL expressions) and pandas
    (Arrow-vectorized numpy) are exact, ivf is the bucketed
    approximation."""

    id_col: str
    vec_col: str
    n_queries: int = 5
    k: int = 10
    method: str = "brute"  # 'brute' | 'pandas' | 'ivf' | 'pq'
    ncells: int = 8
    nprobe: int = 3
    #: >0 → refine the hash-seeded IVF centroids with this many k-means
    #: steps over the data (still deterministically replayable — see
    #: functions/similarity._KMEANS_SCALE)
    kmeans_iters: int = 0
    #: product quantization (method='pq'): subspace count, codes per
    #: subspace, the ADC top-N exact re-rank window (0 = no re-rank),
    #: and an optional IVF coarse quantizer on top (pq_ncells > 0 →
    #: queries probe pq_nprobe cells; the ADC join becomes equi-on-cell)
    pq_m: int = 8
    pq_ksub: int = 16
    pq_refine: int = 0
    pq_ncells: int = 0
    pq_nprobe: int = 3
    #: pq_ncells > 0 + True → FAISS IVF-PQ proper: codes quantize the
    #: residual v − cent(cell) with residual-RMS-scaled codebooks and
    #: the ADC score carries the exact dot(q, cent) term
    #: (functions/similarity.knn_pq residual=True)
    pq_residual: bool = False
    #: path of a PERSISTED ANN index (functions/ann_index.py) this
    #: query MAY probe: when the index exists and its parameterization
    #: matches (m/ksub/ncells/residual), Knn2IndexProbeRule adds the
    #: build-once/probe-many alternative and the cost race prefers it
    #: (no per-query training).  Empty = inline chains only.
    index_dir: str = ""
    #: PQ codebook training iterations (functions/similarity.knn_pq
    #: train_iters) — part of the index parameterization contract:
    #: ann_meta_matches rejects an index trained differently
    train_iters: int = 0

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return LogicalProperty(_KNN_SCHEMA)

    def pretty(self) -> str:
        return (
            f"LogicalKnn {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"queries: {self.n_queries}, k: {self.k}, method: {self.method} }}"
        )


@dataclass(frozen=True)
class PhysicalKnnBrute(PhysicalOperator):
    id_col: str
    vec_col: str
    n_queries: int
    k: int

    def pretty(self) -> str:
        return (
            f"PhysicalKnnBrute {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"queries: {self.n_queries}, k: {self.k} }}"
        )


@dataclass(frozen=True)
class PhysicalKnnPandas(PhysicalOperator):
    """Arrow-vectorized exact top-k: broadcast query matrix + per-partition
    numpy matmul + local top-k (same semantics as brute)."""

    id_col: str
    vec_col: str
    n_queries: int
    k: int

    def pretty(self) -> str:
        return (
            f"PhysicalKnnPandas {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"queries: {self.n_queries}, k: {self.k} }}"
        )


@dataclass(frozen=True)
class PhysicalKnnIvf(PhysicalOperator):
    id_col: str
    vec_col: str
    n_queries: int
    k: int
    ncells: int
    nprobe: int
    kmeans_iters: int = 0

    def pretty(self) -> str:
        return (
            f"PhysicalKnnIvf {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"queries: {self.n_queries}, k: {self.k}, cells: {self.ncells}, "
            f"probe: {self.nprobe} }}"
        )


@dataclass(frozen=True)
class PhysicalKnnIndexProbe(PhysicalOperator):
    """Probe a PERSISTED IVF-PQ index (functions/ann_index.py): the
    query phase alone — LUTs, Arrow cell probe, ADC equi-join over the
    persisted CODES, exact re-rank fetching only candidate vectors from
    the input corpus.  Bit-equal to PhysicalKnnPq with the same
    parameters; the difference is WHERE the model comes from — the
    build already paid for training and encoding, so the cost model
    prices this strictly under the inline chain."""

    id_col: str
    vec_col: str
    n_queries: int
    k: int
    nprobe: int
    pq_refine: int
    index_dir: str

    def pretty(self) -> str:
        return (
            f"PhysicalKnnIndexProbe {{ id: {self.id_col}, "
            f"vec: {self.vec_col}, queries: {self.n_queries}, "
            f"k: {self.k}, probe: {self.nprobe}, "
            f"refine: {self.pq_refine}, index: {self.index_dir} }}"
        )


@dataclass(frozen=True)
class PhysicalKnnPq(PhysicalOperator):
    """Product-quantization ADC: corpus as m small codes/vector, query
    as an m×ksub lookup table; optional exact re-rank of the ADC
    top-``refine`` (functions/similarity.knn_pq)."""

    id_col: str
    vec_col: str
    n_queries: int
    k: int
    pq_m: int
    pq_ksub: int
    pq_refine: int
    pq_ncells: int = 0
    pq_nprobe: int = 3
    pq_residual: bool = False
    #: Lloyd iterations for the coarse centroids (r11 — same meaning as
    #: LogicalKnn.kmeans_iters; lets the operator chain express the
    #: trained-centroid IVF-PQ the persisted index stores)
    kmeans_iters: int = 0
    #: codebook training iterations (LogicalKnn.train_iters)
    train_iters: int = 0

    def pretty(self) -> str:
        ivf = (
            f", cells: {self.pq_ncells}, probe: {self.pq_nprobe}"
            + (", residual" if self.pq_residual else "")
            if self.pq_ncells
            else ""
        )
        return (
            f"PhysicalKnnPq {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"queries: {self.n_queries}, k: {self.k}, m: {self.pq_m}, "
            f"ksub: {self.pq_ksub}, refine: {self.pq_refine}{ivf} }}"
        )


# -- embedding normalize/truncate/quantize ----------------------------------

@dataclass(frozen=True)
class LogicalEmbedQuantize(LogicalOperator):
    """L2-normalize → prefix-truncate → int8-quantize an embedding
    column: → (id_col, norm_1e6 bigint, q{prefix_dim} string).  Two
    physical strategies, COST-RACED (VERDICT r6 item 6): HOF-lambda SQL
    (JVM, but interpreted per element — several folds per row) vs
    Arrow-batched numpy (one vectorized pass, pays the Python transfer
    once).  ``dim`` is the vector dimensionality the cost model scales
    per-row work by.  Bit-exact across strategies and vs DuckDB — see
    ``functions/embedding.py``."""

    id_col: str
    vec_col: str
    prefix_dim: int = 16
    dim: int = 64

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        try:
            idf = inp.schema.field(self.id_col)
        except KeyError:
            idf = Field(self.id_col, "bigint", False)
        return LogicalProperty(
            Schema(
                (
                    idf,
                    Field("norm_1e6", "bigint", False),
                    Field(f"q{self.prefix_dim}", "string", False),
                )
            )
        )

    def pretty(self) -> str:
        return (
            f"LogicalEmbedQuantize {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"prefix: {self.prefix_dim}, dim: {self.dim} }}"
        )


@dataclass(frozen=True)
class PhysicalEmbedQuantizeSql(PhysicalOperator):
    id_col: str
    vec_col: str
    prefix_dim: int
    dim: int

    def pretty(self) -> str:
        return (
            f"PhysicalEmbedQuantizeSql {{ id: {self.id_col}, "
            f"prefix: {self.prefix_dim} }}"
        )


@dataclass(frozen=True)
class PhysicalEmbedQuantizePandas(PhysicalOperator):
    """Arrow-batched numpy strategy (mapInPandas) — the
    ``PhysicalKnnPandas`` pattern applied to map-only embedding prep."""

    id_col: str
    vec_col: str
    prefix_dim: int
    dim: int

    def pretty(self) -> str:
        return (
            f"PhysicalEmbedQuantizePandas {{ id: {self.id_col}, "
            f"prefix: {self.prefix_dim} }}"
        )


# -- embedding cosine near-dup ----------------------------------------------

@dataclass(frozen=True)
class LogicalCosineNearDup(LogicalOperator):
    id_col: str
    vec_col: str
    nbits: int = 12
    threshold_1000: int = 900

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return LogicalProperty(
            Schema(
                (Field("id1", "bigint", False), Field("id2", "bigint", False),
                 Field("cos_1000", "bigint", True))
            )
        )

    def pretty(self) -> str:
        return (
            f"LogicalCosineNearDup {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"bits: {self.nbits}, threshold: {self.threshold_1000} }}"
        )


@dataclass(frozen=True)
class PhysicalCosineNearDup(PhysicalOperator):
    id_col: str
    vec_col: str
    nbits: int = 12
    threshold_1000: int = 900

    def pretty(self) -> str:
        return (
            f"PhysicalCosineNearDup {{ id: {self.id_col}, vec: {self.vec_col}, "
            f"bits: {self.nbits}, threshold: {self.threshold_1000} }}"
        )


# -- as-of join (time-series point-in-time lookup) --------------------------

@dataclass(frozen=True)
class LogicalAsofJoin(LogicalOperator):
    """As-of join: for each left row, attach the ``right_cols`` of the
    right row with equal keys and the nearest ``right_ts`` in the given
    ``direction`` (NULLs when no such row) —

    * ``backward`` (default): greatest ``right_ts`` <= ``left_ts``
      (``<`` when ``strict``),
    * ``forward``: smallest ``right_ts`` >= ``left_ts`` (``>`` when
      ``strict``),
    * ``nearest``: whichever of the two is closer by
      ``|left_ts - right_ts|``; ties take the backward match (pandas
      ``merge_asof``'s rule).

    Absent from the reference (its join surface is inner equi only,
    ``dolomite/src/operator/join.rs``); this is a BASELINE.json
    north-star time-series extension.  Right side must be unique per
    (keys, ts) for deterministic output — pre-aggregate if not.
    ``right_cols`` names must not collide with left columns.
    """

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    left_ts: str
    right_ts: str
    right_cols: Tuple[str, ...]
    #: max allowed |left_ts - right_ts| (same units as the ts columns);
    #: matches farther than this yield NULLs.  None = unbounded.
    tolerance: "int | None" = None
    #: "backward" | "forward" | "nearest" (r10)
    direction: str = "backward"
    #: exclude exact-equal timestamps from matching (r10)
    strict: bool = False

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        left, right = input_props
        carried = tuple(
            Field(f.name, f.dtype, True)
            for f in (right.schema.field(c) for c in self.right_cols)
        )
        return LogicalProperty(Schema(left.schema.fields + carried))

    def pretty(self) -> str:
        tol = "" if self.tolerance is None else f", tol: {self.tolerance}"
        cmp = {
            ("backward", False): ">=", ("backward", True): ">",
            ("forward", False): "<=", ("forward", True): "<",
        }.get((self.direction, self.strict), "~")
        return (
            f"LogicalAsofJoin {{ keys: [{', '.join(self.left_keys)}]=="
            f"[{', '.join(self.right_keys)}], "
            f"ts: {self.left_ts}{cmp}{self.right_ts}, "
            f"carry: [{', '.join(self.right_cols)}]{tol} }}"
        )


@dataclass(frozen=True)
class PhysicalAsofJoinUnion(PhysicalOperator):
    """Union-merge implementation: tag both sides, union by name, one
    window ``last(value, ignorenulls) over (partition by keys order by
    ts, side)``, keep left rows.  ONE shuffle total (the window
    partitioning) — scale-correct vs. the naive
    join-on-inequality + argmax which shuffles twice and degenerates to
    a per-key cross product on hot keys."""

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    left_ts: str
    right_ts: str
    right_cols: Tuple[str, ...]
    tolerance: "int | None" = None
    direction: str = "backward"
    strict: bool = False

    def derive_properties(self, children_props):
        return (
            (_DEFAULT, _DEFAULT),
            PhysicalPropertySet(dist=DistributionSpec.hashed(self.left_keys)),
        )

    def pretty(self) -> str:
        return (
            f"PhysicalAsofJoinUnion {{ keys: [{', '.join(self.left_keys)}]=="
            f"[{', '.join(self.right_keys)}], "
            f"ts: {self.left_ts}~{self.right_ts} ({self.direction}"
            f"{', strict' if self.strict else ''}), "
            f"carry: [{', '.join(self.right_cols)}] }}"
        )


# -- range (interval) join via bucketing ------------------------------------

@dataclass(frozen=True)
class LogicalRangeJoin(LogicalOperator):
    """Point-in-interval join: left rows whose ``point`` falls in a right
    row's ``[lo, hi)``, with optional equi keys.  Output = left schema +
    ``right_cols`` (inner-join semantics).

    Also absent from the reference; north-star time-series extension.
    """

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    point: str
    lo: str
    hi: str
    right_cols: Tuple[str, ...]
    bucket_width: float
    #: True → the residual match is ``lo <= point <= hi`` (SQL BETWEEN,
    #: the shape RangeJoinFromConditionRule lowers); default keeps the
    #: original half-open ``[lo, hi)`` contract
    inclusive_hi: bool = False

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        left, right = input_props
        carried = tuple(
            Field(f.name, f.dtype, True)
            for f in (right.schema.field(c) for c in self.right_cols)
        )
        return LogicalProperty(Schema(left.schema.fields + carried))

    def pretty(self) -> str:
        hi_b = "]" if self.inclusive_hi else ")"
        return (
            f"LogicalRangeJoin {{ keys: [{', '.join(self.left_keys)}]=="
            f"[{', '.join(self.right_keys)}], {self.point} in "
            f"[{self.lo}, {self.hi}{hi_b}, w: {self.bucket_width} }}"
        )


@dataclass(frozen=True)
class PhysicalBucketedRangeJoin(PhysicalOperator):
    """Bucketed implementation: explode each interval into the fixed-width
    buckets it covers, equi-join on (keys, bucket) — a point lives in
    exactly ONE bucket, so each matching pair joins exactly once (no
    dedup pass) — then apply the residual ``lo <= point < hi`` filter.
    Turns an otherwise O(n·m) theta-join into a shuffled hash join whose
    cost scales with rows × (interval_span / bucket_width)."""

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    point: str
    lo: str
    hi: str
    right_cols: Tuple[str, ...]
    bucket_width: float
    inclusive_hi: bool = False

    def derive_properties(self, children_props):
        return (
            (_DEFAULT, _DEFAULT),
            PhysicalPropertySet(
                dist=DistributionSpec.hashed(self.left_keys + ("__bucket",))
            ),
        )

    def pretty(self) -> str:
        hi_b = "]" if self.inclusive_hi else ")"
        return (
            f"PhysicalBucketedRangeJoin {{ keys: [{', '.join(self.left_keys)}]=="
            f"[{', '.join(self.right_keys)}], {self.point} in "
            f"[{self.lo}, {self.hi}{hi_b}, w: {self.bucket_width} }}"
        )


@dataclass(frozen=True)
class PhysicalBroadcastRangeJoin(PhysicalOperator):
    """Broadcast the (small) interval side and evaluate the range
    predicate in place — no bucket explode, no shuffle of the point
    side.  Only viable when the interval side fits in a broadcast; the
    cost model charges a quadratic probe term so the bucketed strategy
    takes over as the interval side grows."""

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    point: str
    lo: str
    hi: str
    right_cols: Tuple[str, ...]
    bucket_width: float
    inclusive_hi: bool = False

    def pretty(self) -> str:
        hi_b = "]" if self.inclusive_hi else ")"
        return (
            f"PhysicalBroadcastRangeJoin {{ keys: [{', '.join(self.left_keys)}]=="
            f"[{', '.join(self.right_keys)}], {self.point} in "
            f"[{self.lo}, {self.hi}{hi_b} }}"
        )


# -- interval OVERLAP join (interval x interval) -----------------------------

@dataclass(frozen=True)
class LogicalIntervalOverlapJoin(LogicalOperator):
    """Interval OVERLAP join (r10): left rows ``[l_lo, l_hi]`` joined
    to right rows ``[r_lo, r_hi]`` that OVERLAP — ``l_lo <=(<) r_hi AND
    r_lo <=(<) l_hi`` — with optional equi keys.  The time-range join
    (sessions × incidents, validity windows × validity windows,
    genomic ranges) the point-in-interval ``LogicalRangeJoin`` cannot
    express.  Output = left schema + ``right_cols`` (inner semantics).
    Written as a plain theta-join, Spark would nested-loop it; the
    bucketed implementation makes it an equi-join whose cost scales
    with rows × (interval span / bucket width).  Bounds are assumed
    non-negative (the ``_bucket`` contract, same as LogicalRangeJoin).

    Absent from the reference (inner equi joins only,
    ``dolomite/src/operator/join.rs``); north-star extension."""

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    l_lo: str
    l_hi: str
    r_lo: str
    r_hi: str
    right_cols: Tuple[str, ...]
    bucket_width: float
    #: ``l_lo <= r_hi`` vs strict ``<``
    incl_lr: bool = True
    #: ``r_lo <= l_hi`` vs strict ``<``
    incl_rl: bool = True
    #: may this side hold intervals wider than the explode cap?  False
    #: (stats-proven short, r11) drops that side's coarse legs — the
    #: four-leg skew insurance costs ~30% when no long interval exists,
    #: and the split is pure performance (a mis-set True only wastes
    #: empty legs; a long interval in a fine leg still joins exactly)
    long_left: bool = True
    long_right: bool = True

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        left, right = input_props
        carried = tuple(
            Field(f.name, f.dtype, True)
            for f in (right.schema.field(c) for c in self.right_cols)
        )
        return LogicalProperty(Schema(left.schema.fields + carried))

    def pretty(self) -> str:
        o1 = "<=" if self.incl_lr else "<"
        o2 = "<=" if self.incl_rl else "<"
        return (
            f"LogicalIntervalOverlapJoin {{ keys: "
            f"[{', '.join(self.left_keys)}]==[{', '.join(self.right_keys)}], "
            f"[{self.l_lo},{self.l_hi}] x [{self.r_lo},{self.r_hi}] "
            f"({self.l_lo}{o1}{self.r_hi} & {self.r_lo}{o2}{self.l_hi}), "
            f"w: {self.bucket_width} }}"
        )


@dataclass(frozen=True)
class PhysicalOverlapJoin(PhysicalOperator):
    """Bucketed overlap join, dedup-free and skew-safe: both sides
    explode their intervals into fixed-width buckets and equi-join on
    (keys, bucket) with the MEET-AT rule — the pair is kept only in
    the bucket of ``greatest(l_lo, r_lo)``, a point every overlapping
    pair contains exactly once, so no post-join distinct is needed —
    then the exact residual filter.  Intervals wider than the explode
    cap take a coarse-stride leg (same two-level scheme as the range
    join): F×F on the fine stride; F×L, L×F and L×L on the coarse
    stride (a fine interval spans ≤2 coarse buckets).  Four equi-join
    legs, unioned; no nested loop anywhere."""

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    l_lo: str
    l_hi: str
    r_lo: str
    r_hi: str
    right_cols: Tuple[str, ...]
    bucket_width: float
    incl_lr: bool = True
    incl_rl: bool = True
    long_left: bool = True
    long_right: bool = True

    def pretty(self) -> str:
        return (
            f"PhysicalOverlapJoin {{ keys: [{', '.join(self.left_keys)}]=="
            f"[{', '.join(self.right_keys)}], "
            f"[{self.l_lo},{self.l_hi}] x [{self.r_lo},{self.r_hi}], "
            f"w: {self.bucket_width} }}"
        )


@dataclass(frozen=True)
class PhysicalBroadcastOverlapJoin(PhysicalOperator):
    """Broadcast the (small) right interval side and evaluate the
    overlap predicate in place — no explode, no shuffle of the left
    side.  Only viable when the right side fits in a broadcast; the
    cost model charges a per-left-row probe term that grows with the
    broadcast interval count, so the bucketed strategy takes over as
    the right side grows (same race as the range join's pair)."""

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    l_lo: str
    l_hi: str
    r_lo: str
    r_hi: str
    right_cols: Tuple[str, ...]
    bucket_width: float
    incl_lr: bool = True
    incl_rl: bool = True

    def pretty(self) -> str:
        return (
            f"PhysicalBroadcastOverlapJoin {{ keys: "
            f"[{', '.join(self.left_keys)}]==[{', '.join(self.right_keys)}], "
            f"[{self.l_lo},{self.l_hi}] x [{self.r_lo},{self.r_hi}] }}"
        )


# -- unnest / lateral explode ------------------------------------------------

@dataclass(frozen=True)
class LogicalUnnest(LogicalOperator):
    """Explode an array column into one row per element, keeping every
    other column; emits element position (0-based) + value.  Absent from
    the reference (no nested types there, SURVEY §1.2); north-star
    extension for array/embedding processing."""

    array_col: str
    pos_col: str
    val_col: str

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        arr = inp.schema.field(self.array_col)
        elem = arr.dtype.strip()
        if elem.startswith("array<") and elem.endswith(">"):
            elem = elem[6:-1]
        else:
            raise ValueError(f"{self.array_col} is not an array: {arr.dtype}")
        keep = tuple(f for f in inp.schema.fields if f.name != self.array_col)
        return LogicalProperty(
            Schema(
                keep
                + (Field(self.pos_col, "int", False), Field(self.val_col, elem, True))
            )
        )

    def pretty(self) -> str:
        return (
            f"LogicalUnnest {{ array: {self.array_col}, pos: {self.pos_col}, "
            f"val: {self.val_col} }}"
        )


@dataclass(frozen=True)
class PhysicalGenerate(PhysicalOperator):
    """posexplode via Spark's Generate node — stays in whole-stage
    codegen, no shuffle, output partitioning follows the child."""

    array_col: str
    pos_col: str
    val_col: str

    def pretty(self) -> str:
        return (
            f"PhysicalGenerate {{ array: {self.array_col}, pos: {self.pos_col}, "
            f"val: {self.val_col} }}"
        )


# -- document chunking (training-data prep) ---------------------------------

@dataclass(frozen=True)
class LogicalUnpivot(LogicalOperator):
    """Melt: keep ``id_cols``, turn each of ``value_cols`` into a row of
    (name, value) — SQL ``UNPIVOT (v FOR n IN (c1, ...))``.  Executes as
    Spark's native ``DataFrame.unpivot`` (one Generate, map-only, no
    shuffle).  Absent from the reference (SURVEY §1.2); standard
    relational surface for wide→long reshaping."""

    id_cols: tuple
    value_cols: tuple
    name_col: str
    value_col: str
    #: standard SQL / DuckDB UNPIVOT drops rows whose value cell is
    #: NULL; Spark's raw ``DataFrame.unpivot`` keeps them — the
    #: executor filters unless this opts back in (r11, ADVICE r10)
    include_nulls: bool = False

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        dtypes = {f.name: f.dtype for f in inp.schema.fields}
        missing = [c for c in (*self.id_cols, *self.value_cols) if c not in dtypes]
        if missing:
            raise ValueError(f"UNPIVOT references unknown columns: {missing}")
        vtypes = {dtypes[c] for c in self.value_cols}
        if len(vtypes) > 1:
            raise ValueError(
                f"UNPIVOT value columns must share one type, got {sorted(vtypes)}"
            )
        keep = tuple(
            Field(c, dtypes[c], True) for c in self.id_cols
        )
        return LogicalProperty(
            Schema(
                keep
                + (
                    Field(self.name_col, "string", False),
                    Field(self.value_col, next(iter(vtypes)), True),
                )
            )
        )

    def pretty(self) -> str:
        return (
            f"LogicalUnpivot {{ ids: {list(self.id_cols)}, "
            f"values: {list(self.value_cols)}, name: {self.name_col}, "
            f"value: {self.value_col} }}"
        )


@dataclass(frozen=True)
class PhysicalUnpivot(PhysicalOperator):
    id_cols: tuple
    value_cols: tuple
    name_col: str
    value_col: str
    include_nulls: bool = False

    def pretty(self) -> str:
        return (
            f"PhysicalUnpivot {{ ids: {list(self.id_cols)}, "
            f"values: {list(self.value_cols)}, name: {self.name_col}, "
            f"value: {self.value_col} }}"
        )


@dataclass(frozen=True)
class LogicalDocChunk(LogicalOperator):
    """Sliding-window token chunking: split ``text_col`` on whitespace and
    emit overlapping windows of ``chunk_size`` tokens advancing by
    ``chunk_size - overlap``.  One output row per chunk:
    (id, n_tokens, chunk_idx, chunk_text).  The standard corpus-prep step
    before embedding/training; absent in the reference (SURVEY §2.4 —
    scalar/array functions absent)."""

    id_col: str
    text_col: str
    chunk_size: int = 64
    overlap: int = 16

    def __post_init__(self):
        if self.overlap >= self.chunk_size:
            raise ValueError("overlap must be smaller than chunk_size")

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        id_field = next(
            (f for f in inp.schema.fields if f.name == self.id_col), None
        )
        if id_field is None:
            raise ValueError(f"unknown id column {self.id_col!r}")
        return LogicalProperty(
            Schema(
                (
                    Field(id_field.name, id_field.dtype, id_field.nullable),
                    Field("n_tokens", "int", True),
                    Field("chunk_idx", "int", False),
                    Field("chunk_text", "string", True),
                )
            )
        )

    def pretty(self) -> str:
        return (
            f"LogicalDocChunk {{ id: {self.id_col}, text: {self.text_col}, "
            f"size: {self.chunk_size}, overlap: {self.overlap} }}"
        )


@dataclass(frozen=True)
class PhysicalDocChunk(PhysicalOperator):
    """split + sequence + transform + posexplode — all JVM expression
    codegen, map-only (no shuffle); child partitioning survives because
    every chunk of a doc stays in the doc's partition."""

    id_col: str
    text_col: str
    chunk_size: int = 64
    overlap: int = 16

    def derive_properties(self, children_props):
        return (_DEFAULT,), (children_props[0] if children_props else _DEFAULT)

    def pretty(self) -> str:
        return (
            f"PhysicalDocChunk {{ id: {self.id_col}, text: {self.text_col}, "
            f"size: {self.chunk_size}, overlap: {self.overlap} }}"
        )


# -- table sink (CTAS) -------------------------------------------------------

@dataclass(frozen=True)
class LogicalSink(LogicalOperator):
    """Persist the child's result as a named table (CREATE TABLE AS).
    The reference has no sinks at all (SURVEY §2.4); modeling the write
    as a plan operator keeps it inside the optimizer pipeline — pushdown
    and pruning still apply to the SELECT below it.  Schema passthrough:
    a sink re-reads as what it wrote."""

    table_name: str
    format: str = "parquet"
    #: CREATE MATERIALIZED VIEW: after writing + registering, derive MV
    #: metadata from the child aggregate so the rewrite rule can answer
    #: later queries from this table (execute.py::_sink)
    mv: bool = False

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        return inp

    def pretty(self) -> str:
        kind = "materialized view" if self.mv else "table"
        return f"LogicalSink {{ {kind}: {self.table_name}, format: {self.format} }}"


@dataclass(frozen=True)
class PhysicalSink(PhysicalOperator):
    """Executes as write_parquet/orc/... to the catalog's warehouse
    location, registers the table, and returns a scan of the written
    files — so downstream operators (and the caller) read the PERSISTED
    bytes, not the live pipeline."""

    table_name: str
    format: str = "parquet"
    mv: bool = False

    def derive_properties(self, children_props):
        return (_DEFAULT,), _DEFAULT

    def pretty(self) -> str:
        return f"PhysicalSink {{ table: {self.table_name}, format: {self.format} }}"


# -- BPE tokenization (r12: plan front door + persisted tokenizer) ----------

@dataclass(frozen=True)
class LogicalBpeTokens(LogicalOperator):
    """Per-document BPE token counts (functions/bpe.py): a
    ``num_merges`` merge table over the corpus's word vocab, applied as
    a pure ``replace``-chain JVM expression.  ``tokenizer_dir`` names a
    PERSISTED tokenizer artifact (``bpe_tokenizer_build``) this query
    MAY probe: when it exists and its (num_merges, max_vocab)
    parameterization matches, ``Bpe2ModelProbeRule`` adds the
    build-once/probe-many alternative — training already paid — and
    the cost race prefers it.  Empty = inline train-then-count.
    Output: (id_col, n_words bigint, n_tokens bigint)."""

    id_col: str
    text_col: str
    num_merges: int = 16
    max_vocab: int = 65536
    tokenizer_dir: str = ""

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        idf = next(
            (f for f in inp.schema.fields if f.name == self.id_col), None
        )
        if idf is None:
            raise ValueError(f"unknown column {self.id_col!r}")
        return LogicalProperty(
            Schema(
                (
                    Field(idf.name, idf.dtype, idf.nullable),
                    Field("n_words", "bigint", False),
                    Field("n_tokens", "bigint", True),
                )
            )
        )

    def pretty(self) -> str:
        return (
            f"LogicalBpeTokens {{ id: {self.id_col}, text: {self.text_col}, "
            f"merges: {self.num_merges} }}"
        )


@dataclass(frozen=True)
class PhysicalBpeTokens(PhysicalOperator):
    """Inline chain: train the merge table (one corpus word-count
    shuffle + a driver loop over the max_vocab-bounded dict), then the
    replace-chain count — the price the persisted tokenizer exists to
    amortize."""

    id_col: str
    text_col: str
    num_merges: int = 16
    max_vocab: int = 65536

    def derive_properties(self, children_props):
        return (_DEFAULT,), PhysicalPropertySet(
            dist=DistributionSpec.hashed((self.id_col,))
        )

    def pretty(self) -> str:
        return (
            f"PhysicalBpeTokens {{ id: {self.id_col}, "
            f"text: {self.text_col}, merges: {self.num_merges} }}"
        )


@dataclass(frozen=True)
class PhysicalBpeModelProbe(PhysicalOperator):
    """Apply the PERSISTED merge table (functions/bpe.py artifact):
    the replace-chain count alone — zero training jobs.  Bit-equal to
    ``PhysicalBpeTokens`` with the same parameters (training is
    deterministic; the artifact is its output verbatim)."""

    id_col: str
    text_col: str
    num_merges: int = 16
    max_vocab: int = 65536
    tokenizer_dir: str = ""

    def derive_properties(self, children_props):
        return (_DEFAULT,), PhysicalPropertySet(
            dist=DistributionSpec.hashed((self.id_col,))
        )

    def pretty(self) -> str:
        return (
            f"PhysicalBpeModelProbe {{ id: {self.id_col}, "
            f"text: {self.text_col}, merges: {self.num_merges}, "
            f"tokenizer: {self.tokenizer_dir} }}"
        )


# -- sequence packing (LLM training sequences) ------------------------------

@dataclass(frozen=True)
class LogicalSequencePack(LogicalOperator):
    """Greedy contiguous-fill packing of rows into fixed token-budget
    training sequences (functions/packing.py).  Rows are sharded by an
    md5-derived hash of ``id_col`` and packed independently per
    (partition_cols, shard) — no global serialization point.  Output:
    (id, partition_cols..., n_tokens, shard, pack_id, pack_offset)."""

    id_col: str
    tokens_col: str
    budget: int = 2048
    n_shards: int = 8
    partition_cols: Tuple[str, ...] = ()

    def __post_init__(self):
        if self.budget <= 0 or self.n_shards <= 0:
            raise ValueError("budget and n_shards must be positive")

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        fields = []
        for want in (self.id_col, *self.partition_cols):
            f = next((f for f in inp.schema.fields if f.name == want), None)
            if f is None:
                raise ValueError(f"unknown column {want!r}")
            fields.append(Field(f.name, f.dtype, f.nullable))
        fields += [
            Field("n_tokens", "bigint", True),
            Field("shard", "int", False),
            Field("pack_id", "bigint", True),
            Field("pack_offset", "bigint", True),
        ]
        return LogicalProperty(Schema(tuple(fields)))

    def pretty(self) -> str:
        return (
            f"LogicalSequencePack {{ id: {self.id_col}, tokens: {self.tokens_col}, "
            f"budget: {self.budget}, shards: {self.n_shards} }}"
        )


@dataclass(frozen=True)
class PhysicalSequencePack(PhysicalOperator):
    """One window shuffle hashed on (partition_cols, shard); the running
    sum is shard-local so no partition exceeds ~corpus/n_shards rows.
    Output stays hashed on the pack grouping key, so a following
    per-pack aggregation (the sequence writer) reuses the exchange."""

    id_col: str
    tokens_col: str
    budget: int = 2048
    n_shards: int = 8
    partition_cols: Tuple[str, ...] = ()

    def derive_properties(self, children_props):
        return (_DEFAULT,), PhysicalPropertySet(
            dist=DistributionSpec.hashed((*self.partition_cols, "shard"))
        )

    def pretty(self) -> str:
        return (
            f"PhysicalSequencePack {{ id: {self.id_col}, tokens: {self.tokens_col}, "
            f"budget: {self.budget}, shards: {self.n_shards} }}"
        )


# -- stratified sampling (training-data mixing) -----------------------------

@dataclass(frozen=True)
class LogicalStratifiedSample(LogicalOperator):
    """Deterministic per-stratum sample: keep the ``k`` rows with the
    smallest md5-derived hash of ``id_col`` within each stratum (ties
    broken by id).  Unlike ``df.sampleBy``, re-running yields the SAME
    sample on any cluster layout — reproducibility is non-negotiable for
    training-data pipelines.  Schema passthrough."""

    stratum_cols: Tuple[str, ...]
    id_col: str
    k: int = 100

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        (inp,) = input_props
        return inp

    def pretty(self) -> str:
        return (
            f"LogicalStratifiedSample {{ strata: [{', '.join(self.stratum_cols)}], "
            f"id: {self.id_col}, k: {self.k} }}"
        )


@dataclass(frozen=True)
class PhysicalStratifiedSample(PhysicalOperator):
    """One window shuffle on the stratum columns (row_number over
    hash-ordered rows); output stays hashed on the strata so a following
    per-stratum aggregation reuses the partitioning.  Skewed strata are
    bounded: only k rows survive per stratum, and AQE splits oversized
    partitions during the window shuffle."""

    stratum_cols: Tuple[str, ...]
    id_col: str
    k: int = 100

    def derive_properties(self, children_props):
        return (_DEFAULT,), PhysicalPropertySet(
            dist=DistributionSpec.hashed(self.stratum_cols)
        )

    def pretty(self) -> str:
        return (
            f"PhysicalStratifiedSample {{ strata: [{', '.join(self.stratum_cols)}], "
            f"id: {self.id_col}, k: {self.k} }}"
        )


@dataclass(frozen=True)
class LogicalCTERef(LogicalOperator):
    """Leaf reference to the enclosing recursive CTE's working table
    (``WITH RECURSIVE name(...)``) — resolved at EXECUTION time to the
    current iteration's frontier DataFrame (``execute.py``).  Column
    types are unknown until runtime (the base member defines them);
    rules only consult names."""

    name: str
    col_names: Tuple[str, ...] = ()

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        return LogicalProperty(
            Schema(tuple(Field(n, "unknown", True) for n in self.col_names))
        )

    def pretty(self) -> str:
        return f"LogicalCTERef {{ name: {self.name} }}"


@dataclass(frozen=True)
class PhysicalCTERef(PhysicalOperator):
    """Physical CTE-ref leaf: resolved by the executor to the current
    iteration's frontier DataFrame."""

    name: str
    col_names: Tuple[str, ...] = ()

    def derive_properties(self, children_props):
        return (), PhysicalPropertySet()

    def pretty(self) -> str:
        return f"PhysicalCTERef {{ name: {self.name} }}"


@dataclass(frozen=True)
class LogicalRecursiveCTE(LogicalOperator):
    """``WITH RECURSIVE name(cols) AS (base UNION [ALL] step)``: inputs
    are (base, step); ``step`` contains a ``LogicalCTERef(name)`` leaf.

    Execution iterates semi-naively: UNION keeps only rows not yet seen
    (the Postgres/DuckDB working-table semantics — each iteration feeds
    the NEW distinct rows forward), UNION ALL feeds the whole previous
    iteration forward and stops when it comes back empty.  ``max_iter``
    bounds runaway recursion (like DuckDB's depth guard)."""

    name: str
    col_names: Tuple[str, ...] = ()
    distinct: bool = True
    max_iter: int = 100

    def derive_logical_prop(self, input_props) -> LogicalProperty:
        base, _step = input_props
        return LogicalProperty(
            Schema(
                tuple(
                    Field(n, f.dtype, True)
                    for n, f in zip(self.col_names, base.schema.fields)
                )
            )
        )

    def pretty(self) -> str:
        op = "UNION" if self.distinct else "UNION ALL"
        return f"LogicalRecursiveCTE {{ name: {self.name}, {op} }}"


@dataclass(frozen=True)
class PhysicalRecursiveCTE(PhysicalOperator):
    """Physical twin — the iterate-until-fixpoint driver loop."""

    name: str
    col_names: Tuple[str, ...] = ()
    distinct: bool = True
    max_iter: int = 100

    def derive_properties(self, children_props):
        return (_DEFAULT, _DEFAULT), PhysicalPropertySet()

    def pretty(self) -> str:
        op = "UNION" if self.distinct else "UNION ALL"
        return f"PhysicalRecursiveCTE {{ name: {self.name}, {op} }}"
