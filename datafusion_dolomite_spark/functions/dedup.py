"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Everything here is pure DataFrame lineage over built-in SQL functions —
shingling and signatures are map-side (higher-order functions, codegen),
and the only shuffles are (a) one groupBy(doc) to fold signatures and
(b) the band-bucket self-join that LSH exists to make feasible.  That is
the 100 TB shape: candidate generation never compares all pairs; it
shuffles each doc once per representation.

Determinism: hashes are the shared 60-bit md5 (same value in DuckDB —
see ``functions.text.h60``), so every stage has an exact SQL oracle.

Reference: no dedup exists in the reference (SURVEY §2.4); this is
north-star extension surface, built as first-class plan operators
(``operators/extensions.py``) executing through these functions.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signature",
    "minhash_banded_signatures",
    "minhash_candidates",
    "minhash_verified_pairs",
    "incremental_minhash_dedup",
    "migrate_signature_index",
    "read_index_meta",
    "simhash_fingerprint",
    "ngram_jaccard_pairs",
    "set_sim_join_pairs",
]


def _h60_sql(inner: str) -> str:
    """Spark-SQL string of the shared 60-bit hash of expression ``inner``."""
    return f"cast(conv(substring(md5({inner}), 1, 15), 16, 10) as bigint)"


def exact_dedup(df, key_cols, id_col: str):
    """Keep exactly one row per key: the one with the smallest id.

    ``min_by(struct(row), id)`` aggregation — deterministic representative
    (unlike ``dropDuplicates``, whose pick is partition-order dependent —
    useless for an oracle and irreproducible between runs).  As an
    AGGREGATE it gets map-side partial combine: each task pre-reduces its
    duplicates before the single hash-shuffle, and no per-partition sort
    is needed (a ``row_number`` window would shuffle every row AND sort)."""
    from pyspark.sql import functions as F

    cols = df.columns
    return (
        df.groupBy(*key_cols)
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_r"))
        .select("_r.*")
    )


def shingle_arrays(df, id_col: str, text_col: str, k: int = 3):
    """→ (_id, _sarr) DISTINCT word-k-gram array per doc; docs with < k
    words drop out.  Map-side only: split/transform/slice are codegen'd."""
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    # materialize the word array ONCE; inlining the split() into the
    # transform lambda would re-split per shingle position
    pre = ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.expr(f"split(lower(trim({text_col})), '\\\\s+')").alias("_w"),
    )
    sh = (
        f"array_distinct(transform(sequence(1, size(_w) - {k - 1}), "
        f"i -> concat_ws(' ', slice(_w, i, {k}))))"
    )
    return pre.filter(F.expr(f"size(_w) >= {k}")).select(
        "_id", F.expr(sh).alias("_sarr")
    )


def shingles(df, id_col: str, text_col: str, k: int = 3):
    """→ (id, shingle) DISTINCT word-k-gram pairs (exploded form of
    ``shingle_arrays``; explode is a generator, no shuffle)."""
    from pyspark.sql import functions as F

    return shingle_arrays(df, id_col, text_col, k).select(
        "_id", F.explode("_sarr").alias("_shingle")
    )


def minhash_params(num_hashes: int):
    """Affine minhash family h_i(x) = (a_i·(h60(x) mod 2³⁰) + b_i) mod P.

    One md5 per shingle, then ``num_hashes`` cheap integer mixes — an
    order of magnitude cheaper than per-seed md5, and overflow-safe
    under ANSI mode (a·h < 2⁶⁰ < int64 max).  Coefficients are
    hash-derived driver-side, so the SQL oracle embeds identical
    literals."""
    import hashlib

    def h60py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    P = 1_000_000_007
    return [
        (h60py(f"mh_a{i}") % 999_999_000 + 1, h60py(f"mh_b{i}") % P)
        for i in range(num_hashes)
    ], P


def minhash_signature(df, id_col: str, text_col: str, k: int = 3, num_hashes: int = 12):
    """→ (id, m0..m{n-1}) MinHash signature: one groupBy(doc) computing
    all n mins in a single pass (partial aggregation map-side)."""
    from pyspark.sql import functions as F

    sh = shingles(df, id_col, text_col, k).withColumn(
        "_h30", F.expr(f"{_h60_sql('_shingle')} % 1073741824")
    )
    coeffs, P = minhash_params(num_hashes)
    aggs = [
        F.min(F.expr(f"({a}L * _h30 + {b}L) % {P}L")).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return sh.groupBy("_id").agg(*aggs)


def minhash_banded_signatures(
    df, id_col: str, text_col: str, k: int = 3, num_hashes: int = 12,
    bands: int = 3,
):
    """→ (doc_id, band_idx, band_hash, m0..m{n-1}) — one row per (doc,
    band), each carrying the FULL signature: the persistable index row
    shape for cross-batch dedup (``incremental_minhash_dedup``).  Band
    hashes bucket candidates; the signature columns let a later batch
    estimate Jaccard against an indexed doc WITHOUT its text (the
    standard signature-index trade: the index stores n smallints per
    band row, never the corpus)."""
    from pyspark.sql import functions as F

    sig = minhash_signature(df, id_col, text_col, k, num_hashes)
    r = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = ", ".join(f"cast(m{b * r + j} as string)" for j in range(r))
        concat = "concat_ws(',', " + cols + ")"
        band_structs.append(
            f"struct({b} as band_idx, {_h60_sql(concat)} as band_hash)"
        )
    mcols = [f"m{i}" for i in range(num_hashes)]
    return sig.select(
        F.col("_id").alias("doc_id"),
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("_b"),
        *mcols,
    ).select("doc_id", "_b.band_idx", "_b.band_hash", *mcols)


def incremental_minhash_dedup(
    spark,
    batch_df,
    index_dir: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 3,
    agree_threshold_1000: int = 500,
    update_index: bool = True,
    batch_label: str = "",
):
    """CROSS-BATCH near-dup dedup against a PERSISTED signature index —
    the ingestion-pipeline shape: each arriving batch is deduplicated
    against everything already ingested WITHOUT recomputing or even
    reading the historical corpus, then the batch's novel docs extend
    the index.

    Mechanics: the batch's banded signatures probe the index on
    (band_idx, band_hash) — bucket-sized joins, the LSH guarantee — and
    each candidate (new, old) pair is scored by SIGNATURE AGREEMENT
    (#matching minhashes / n, the unbiased Jaccard estimator computable
    from the index alone); a batch doc with any historical match at
    ``agree_threshold_1000``/1000 is dropped.  Survivors' signatures
    append to the index tagged with ``batch_label``
    (``update_index=False`` re-runs the check read-only); the probe
    EXCLUDES index rows carrying the same label, so re-processing an
    already-ingested batch is IDEMPOTENT — it reproduces the original
    verdicts instead of matching the batch against its own entries.
    Intra-batch duplicates are the existing
    ``minhash_verified_pairs`` job — this function's contract is
    batch-vs-history.

    100 TB shape: the index carries bands x (1 + n) small ints per doc
    (never text); the probe shuffle moves batch x bands rows into
    tiny buckets; scoring is a map-side integer comparison of n
    columns.  Returns ``(result_df, n_indexed)`` where result_df is
    (id, n_matches bigint, kept boolean) for every batch doc and
    ``n_indexed`` counts index rows appended."""
    import os

    from pyspark.sql import functions as F

    new_sig = minhash_banded_signatures(
        batch_df, id_col, text_col, k, num_hashes, bands
    )
    mcols = [f"m{i}" for i in range(num_hashes)]
    have_index = os.path.exists(os.path.join(index_dir, "_SUCCESS"))
    if have_index:
        meta = read_index_meta(index_dir)
        if meta is not None and meta != (num_hashes, bands, k):
            raise ValueError(
                f"signature index at {index_dir} is parameterized "
                f"(num_hashes={meta[0]}, bands={meta[1]}, k={meta[2]}) "
                f"but this probe passed (num_hashes={num_hashes}, "
                f"bands={bands}, k={k}) — a mismatched probe would "
                "silently miss candidates.  Probe with the index's "
                "parameters, or re-band it with "
                "migrate_signature_index()."
            )
    ids = batch_df.select(F.col(id_col).alias("doc_id")).distinct()
    if have_index:
        # _live_index: tombstoned docs (signature_index_delete) stop
        # matching IMMEDIATELY, before any compaction
        idx = _live_index(spark, index_dir).filter(
            F.col("_batch") != F.lit(batch_label)
        )
        agree = sum(
            F.when(F.col(f"a.{m}") == F.col(f"b.{m}"), 1).otherwise(0)
            for m in mcols
        )
        matches = (
            new_sig.alias("a")
            .join(
                idx.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash")),
            )
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("b.doc_id").alias("old_id"),
                agree.alias("_agree"),
            )
            .distinct()  # one vote per (new, old) pair, not per band
            .filter(
                F.col("_agree") * 1000 >= F.lit(agree_threshold_1000 * num_hashes)
            )
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_matches"))
        )
    else:
        matches = ids.select(
            "doc_id", F.lit(None).cast("bigint").alias("n_matches")
        ).filter(F.lit(False))
    result = (
        ids.join(matches, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
            F.col("n_matches").isNull().alias("kept"),
        )
    )
    n_indexed = 0
    if update_index:
        # persist the two reused frames: without this the banded
        # signature + probe pipeline recomputes for the survivor count,
        # AGAIN for the index write, and AGAIN when the caller collects
        # the verdicts — 3x the batch's whole cost.  result is one tiny
        # row per batch doc (it stays cached for the caller's read);
        # new_sig is batch x bands rows and unpersists after the write.
        new_sig = new_sig.persist()
        result = result.persist()
        survivors = result.filter(F.col("kept")).select(
            F.col(id_col).alias("doc_id")
        )
        to_index = new_sig.join(survivors, "doc_id").withColumn(
            "_batch", F.lit(batch_label)
        )
        n_indexed = to_index.count()
        to_index.write.mode("append").parquet(index_dir)
        # ingest history: this label moves to the end (most recent) —
        # the retention clock compact_signature_index(retain_batches=N)
        # counts against (r10)
        hist = read_index_batches(index_dir) or []
        hist = [b for b in hist if b != batch_label] + [batch_label]
        _write_index_meta(index_dir, num_hashes, bands, k, batches=hist)
        new_sig.unpersist()
    return result, n_indexed


def _index_meta_path(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "_meta.json")


def _write_index_meta(index_dir: str, num_hashes: int, bands: int,
                      k: int, batches=None) -> None:
    """Record the index's signature parameterization as
    ``<index>/_meta.json`` (underscore-prefixed: invisible to parquet
    listings).  Written at creation and on migration; probes validate
    against it so a bands/num_hashes mismatch fails loudly instead of
    silently finding fewer candidates.  ``batches`` (r10) is the
    ordered ingest history of batch labels — the retention clock
    ``compact_signature_index(retain_batches=N)`` counts against;
    omitted, any previously recorded history is preserved."""
    import json
    import os

    if batches is None:
        prev = read_index_batches(index_dir)
        batches = prev if prev is not None else []
    path = _index_meta_path(index_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"num_hashes": num_hashes, "bands": bands, "k": k,
             "batches": list(batches)},
            f,
        )
    os.replace(tmp, path)


def read_index_meta(index_dir: str):
    """The index's recorded (num_hashes, bands, k), or None for an
    index created before metadata (callers skip validation then)."""
    import json
    import os

    try:
        with open(_index_meta_path(index_dir)) as f:
            m = json.load(f)
        return int(m["num_hashes"]), int(m["bands"]), int(m["k"])
    except (OSError, KeyError, ValueError, TypeError):
        return None


def read_index_batches(index_dir: str):
    """The ordered batch-label ingest history recorded in the index
    metadata (oldest first), or None for a pre-r10 index without one."""
    import json

    try:
        with open(_index_meta_path(index_dir)) as f:
            m = json.load(f)
        return [str(b) for b in m["batches"]]
    except (OSError, KeyError, ValueError, TypeError):
        return None


def migrate_signature_index(spark, index_dir: str, bands: int):
    """RE-BAND a persisted signature index to a new ``bands`` count
    WITHOUT the corpus (r9, VERDICT item 7): every index row carries
    the FULL minhash signature (m0..m{n-1}), so the new band hashes
    recompute from the stored columns with the same
    h60(concat_ws(',', …)) formula the signature pass uses — the index
    IS the kept doc→signature table.  ``bands`` must divide the stored
    ``num_hashes``; changing ``num_hashes`` itself is impossible from
    signatures (minhashes don't extend) and raises with that
    explanation — that migration is a rebuild from raw text.

    Historical verdicts are PRESERVED: agreement scoring reads the
    signatures (unchanged); only the candidate bucketing changes, and
    a pair that agreed before still meets in at least the band
    structure the new hashes define.  Tombstones key on (doc, batch),
    not bands — the sidecar carries over verbatim.  The swap uses the
    same two-rename discipline as ``compact_signature_index`` (a valid
    index exists at every instant).  Returns
    ``(band_rows_before, band_rows_after)``."""
    import os
    import re as _re
    import shutil

    from pyspark.sql import functions as F

    idx = spark.read.parquet(index_dir)
    mcols = sorted(
        (c for c in idx.columns if _re.fullmatch(r"m\d+", c)),
        key=lambda c: int(c[1:]),
    )
    num_hashes = len(mcols)
    if num_hashes == 0 or num_hashes % bands != 0:
        raise ValueError(
            f"cannot re-band index at {index_dir}: bands={bands} must "
            f"divide the stored num_hashes={num_hashes}.  Changing "
            "num_hashes requires re-computing signatures from the raw "
            "corpus (minhash signatures do not extend) — rebuild the "
            "index from text instead."
        )
    before = idx.count()
    base = idx.select("doc_id", "_batch", *mcols).distinct()
    r = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = ", ".join(f"cast(m{b * r + j} as string)" for j in range(r))
        concat = "concat_ws(',', " + cols + ")"
        band_structs.append(
            f"struct({b} as band_idx, {_h60_sql(concat)} as band_hash)"
        )
    rebanded = base.select(
        "doc_id",
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("_b"),
        *mcols,
        F.col("_batch"),
    ).select("doc_id", "_b.band_idx", "_b.band_hash", *mcols, "_batch")
    bdir = index_dir.rstrip("/")
    tmp = bdir + "__rebanding"
    trash = bdir + "__rebanded_old"
    rebanded.write.mode("overwrite").parquet(tmp)
    after = spark.read.parquet(tmp).count()
    # tombstones ride along: (doc, batch) keys are band-independent
    told = _tombstone_dir(index_dir)
    if os.path.exists(told):
        shutil.copytree(told, _tombstone_dir(tmp))
    meta = read_index_meta(index_dir)
    _write_index_meta(tmp, num_hashes, bands, meta[2] if meta else 3)
    shutil.rmtree(trash, ignore_errors=True)
    os.replace(index_dir, trash)
    os.replace(tmp, index_dir)
    shutil.rmtree(trash, ignore_errors=True)
    return before, after


def _tombstone_dir(index_dir: str) -> str:
    # underscore prefix: Spark/Hadoop and pyarrow file listings skip
    # `_`-prefixed children, so the tombstones live INSIDE the index
    # dir without polluting `spark.read.parquet(index_dir)`
    import os

    return os.path.join(index_dir, "_tombstones")


def _live_index(spark, index_dir: str):
    """The signature index minus tombstoned docs.  The anti-join's
    build side is the (small) tombstone set — broadcast at scale; the
    index itself streams through map-side."""
    import os

    from pyspark.sql import functions as F

    idx = spark.read.parquet(index_dir)
    tdir = _tombstone_dir(index_dir)
    if os.path.exists(os.path.join(tdir, "_SUCCESS")):
        tombs = spark.read.parquet(tdir).distinct()
        idx = idx.join(F.broadcast(tombs), ["doc_id", "_batch"], "left_anti")
    return idx


def signature_index_delete(spark, index_dir: str, ids_df, id_col: str = "doc_id") -> int:
    """Tombstone documents in the persisted signature index (VERDICT r7
    item 6 — the first operational need after a few hundred batches):
    records the docs' CURRENT (doc_id, _batch) index rows under
    ``<index>/_tombstones`` WITHOUT touching the index files — the
    Delta-style soft delete.  Keying tombstones on (doc, batch) rather
    than the bare doc id means a later RE-INGEST of the same doc is a
    fresh lineage, not permanently shadowed.  Probes
    (``incremental_minhash_dedup``) exclude tombstoned rows
    immediately; ``compact_signature_index`` physically drops them
    later.  Returns the number of docs tombstoned (docs with no index
    rows count zero)."""
    from pyspark.sql import functions as F

    ids = ids_df.select(F.col(id_col).alias("doc_id")).distinct()
    tombs = (
        spark.read.parquet(index_dir)
        .join(F.broadcast(ids), "doc_id")
        .select("doc_id", "_batch")
        .distinct()
    )
    n = tombs.select("doc_id").distinct().count()
    tombs.write.mode("append").parquet(_tombstone_dir(index_dir))
    return n


def compact_signature_index(spark, index_dir: str,
                            retain_batches: "int | None" = None):
    """Compact the signature index: physically drop tombstoned docs,
    keep ONE row per (doc, band) (re-parameterized or double-appended
    lineages collapse), rewrite, and clear the tombstones.  Returns
    ``(rows_before, rows_after)``.

    ``retain_batches=N`` (r10, VERDICT item 6 — ``VACUUM … RETAIN``
    for the dedup index) additionally drops every row whose
    ``_batch`` label is older than the N most recent ingests (the
    ordered history the metadata sidecar records per
    ``incremental_minhash_dedup`` append).  This is the lifecycle tie
    a rolling-window corpus needs: re-deduping daily against ALL
    history grows the index monotonically even though docs beyond the
    corpus retention window can no longer collide with anything that
    matters — with retention the index row count is bounded by the
    window's ingest volume.  Verdicts against batches INSIDE the
    window are unchanged (their rows are untouched); a probe simply
    stops matching evicted history, exactly like querying a vacuumed
    table.  Rows with a ``_batch`` the history doesn't know (pre-r10
    appends) are treated as OLDEST — evicted under any retention.

    100 TB shape: one pass over the index — a broadcast anti-join
    against the tombstone set plus a (doc_id, band_idx) dedup shuffle
    of 8-byte-keyed rows (retention adds a broadcast IN-filter on the
    label); the rewrite is the index's own size, which is bands×(1+n)
    ints per doc, orders of magnitude under the corpus.  The rewrite
    goes to a sibling temp dir and swaps in with two atomic renames
    (old → trash, tmp → index), so a VALID index directory exists at
    every instant — a crash or concurrent reader between the renames
    sees either the old or the new index, never a missing one (r9
    ADVICE fix: the previous rmtree-then-replace left a window with no
    index at all).  The trash dir is removed last; a crash before that
    leaves only garbage to re-collect, never a broken index."""
    import os
    import shutil

    from pyspark.sql import functions as F

    before = spark.read.parquet(index_dir).count()
    live = _live_index(spark, index_dir).dropDuplicates(
        ["doc_id", "band_idx"]
    )
    hist = read_index_batches(index_dir)
    kept_hist = hist
    if retain_batches is not None:
        if retain_batches < 1:
            raise ValueError("retain_batches must be >= 1")
        if hist is None:
            raise ValueError(
                f"signature index at {index_dir} has no recorded batch "
                "history (created before r10) — retention needs the "
                "ingest order; run one incremental append first or "
                "compact without retain_batches"
            )
        kept_hist = hist[-retain_batches:]
        live = live.filter(F.col("_batch").isin(kept_hist))
    base = index_dir.rstrip("/")
    tmp = base + "__compacting"
    trash = base + "__compacted_old"
    live.write.mode("overwrite").parquet(tmp)
    after = spark.read.parquet(tmp).count()
    meta = read_index_meta(index_dir)
    if meta is not None:  # parameterization + retained history survive
        _write_index_meta(tmp, *meta, batches=kept_hist or [])
    shutil.rmtree(trash, ignore_errors=True)  # stale from a prior crash
    os.replace(index_dir, trash)
    os.replace(tmp, index_dir)
    shutil.rmtree(trash, ignore_errors=True)
    return before, after


def minhash_candidates(
    df, id_col: str, text_col: str, k: int = 3, num_hashes: int = 12, bands: int = 3
):
    """LSH banding → candidate pairs (d1 < d2).

    Signature is split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs agreeing on ANY band hash become candidates.  The self-join keys
    on (band_index, band_hash): at scale each bucket is tiny, so the
    shuffle moves (doc × bands) rows, never doc × doc."""
    from pyspark.sql import functions as F

    r = num_hashes // bands
    sig = minhash_signature(df, id_col, text_col, k, num_hashes)
    band_structs = []
    for b in range(bands):
        cols = ", ".join(f"cast(m{b * r + j} as string)" for j in range(r))
        concat = "concat_ws(',', " + cols + ")"
        band_structs.append(
            f"struct({b} as band_idx, {_h60_sql(concat)} as band_hash)"
        )
    banded = sig.select(
        F.col("_id"),
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("_b"),
    ).select("_id", "_b.band_idx", "_b.band_hash")
    a = banded.alias("a")
    b_ = banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("d1"), F.col("b._id").alias("d2"))
        .distinct()
    )


def minhash_verified_pairs(
    df,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 3,
    threshold_1000: int = 300,
):
    """Candidates → exact shingle-set Jaccard (×1000, floored) ≥ threshold.

    Verification joins each candidate pair against whole shingle ARRAYS
    and computes |A∩B| with ``array_intersect`` — one hash pass per pair,
    no candidates × shingles row explosion, no extra groupBy shuffle.
    Integer arithmetic end-to-end → exact oracle parity."""
    from pyspark.sql import functions as F

    # cache is load-bearing — see the gram-array note in ngram_jaccard_pairs
    sarr = shingle_arrays(df, id_col, text_col, k).cache()
    cand = minhash_candidates(df, id_col, text_col, k, num_hashes, bands)
    sa = sarr.select(F.col("_id").alias("d1"), F.col("_sarr").alias("_sa"))
    sb = sarr.select(F.col("_id").alias("d2"), F.col("_sarr").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    union = F.size("_sa") + F.size("_sb") - inter
    return (
        cand.join(sa, "d1")
        .join(sb, "d2")
        .select(
            "d1",
            "d2",
            F.floor(1000.0 * inter / union).cast("bigint").alias("jaccard_1000"),
        )
        .filter(F.col("jaccard_1000") >= threshold_1000)
    )


def ngram_jaccard_pairs(
    df,
    id_col: str,
    text_col: str,
    n: int = 12,
    max_df: int = 3,
    threshold_1000: int = 500,
):
    """Near-duplicate pairs by EXACT character-n-gram Jaccard ≥ threshold.

    PPJoin-style inverted-index candidate generation: only n-grams whose
    document frequency is ≤ ``max_df`` generate candidates (a "stop-gram"
    cap — frequent grams carry no signal and would make the index join
    quadratic).  Verification then computes the exact Jaccard over each
    doc's FULL distinct n-gram set, so the score itself is uncapped.

    100 TB shape: the self-join key is the rare n-gram, each bucket holds
    ≤ ``max_df`` docs, so candidate generation moves O(grams·max_df) rows
    and never doc × doc.  All stages are built-in SQL functions (codegen);
    the gram table is cached because three stages reuse it.

    Output: (d1, d2, jaccard_1000) with d1 < d2.
    """
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    # materialize normalized text ONCE — inlining the regexp_replace into
    # the transform lambda re-runs the regex per gram position (~300×/doc)
    pre = ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')"
        ).alias("_t"),
    )
    grams = (
        f"array_distinct(transform(sequence(1, char_length(_t) - {n - 1}), "
        f"i -> substring(_t, i, {n})))"
    )
    # the cache is LOAD-BEARING: the gram arrays feed the index build
    # (twice, via the df-frequency aggregate and the rare-gram join) and
    # both verification sides — uncached, the explode/substring pipeline
    # re-executes ~6x and the query measures ~4-5x slower at sf0.1.
    # bench.py clears the cache between runs (fresh lineage per call
    # means entries never hit across runs, they only add pressure).
    garr = (
        pre.filter(F.expr(f"char_length(_t) >= {n}"))
        .select("_id", F.expr(grams).alias("_garr"))
        .cache()
    )
    # candidate generation from per-gram id lists (r13, guide §2.3):
    # because rare grams hold ≤ max_df docs BY DEFINITION, the sorted
    # per-gram id list is bounded and every candidate pair (docs
    # sharing ≥1 rare gram, d1 < d2) falls out of one aggregation +
    # a bounded in-row pair expansion — no doc×doc self-join.
    #
    # r13 session 4 (guide §2.3/§2.5): collect the lists ONLY for rare
    # grams.  Measured at sf0.1, 95% of gram instances (1.35M of
    # 1.42M) belong to grams with df > max_df — the old single
    # aggregate shuffled them all and built collect_lists up to 778
    # ids long just to discard them (an unbounded-list OOM hazard at
    # scale: one hot gram = one reducer's whole memory).  A count
    # aggregate first (map-side partials collapse hot grams to one row
    # per partition — skew-free by construction), then a shuffle-hash
    # join pre-filters the gram stream before the collect_list, which
    # now aggregates rare-gram rows only.  The join and the list
    # aggregate hash by the same key, so the filtered collect adds no
    # exchange; shuffle-hash (not broadcast) because at 100 TB the
    # rare-gram set is the heavy TAIL of the vocabulary — far too big
    # to broadcast (same reasoning as dup_profile's gram join).
    # Candidate set unchanged: grams with 2 ≤ df ≤ max_df and their
    # full id lists are exactly the survivors of the old size filter
    # (measured: 17437 identical pairs at sf0.1).
    g0 = garr.select("_id", F.explode("_garr").alias("_g"))
    pair_expr = (
        "flatten(transform(_ids, (x, i) -> "
        "transform(slice(_ids, i + 2, size(_ids)), "
        "y -> struct(x AS d1, y AS d2))))"
    )
    rare = (
        g0.groupBy("_g")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df").between(2, max_df))
        .select("_g")
    )
    cand = (
        g0.join(rare.hint("shuffle_hash"), "_g")
        .groupBy("_g")
        .agg(F.expr("array_sort(collect_list(_id))").alias("_ids"))
        .select(F.explode(F.expr(pair_expr)).alias("_p"))
        .select(F.col("_p.d1").alias("d1"), F.col("_p.d2").alias("d2"))
        .distinct()
    )
    # verification joins the (small) candidate set against whole gram
    # ARRAYS — array_intersect is one hash pass per pair, with no
    # candidates × grams row explosion and no extra groupBy shuffle
    ga = garr.select(F.col("_id").alias("d1"), F.col("_garr").alias("_ga"))
    gb = garr.select(F.col("_id").alias("d2"), F.col("_garr").alias("_gb"))
    inter = F.size(F.array_intersect(F.col("_ga"), F.col("_gb")))
    union = F.size("_ga") + F.size("_gb") - inter
    return (
        cand.join(ga, "d1")
        .join(gb, "d2")
        .select(
            "d1",
            "d2",
            F.floor(1000.0 * inter / union).cast("bigint").alias("jaccard_1000"),
        )
        .filter(F.col("jaccard_1000") >= threshold_1000)
    )


def set_sim_join_pairs(
    df,
    id_col: str,
    text_col: str,
    side_col: str,
    gram: int = 2,
    threshold_1000: int = 800,
):
    """Cross-side set-similarity JOIN (entity resolution / record linkage):
    pairs of docs from DIFFERENT sides whose word-``gram``-shingle Jaccard
    is ≥ threshold, found via AllPairs/PPJoin PREFIX FILTERING rather than
    a rare-element cap.

    How it differs from :func:`ngram_jaccard_pairs`: that one bounds
    candidates with a document-frequency cap (``max_df``) — a heuristic
    that is only complete when every near-dup pair shares a rare gram.
    Prefix filtering is EXACT-complete at any df distribution: order every
    doc's elements by ascending global (df, token); if
    ``J(x, y) ≥ t`` then the first ``|x| − ⌈t·|x|⌉ + 1`` elements of x and
    the first ``|y| − ⌈t·|y|⌉ + 1`` of y must intersect (AllPairs bound,
    Bayardo et al. WWW'07), so joining prefixes on the element misses
    nothing.  A length filter (``t·|x| ≤ |y| ≤ |x|/t``) prunes inside the
    candidate join.

    100 TB shape: the global order needs NO dense rank (no single-partition
    window) — any total order works, so each doc locally ``array_sort``s
    its ``struct(df, token)`` pairs and slices the prefix.  The df table is
    vocabulary-sized (aggregated once); candidates travel as
    (token → prefix-bucket) join rows, never doc × doc; verification is one
    ``array_intersect`` hash pass per surviving pair.  All stages are
    built-in SQL functions inside whole-stage codegen.

    Output: (d1, d2, jaccard_1000) with side(d1) < side(d2); for equal
    similarity semantics on >2 sides every cross-side pair appears once.

    Reference: no similarity join exists in the reference (SURVEY §2.4) —
    extension surface for dedup/linkage across corpus snapshots.
    """
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    t = threshold_1000
    pre = ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.col(side_col).alias("_side"),
        F.expr(
            f"split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')"
        ).alias("_sp"),
    )
    if gram == 1:
        toks = "array_distinct(_sp)"
    else:
        parts = ", ' ', ".join(
            f"element_at(_sp, i + {j})" for j in range(gram)
        )
        toks = (
            f"array_distinct(transform(sequence(1, size(_sp) - {gram - 1}), "
            f"i -> concat({parts})))"
        )
    # cache is load-bearing: the token arrays feed the df aggregate, the
    # prefix build, and BOTH verification sides (same rationale as the
    # gram-array cache in ngram_jaccard_pairs)
    base = (
        pre.filter(F.expr(f"size(_sp) >= {gram}"))
        .select("_id", "_side", F.expr(toks).alias("_toks"))
        .cache()
    )
    tok0 = base.select("_id", F.explode("_toks").alias("_tok"))
    dfreq = tok0.groupBy("_tok").agg(F.count("*").alias("_df"))
    # per-doc (df, token) structs, locally sorted — the ascending global
    # order materializes per doc with no global window
    ranked = tok0.join(dfreq, "_tok").select(
        "_id", F.struct(F.col("_df"), F.col("_tok")).alias("_o")
    )
    # prefix_len = s − ceil(t·s/1000) + 1, clamped to [1, s]
    plen = f"greatest(1, _s - cast((_s * {t} + 999) div 1000 as int) + 1)"
    # cached (r13, guide §2.4): BOTH candidate self-join sides read the
    # prefix rows — uncached, the whole token/df-rank/sort/slice
    # pipeline re-executed once per side (the plan showed the subtree
    # twice).  Prefix rows are (id, size, token, side) — narrow, and a
    # bounded slice of each doc's tokens.
    pfx = (
        ranked.groupBy("_id")
        .agg(
            F.expr("array_sort(collect_list(_o))").alias("_ord"),
            F.count("*").alias("_s"),
        )
        .select(
            "_id",
            "_s",
            F.explode(F.expr(f"slice(_ord, 1, {plen})")).alias("_p"),
        )
        .select("_id", "_s", F.col("_p._tok").alias("_tok"))
        .join(base.select("_id", "_side"), "_id")
        .cache()
    )
    a = pfx.select(
        F.col("_id").alias("d1"), F.col("_s").alias("_sa"),
        F.col("_side").alias("_da"), "_tok",
    )
    b = pfx.select(
        F.col("_id").alias("d2"), F.col("_s").alias("_sb"),
        F.col("_side").alias("_db"), "_tok",
    )
    cand = (
        a.join(b, "_tok")
        .filter(
            (F.col("_da") < F.col("_db"))
            & (F.col("_sb") * 1000 >= F.col("_sa") * t)
            & (F.col("_sa") * 1000 >= F.col("_sb") * t)
        )
        .select("d1", "d2")
        .distinct()
    )
    ga = base.select(F.col("_id").alias("d1"), F.col("_toks").alias("_ga"))
    gb = base.select(F.col("_id").alias("d2"), F.col("_toks").alias("_gb"))
    inter = F.size(F.array_intersect(F.col("_ga"), F.col("_gb")))
    union = F.size("_ga") + F.size("_gb") - inter
    return (
        cand.join(ga, "d1")
        .join(gb, "d2")
        .select(
            "d1",
            "d2",
            F.floor(1000.0 * inter / union).cast("bigint").alias("jaccard_1000"),
        )
        .filter(F.col("jaccard_1000") >= t)
    )


def simhash_fingerprint(df, id_col: str, text_col: str, bits: int = 32):
    """→ (id, simhash) where simhash is a ``bits``-wide fingerprint.

    Classic SimHash over word unigrams (with multiplicity): each token
    votes ±1 per bit position of its 60-bit hash; bit set iff the vote
    sum is positive.  One explode + one groupBy(doc) — all integer ops."""
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    words = f"split(lower(trim({text_col})), '\\\\s+')"
    tok = ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.explode(F.expr(words)).alias("_tok"),
    ).withColumn("_h", F.expr(_h60_sql("_tok")))
    # one F.expr (one py4j round-trip) per vote column instead of ~7
    # Column-API calls each: at bits=32 that is ~30 gateway calls for
    # the whole aggregate instead of ~230 (r13, guide §4 — the Python
    # boundary; measured ~2 s of plan time on q_simhash).  The parsed
    # Catalyst expression is identical to the old when/shiftright chain.
    votes = [
        F.expr(
            f"sum(case when (shiftright(_h, {b}) & 1) = 1 "
            f"then 1 else -1 end) as v{b}"
        )
        for b in range(bits)
    ]
    agg = tok.groupBy("_id").agg(*votes)
    # left-associative + chain, same order as the old loop (integer
    # adds — exact either way)
    terms = " + ".join(
        f"(case when v{b} > 0 then {2 ** b} else 0 end)" for b in range(bits)
    )
    return agg.select(
        F.col("_id"), F.expr(f"cast(({terms}) as bigint) as simhash")
    )


def decontaminate(
    train_df,
    eval_df,
    id_col: str,
    text_col: str,
    n: int = 12,
):
    """Benchmark DECONTAMINATION: which training documents share at
    least one exact character-``n``-gram with any eval/benchmark
    document (the GPT-3-style long-n-gram overlap test — the step that
    keeps test sets out of the training corpus).

    → (train_id, n_shared_grams, n_eval_docs) for contaminated train
    docs only.

    100 TB shape: the benchmark side is tiny relative to the corpus, so
    its distinct gram set is BROADCAST — the corpus-side gram stream
    joins it map-side with no shuffle of the big side; the only shuffle
    is the final per-doc aggregate.  All stages are built-in SQL
    expressions (codegen), same normalization as the Jaccard pipeline.
    """
    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    def grams_of(df, out_id):
        pre = ensure_min_parallelism(df).select(
            F.col(id_col).alias(out_id),
            F.expr(
                f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')"
            ).alias("_t"),
        )
        # grams travel as their 60-bit md5 hash: the broadcast set and
        # the matched rows reaching the per-doc aggregate carry 8-byte
        # keys instead of n-char strings; the oracle hashes identically
        garr = (
            f"transform(array_distinct(transform("
            f"sequence(1, char_length(_t) - {n - 1}), "
            f"i -> substring(_t, i, {n}))), "
            f"g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint))"
        )
        return (
            pre.filter(F.expr(f"char_length(_t) >= {n}"))
            .select(out_id, F.explode(F.expr(garr)).alias("_g"))
        )

    train_g = grams_of(train_df, "train_id")
    eval_g = grams_of(eval_df, "eval_id")
    hits = train_g.join(F.broadcast(eval_g), "_g")
    return hits.groupBy("train_id").agg(
        F.count_distinct("_g").alias("n_shared_grams"),
        F.count_distinct("eval_id").alias("n_eval_docs"),
    )


def line_dedup(df, id_col: str, text_col: str, sep: str = ". "):
    """CORPUS-WIDE LINE DEDUP (the C4/RefinedWeb curation step): split
    every document into segments, keep each distinct segment's FIRST
    occurrence corpus-wide (minimum (doc, position) — later repeats,
    boilerplate headers, chrome lines are dropped), and reassemble the
    surviving segments per document in original order.

    → (id, n_kept, n_removed, rebuilt_fp) with the rebuilt text carried
    as the shared 60-bit fingerprint, not the string (result stays
    narrow; the fingerprint is engine-portable).

    100 TB shape: one explode (map-side), ONE groupBy(segment) to elect
    keepers — state is one packed bigint per distinct segment, the
    min-aggregate's partial combine does the heavy lifting map-side —
    one join back on the segment, one per-doc aggregate.  All built-in
    expressions, no Python.
    """
    import re as _re

    from pyspark.sql import functions as F

    from ._parallel import ensure_min_parallelism

    segs = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            # F.split takes a Java REGEX — escape the literal separator
            F.posexplode(
                F.split(F.col(text_col), _re.escape(sep), -1)
            ).alias("_pos", "_seg"),
        )
        .filter(F.col("_seg") != "")
    )
    packed = segs.withColumn(
        # keeper election groups on the 60-bit segment HASH, not the
        # segment text: the agg side shuffles (8-byte key, 16-byte
        # (_id,_pos) struct) instead of whole sentences.  The oracle
        # hashes with the same md5 convention, so the astronomically-
        # rare collisions fold identically on both engines.
        "_sh",
        F.expr("cast(conv(substr(md5(_seg), 1, 15), 16, 10) as bigint)"),
    )
    # min over a (doc, pos) STRUCT — lexicographic, exact for any id /
    # segment count (an arithmetic id*1e6+pos pack would mis-elect past
    # 1M segments and overflow for 64-bit-hash doc ids).  r14 (guide
    # §2.4): elect the keeper with an unbounded window over _sh instead
    # of a groupBy + join-back — the old shape shuffled the exploded
    # segment table TWICE (agg side + join probe side) and re-ran the
    # split/explode/md5 pipeline once per consumer; the window shuffles
    # it once and reads it once, with identical (min-struct) election.
    from pyspark.sql import Window as _W

    kept = packed.withColumn(
        "_is_kept",
        F.struct("_id", "_pos")
        == F.min(F.struct("_id", "_pos")).over(_W.partitionBy("_sh")),
    )
    rebuilt = F.expr(
        "concat_ws('"
        + sep.replace("'", "''")
        + "', transform(sort_array(collect_list(CASE WHEN _is_kept THEN "
        "struct(_pos, _seg) END)), s -> s._seg))"
    )
    return (
        kept.groupBy("_id")
        .agg(
            F.sum(F.when(F.col("_is_kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("_is_kept"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_removed"),
            rebuilt.alias("_rebuilt"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_kept",
            "n_removed",
            F.expr(
                "cast(conv(substr(md5(_rebuilt), 1, 15), 16, 10) as bigint)"
            ).alias("rebuilt_fp"),
        )
    )
