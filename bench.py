"""Benchmark harness: runs the declared headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Timing = full pipeline per query: our optimizer (heuristic + cascades)
+ Spark execution to a no-op sink (forces complete materialization
without driver collect overhead).  Each query runs twice; the second
(warm) time is reported, so JVM/JIT/session startup doesn't drown the
signal at small scale.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _canary_sec(spark) -> float:
    """Machine-speed canary: warm wall-time of a FIXED-work, pinned-plan
    aggregate over an in-memory range — no parquet, no optimizer, no
    data-dependent shuffle.  The plan is identical on every host and
    every round, so the only thing that moves this number is the
    machine (CPU speed, co-tenant load, JVM).  Round-over-round
    per-query comparisons divide by the canary ratio before being read
    as regressions (VERDICT r8: two consecutive rounds were spent
    re-adjudicating uniform host variance by hand).  Mixes integer and
    floating-point work so both ALU- and FPU-bound movement register;
    3 timed runs after a codegen warm-up, min reported (same
    noise-robust estimator as the query timings)."""
    from pyspark.sql import functions as F

    def run():
        df = spark.range(0, 50_000_000, 1, 32)
        df.select(
            F.sum(F.col("id") % 97).alias("a"),
            F.sum(F.sqrt(F.col("id").cast("double"))).alias("b"),
        ).collect()

    run()  # warm: whole-stage codegen + JIT
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _io_canary_sec(spark) -> float:
    """DISK-speed canary (r12, VERDICT r11 item 4): warm wall-time of a
    FIXED-work parquet write+read to a temp dir.  The CPU canary cannot
    normalize I/O bursts — every round since r10 paid a manual
    adjudication tax re-running disk-writing DML/streaming queries the
    CPU canary co-flagged during co-tenant I/O load.  Same estimator
    discipline as ``_canary_sec``: one warm-up, min of 2 timed runs;
    sampled on the same interleave so the per-position interpolation
    works for both families."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="bench_io_canary_")
    path = os.path.join(d, "t")

    def run():
        spark.range(0, 1_000_000, 1, 8).select(
            F.col("id"),
            (F.col("id") % 1000).alias("k"),
            F.sha1(F.col("id").cast("string")).alias("s"),
        ).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).select(F.count("*")).collect()

    try:
        run()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return round(best, 4)


#: queries whose TIMED passes write to disk (DML/versioned tables,
#: materialized views, CDC exports, sinks) — normalized by the I/O
#: canary in the regression gate; everything q_stream_* is included by
#: prefix (micro-batch sinks + state stores).
_IO_QUERIES = {
    "q_sql_dv", "q_sql_merge", "q_sql_merge_multi", "q_sql_merge_nms",
    "q_sql_merge_evolve", "q_sql_ctas", "q_sql_restore",
    "q_sql_time_travel", "q_table_changes", "q_cdc_export",
    "q_matview", "q_sql_create_mv", "q_mv_incremental", "q_mv_cdc",
    "q_mv_sketch", "q_incremental_dedup", "q_csv_source",
    "q_multiformat_union",
}


def _is_io_query(name: str) -> bool:
    return name.startswith("q_stream") or name in _IO_QUERIES


def _load_baseline(repo: str, out_path: str):
    """Previous round's committed full artifact, for the canary-
    normalized regression gate (r10, VERDICT item 5).  Preference
    order: the highest-numbered ``BENCHFULL_r{N}.json`` that isn't the
    file this run writes; else the HEAD-committed
    ``BENCHFULL_local.json`` (the work-tree copy is overwritten by
    every local run, so the committed blob IS the previous round);
    else the work-tree copy (read before this run overwrites it)."""
    import glob
    import subprocess

    cands = [
        c
        for c in glob.glob(os.path.join(repo, "BENCHFULL_r*.json"))
        if os.path.abspath(c) != os.path.abspath(out_path)
    ]
    if cands:

        def rn(p):
            m = re.search(r"_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        best = max(cands, key=rn)
        try:
            with open(best) as f:
                return json.load(f), os.path.basename(best)
        except (OSError, ValueError):
            pass
    try:
        blob = subprocess.run(
            ["git", "-C", repo, "show", "HEAD:BENCHFULL_local.json"],
            capture_output=True, text=True, timeout=10,
        )
        if blob.returncode == 0:
            return json.loads(blob.stdout), "HEAD:BENCHFULL_local.json"
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    try:
        with open(os.path.join(repo, "BENCHFULL_local.json")) as f:
            return json.load(f), "BENCHFULL_local.json"
    except (OSError, ValueError):
        return None, None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from datafusion_dolomite_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("ddspark-bench")
    qs = entry_mod.queries()
    canary_start = _canary_sec(spark)

    # INTERLEAVED canary samples (r10): a single start/end pair cannot
    # normalize a 25-minute run on a host whose speed varies DURING it
    # (observed: end-canary 1.6x faster than the speed mid-run queries
    # actually saw — 68 false regressions in one artifact).  A sample
    # every ~32 queries pins the machine's speed near the moment each
    # query ran; per-query normalization interpolates between the
    # surrounding samples.  ~6 extra samples x ~1 s — noise next to the
    # run.
    canary_samples: list = [(0, canary_start)]
    io_canary_samples: list = [(0, _io_canary_sec(spark))]
    _CANARY_EVERY = 32

    timings: dict[str, float] = {}
    positions: dict[str, int] = {}
    for qi, (name, fn) in enumerate(qs.items()):
        positions[name] = qi
        if qi and qi % _CANARY_EVERY == 0:
            canary_samples.append((qi, _canary_sec(spark)))
            io_canary_samples.append((qi, _io_canary_sec(spark)))
        try:
            # warm-up run (plan + execute once)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # a query's internal .cache()/persist entries never hit across
            # runs (fresh lineage per call) — leftover warm-up entries only
            # add storage pressure to the timed run, so drop them first
            spark.catalog.clearCache()
            # MIN of two timed runs: periodic external bursts (the round
            # harness's bookkeeping, co-tenant activity) can inflate one
            # arbitrary query per pass by 5-10x; a single sample then
            # reads as a plan regression that solo re-runs never confirm.
            # The min is the standard noise-robust "how fast can this
            # plan go" estimator.
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            timings[name] = round(best, 4)
        except Exception as e:  # keep the harness alive; a missing query is a bug
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # pipelines that cache intermediates (dedup/similarity) would
            # otherwise stack dead cache entries across 30+ queries and
            # squeeze later queries' execution memory
            spark.catalog.clearCache()
            # localCheckpoint blocks (connected components) and broadcast
            # remnants are only released when their driver-side handles
            # are GC'd — without this, queries late in the run measure
            # the accumulated pressure of earlier ones (observed: ~2x on
            # q_ngram_jaccard), not their own plan.  Outside the timed
            # section, so it costs wall-clock, not reported seconds.
            import gc

            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass

    ok = sorted(t for t in timings.values() if t >= 0)
    total = round(sum(ok), 4)
    # Structured Streaming queries pay a fixed micro-batch startup cost
    # (~1.5-7 s each locally) unrelated to relational plan quality — group
    # them separately so a regression in the relational queries isn't
    # masked by (or blamed on) streaming overhead.
    stream = sorted(
        t for n, t in timings.items() if n.startswith("q_stream") and t >= 0
    )
    # QUALITY GATES (r11, VERDICT r10 item 6): queries whose job is to
    # MEASURE recall by running several full ANN chains (brute-force
    # ground truth + raw/residual/trained PQ at refine=100) — 3-5x the
    # work of any pipeline operator BY DESIGN.  Folding them into the
    # relational total made the headline number 13% gate-wall; they get
    # their own section so pipeline regressions stay visible and gate
    # regressions are judged against gate baselines.
    gate_names = {"q_knn_residual", "q_knn_cents_trained", "q_knn_recall"}
    gates = sorted(
        t for n, t in timings.items() if n in gate_names and t >= 0
    )
    rel = sorted(
        t
        for n, t in timings.items()
        if not n.startswith("q_stream") and n not in gate_names and t >= 0
    )
    # sort_keys so the per-query dict serializes in a stable (alphabetical)
    # order: the round driver stores a truncated tail of this line, and with
    # insertion-ordered keys the tail's query subset changed whenever
    # queries() gained an entry, defeating cross-round per-query diffs
    # (VERDICT r6 "Residual nits").  Sorted keys make any prefix/tail of the
    # artifact comparable round-to-round.
    # a second canary sample AFTER the run: if the host slowed down
    # mid-run (co-tenant burst), start/end disagree and the min is the
    # fairest normalizer for "how fast could this machine go today"
    canary_end = _canary_sec(spark)
    canary_samples.append((len(qs), canary_end))
    io_canary_samples.append((len(qs), _io_canary_sec(spark)))
    doc = {
        "metric": "total warm wall-clock of headline queries (optimizer+execution)",
        "value": total,
        "unit": "sec",
        "canary_sec": round(min(canary_start, canary_end), 4),
        "canary_start_sec": canary_start,
        "canary_end_sec": canary_end,
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(timings) - len(ok),
        "p50_query_sec": round(ok[len(ok) // 2], 4) if ok else -1.0,
        "max_query_sec": round(ok[-1], 4) if ok else -1.0,
        "relational_total_sec": round(sum(rel), 4),
        "relational_p50_sec": round(rel[len(rel) // 2], 4) if rel else -1.0,
        "streaming_total_sec": round(sum(stream), 4),
        "n_streaming": len(stream),
        "gates_total_sec": round(sum(gates), 4),
        "n_gates": len(gates),
    }
    # the driver keeps only a truncated tail of the stdout line, which
    # covered 26 of 170 queries' timings in the r7 round artifacts —
    # ALSO write the complete per-query dict to a committed file so an
    # r(N)-vs-r(N-1) diff is possible for EVERY query from repo
    # artifacts alone (VERDICT r7 item 7).  $SPARK_GRAFT_ROUND names
    # the file; unset (local iteration) writes BENCHFULL_local.json.
    tag = os.environ.get("SPARK_GRAFT_ROUND", "local")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"BENCHFULL_r{tag}.json" if tag.isdigit()
                       else "BENCHFULL_local.json")
    # CANARY-NORMALIZED REGRESSION GATE (r10, VERDICT item 5): the
    # round-over-round comparison is machine-generated instead of
    # hand-adjudicated in BENCHNOTES.  Each query's time divides by the
    # canary speed INTERPOLATED at its position in the run (the
    # interleaved samples above), the previous committed artifact's by
    # ITS per-position canary (fallback: its global canary_sec for
    # pre-interleaving artifacts); a query whose normalized time grew
    # >1.5x AND by more than 0.25 s (at this machine's speed — tiny
    # queries jitter across the ratio for free) lands in
    # ``regressions``.

    def _canary_at(samples, i):
        """Linear interpolation of the canary speed at query index i."""
        lo = max((s for s in samples if s[0] <= i), key=lambda s: s[0])
        hi = min((s for s in samples if s[0] >= i), key=lambda s: s[0])
        if hi[0] == lo[0]:
            return lo[1]
        f = (i - lo[0]) / (hi[0] - lo[0])
        return lo[1] + f * (hi[1] - lo[1])

    doc["canary_samples"] = [
        [i, round(c, 4)] for i, c in canary_samples
    ]
    doc["io_canary_samples"] = [
        [i, round(c, 4)] for i, c in io_canary_samples
    ]
    doc["io_canary_sec"] = round(min(c for _, c in io_canary_samples), 4)
    doc["normalized_queries"] = {
        q: round(t / _canary_at(canary_samples, positions[q]), 4)
        for q, t in timings.items()
        if t >= 0
    }
    # the disk-writing families normalize by the I/O canary instead —
    # the regressions computation below picks the right one per family
    doc["io_normalized_queries"] = {
        q: round(t / _canary_at(io_canary_samples, positions[q]), 4)
        for q, t in timings.items()
        if t >= 0 and _is_io_query(q)
    }
    base, base_name = _load_baseline(
        os.path.dirname(os.path.abspath(__file__)), out
    )
    # BASELINE-DRIFT GUARD (r13, VERDICT r12 item 7): a registry query
    # the committed baseline lacks has NO regression row — silently.
    # r12 shipped exactly that (q_sql_any_all landed after the baseline
    # refresh), so make the drift impossible to miss: list the missing
    # keys in the artifact AND on stderr.  Not a hard assert — mid-
    # round the baseline legitimately trails new queries, and killing
    # the driver bench for that would cost the whole round's numbers;
    # the round discipline is that this list must be EMPTY at the
    # final (baseline-refresh) commit.
    if base:
        missing = sorted(set(timings) - set(base.get("queries") or {}))
        doc["baseline_missing_queries"] = missing
        if missing:
            print(
                f"WARNING: {len(missing)} queries have no baseline row "
                f"in {base_name}: {missing}",
                file=sys.stderr,
            )
    regressions = []
    if base and base.get("canary_sec"):
        bnorm = base.get("normalized_queries") or {}
        bnorm_io = base.get("io_normalized_queries") or {}
        bcanary = base["canary_sec"]
        canary = doc["canary_sec"]
        for q, t in sorted(timings.items()):
            bt = (base.get("queries") or {}).get(q)
            if t < 0 or bt is None or bt < 0:
                continue
            if _is_io_query(q) and q in bnorm_io:
                # disk-writing family: both sides I/O-canary-normalized
                # (falls through to the CPU canary until the baseline
                # artifact carries io_normalized_queries)
                prev_n = bnorm_io[q]
                cur_n = doc["io_normalized_queries"][q]
            else:
                prev_n = bnorm.get(q, bt / bcanary)
                cur_n = doc["normalized_queries"][q]
            # a flag needs BOTH the normalized AND the raw ratio past
            # 1.5x — a canary mis-estimate alone can then never create
            # one — and the query to be >=1 s now: this host's
            # run-to-run variance on sub-second queries exceeds the
            # threshold routinely (measured r10: 23 sub-second flags,
            # zero reproducible solo)
            if (
                t >= 1.0
                and cur_n > 1.5 * prev_n
                and t > 1.5 * bt
            ):
                regressions.append({
                    "query": q,
                    "prev_sec": bt,
                    "cur_sec": t,
                    "prev_norm": round(prev_n, 3),
                    "cur_norm": round(cur_n, 3),
                    "ratio": round(cur_n / prev_n, 2),
                })
    doc["regression_baseline"] = base_name
    doc["regressions"] = regressions
    print(json.dumps(doc, sort_keys=True))
    try:
        with open(out, "w") as f:
            json.dump(doc, f, sort_keys=True, indent=1)
            f.write("\n")
    except OSError:
        pass  # stdout line already carries the data
    spark.stop()


if __name__ == "__main__":
    main()
