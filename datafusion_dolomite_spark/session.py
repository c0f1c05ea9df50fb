"""SparkSession factory with scale-aware defaults.

Single place where execution tuning lives.  Local testing runs
``local[N]``; on a real cluster the same settings apply (AQE re-plans at
runtime, skew joins get split, shuffle partitions coalesce) — the configs
below are the ones that matter at 100 TB, not local-only toys.
"""

from __future__ import annotations

import os

__all__ = ["get_spark", "stop_spark", "configure_session"]

# Runtime-settable SQL confs the engine depends on regardless of which
# SparkSession it is handed.  The driver (and any embedding application)
# builds its own session without our builder configs, so every entry
# point re-asserts these defensively before the first read:
# * nanosAsLong — events.parquet stores TIMESTAMP(NANOS); without this
#   every events scan dies with PARQUET_TYPE_ILLEGAL (the single cause of
#   all 17 round-1 driver failures).
# * UTC session timezone + Arrow — oracle determinism of date/timestamp
#   queries and the pandas-UDF fast path assume them.
_REQUIRED_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
}

#: r13 optimization (guide §2.2 — shuffle/compute fewer bytes): Catalyst's
#: InferFiltersFromGenerate infers ``size(arr) > 0 AND isnotnull(arr)``
#: below every explode().  When the array is COMPUTED (our shingle/gram/
#: band pipelines: split + transform + array_distinct over text), the
#: inferred filter re-materializes the whole array expression a second
#: time — and after pushdown it lands BELOW the parallelism repartition,
#: serializing the most expensive map work of the dedup family onto the
#: single scan partition (measured: shingles-explode 4.05 s -> 0.37 s at
#: sf0.1 with the rule excluded; q_incremental_dedup 6.3 s -> 1.3 s).
#: Excluding the rule is results-identical by construction: Generate
#: (outer=false) already drops null/empty arrays itself; the filter it
#: infers is purely redundant work.  Stored-array explodes lose nothing:
#: isnotnull/size on a parquet LIST column never reaches PushedFilters.
_EXCLUDED_OPTIMIZER_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def _merge_excluded_rules(existing: str | None) -> str:
    """Append our exclusions to whatever the session already excludes."""
    have = [r.strip() for r in (existing or "").split(",") if r.strip()]
    for r in _EXCLUDED_OPTIMIZER_RULES.split(","):
        if r not in have:
            have.append(r)
    return ",".join(have)


def configure_session(spark) -> None:
    """Pin the runtime SQL confs the engine requires on an arbitrary,
    possibly externally-built SparkSession.  Idempotent and cheap; all
    keys are runtime-settable (no session restart needed)."""
    for key, value in _REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # A conf unavailable on some Spark build must not take down
            # the query path; the read will surface any real problem.
            pass
    # merge (never clobber) the explode-filter-inference exclusion into
    # any exclusions the embedding application already set
    try:
        key = "spark.sql.optimizer.excludedRules"
        cur = spark.conf.get(key, None)
        merged = _merge_excluded_rules(cur)
        if merged != (cur or ""):
            spark.conf.set(key, merged)
    except Exception:
        pass
    # r13 optimization (guide §4, the Python boundary): PySpark 4's
    # DataFrame-debugging call-site capture wraps EVERY DataFrame/Column
    # API call with a conf.get + PySparkCurrentOrigin.set/clear — 2-3
    # extra py4j round-trips per call (measured ~3 ms/call in the
    # planning path; ~25% of a typical query's plan-construction time).
    # Purely a debugging aid (call-site lines in error messages), and a
    # STATIC conf, so on an externally-built session it cannot be set
    # via spark.conf — our own builder sets it (get_spark below), and
    # here we flip pyspark's process-wide cache directly so driver-built
    # sessions get the same fast path.  Guarded: if a future pyspark
    # renames the flag this silently degrades to the default behaviour.
    try:
        import pyspark.errors.utils as _eu

        _eu._enable_debugging_cache = False
    except Exception:
        pass


def get_spark(app_name: str = "datafusion-dolomite-spark", cpus: int | None = None):
    from pyspark.sql import SparkSession

    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime re-planning — coalesces shuffle partitions, converts
        # to broadcast when runtime stats allow, splits skewed partitions.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # One shuffle partition per core locally; a cluster deployment sets
        # this ~2-3x total cores (AQE coalesces the excess).
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Keep Python<->JVM transfers Arrow-vectorized (pandas UDF path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # local mode: driver == every executor, so this is the WHOLE
        # JVM.  16g on the 128 GiB test box keeps late-suite GC pressure
        # off the heavy text queries (150-query runs accumulate listener
        # state and codegen classes; with 8g the tail queries measured up
        # to ~1.7x slower than solo)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # see _REQUIRED_RUNTIME_CONFS: the per-call call-site capture is
        # pure py4j overhead for an engine; set at build time so the
        # process-wide pyspark cache reads it before the first call
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # see _EXCLUDED_OPTIMIZER_RULES: inferred explode-filters double
        # the dedup family's gram computation on the scan partition
        .config("spark.sql.optimizer.excludedRules", _EXCLUDED_OPTIMIZER_RULES)
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read as bigint (nanoseconds since epoch) and convert explicitly
        # in queries that need event time.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def stop_spark() -> None:
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
