"""Exactly-once proof for the streaming parquet file sink UNDER FAILURE.

``q_stream_file_sink``'s clean-rerun resume is proved by the oracle
record; this test proves the stronger property: a query KILLED between
micro-batches and restarted from its checkpoint produces output
identical to an uninterrupted run — no lost batches, no duplicated
batches.  The file sink's commit log admits only files recorded by a
committed batch; an in-flight batch at kill time is discarded and
replayed from the checkpointed source offsets on restart.

Mechanics: the source directory is split into several parquet files,
``maxFilesPerTrigger=1`` forces one micro-batch per file, a slow
processing-time trigger leaves a wide window to stop the query after
the first committed batch, and the restart drains the remainder with
``availableNow``.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from .conftest import SF_DIR

N_FILES = 4


def _source_dir(spark, tmp_path):
    """events split into N_FILES parquet files (one micro-batch each)."""
    src = str(tmp_path / "src")
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(src)
    )
    return src


def _start(spark, src, out, ckpt, *, available_now, schema):
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    w = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    else:
        # long inter-trigger gap: batch 0 runs immediately, batch 1 waits
        # — a wide, race-free window in which to kill the query
        w = w.trigger(processingTime="120 seconds")
    return w.start()


def test_foreachbatch_upsert_exactly_once_across_crash(spark, tmp_path):
    """incremental_upsert killed at the WORST point — after a batch's
    snapshot version is written but before its checkpoint commits — must
    converge to the same final snapshot as an uninterrupted run: the
    replayed batch re-reads the PREDECESSOR version and overwrites the
    orphan, so nothing is double-counted."""
    import pytest as _pytest

    from datafusion_dolomite_spark.streaming.pipeline import incremental_upsert

    src = str(tmp_path / "usrc")
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .selectExpr(
            "user_id",
            "concat(lpad(cast(event_id as string), 12, '0')) AS ord",
            "cast(floor(value * 100) as bigint) AS cents",
        )
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(src)
    )

    control = incremental_upsert(spark, src, str(tmp_path / "ctl"))
    control_rows = sorted(tuple(r) for r in control.collect())
    assert control_rows

    def boom(batch_id):
        if batch_id == 1:
            raise RuntimeError("injected crash after v_1 write")

    crash_root = str(tmp_path / "crash")
    with _pytest.raises(Exception):
        incremental_upsert(spark, src, crash_root, _fault=boom)

    recovered = incremental_upsert(spark, src, crash_root)
    recovered_rows = sorted(tuple(r) for r in recovered.collect())
    assert recovered_rows == control_rows, (
        "upsert snapshot after crash+restart must equal an "
        "uninterrupted run"
    )


def test_file_sink_exactly_once_across_kill(spark, tmp_path):
    src = _source_dir(spark, tmp_path)
    schema = spark.read.parquet(src).schema

    # uninterrupted control run
    ctl_out = str(tmp_path / "ctl_out")
    q = _start(
        spark, src, ctl_out, str(tmp_path / "ctl_ckpt"),
        available_now=True, schema=schema,
    )
    q.awaitTermination(timeout=120)
    control = sorted(
        tuple(r) for r in spark.read.parquet(ctl_out).collect()
    )
    assert control, "control run produced no rows"

    # crash run: kill after the FIRST committed batch, well before the
    # 120 s processing-time trigger would start batch 1
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = _start(spark, src, out, ckpt, available_now=False, schema=schema)
    deadline = time.time() + 90
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["batchId"] >= 0:
            break
        time.sleep(0.2)
    assert q.lastProgress is not None and q.lastProgress["batchId"] == 0, (
        "expected to observe exactly batch 0 before the kill; got "
        f"{q.lastProgress}"
    )
    q.stop()  # kill between batches

    partial = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert len(partial) < len(control), (
        "kill landed after all batches — the crash window never opened"
    )

    # restart from the SAME checkpoint; availableNow drains the rest
    q = _start(spark, src, out, ckpt, available_now=True, schema=schema)
    q.awaitTermination(timeout=120)

    recovered = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert recovered == control, (
        f"recovered {len(recovered)} rows != control {len(control)}: "
        "file-sink output after kill+restart must equal an uninterrupted run"
    )
