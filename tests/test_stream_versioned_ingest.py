"""Streaming ingestion into a versioned table (r8): one version per
micro-batch via the planner's delta-append, time travel across the
ingest, and exactly-once under a crash between the version append and
the stream checkpoint commit."""

from __future__ import annotations

import os

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog
from datafusion_dolomite_spark.streaming.pipeline import (
    stream_versioned_ingest,
)


@pytest.fixture()
def setup(spark, tmp_path):
    base = str(tmp_path / "base")
    spark.createDataFrame(
        [(0, "seed")], "k bigint, tag string"
    ).coalesce(1).write.parquet(base)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for b in range(3):
        spark.createDataFrame(
            [(10 * b + i, f"b{b}") for i in range(1, 4)],
            "k bigint, tag string",
        ).coalesce(1).write.mode("append").parquet(src)
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    cat.register("vt", base)
    return QueryPlanner(spark, cat), src, str(tmp_path / "ck")


def test_versioned_stream_ingest(setup, spark):
    qp, src, ck = setup
    n = stream_versioned_ingest(qp, "vt", src, ck)
    assert n == 3  # one micro-batch per source file
    hist = [(r["version"], r["operation"]) for r in qp.sql(
        "describe history vt"
    ).collect()]
    assert hist[0] == (0, "base") and len(hist) == 4
    assert all(op.startswith("stream-insert batch=") for _, op in hist[1:])
    assert qp.sql("select * from vt version as of 0").count() == 1
    assert qp.sql("select * from vt version as of 2").count() == 7
    rows = sorted(r["k"] for r in qp.dataframe(
        __import__("datafusion_dolomite_spark").LogicalPlanBuilder()
        .scan("vt").build()
    ).collect())
    assert len(rows) == 10  # 1 seed + 3x3 ingested
    # resuming the finished stream ingests nothing new
    n2 = stream_versioned_ingest(qp, "vt", src, ck)
    assert n2 == 0
    assert len(qp.sql("describe history vt").collect()) == 4


def test_crash_between_append_and_commit_is_exactly_once(setup, spark):
    """The worst-case crash: version appended, checkpoint not committed.
    The restarted stream must detect its own orphan head, drop it, and
    re-append — no duplicated rows, no skipped batch."""
    qp, src, ck = setup

    boom = {"armed": True}

    def fault(batch_id):
        if batch_id == 1 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash after append, before commit")

    with pytest.raises(Exception, match="injected crash"):
        stream_versioned_ingest(qp, "vt", src, ck, _fault=fault)
    # the orphan version for batch 1 is at the head
    ops = qp._table_ops["vt"]
    assert ops[-1] == "stream-insert batch=1"
    # restart: batch 1 replays (orphan dropped + re-appended), batch 2 runs
    n = stream_versioned_ingest(qp, "vt", src, ck)
    assert n == 2
    hist = [r["operation"] for r in qp.sql("describe history vt").collect()]
    assert hist.count("stream-insert batch=1") == 1
    assert len(hist) == 4  # base + 3 batches, no duplicates
    rows = [r["k"] for r in qp.sql("select * from vt version as of 3").collect()]
    assert len(rows) == len(set(rows)) == 10
