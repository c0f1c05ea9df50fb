"""File-level data skipping (sources/skipping.py).

The proof pattern mirrors test_partition_pruning: a CORRUPT decoy file
whose sidecar band lies outside the predicate is planted in the
directory — if the pruned scan ever opened it, the read would throw.
Equality against the unclustered original proves the kept-file superset
plus re-applied predicate is lossless.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest

SRC = "/root/testdata/sf0.001/orders.parquet"


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    from datafusion_dolomite_spark.sources.sinks import write_parquet
    from datafusion_dolomite_spark.sources.skipping import write_file_stats

    dest = str(tmp_path_factory.mktemp("skip") / "orders_by_custkey")
    write_parquet(
        spark.read.parquet(SRC), dest, cluster_by=["o_custkey"], n_files=4
    )
    doc = write_file_stats(dest, ["o_custkey", "o_orderdate"])
    assert len(doc["files"]) == 4
    return dest


def test_stats_sidecar_bands_cover_and_narrow(clustered):
    """Each file's band is narrow (range clustering worked) and the
    union of bands covers the key domain."""
    with open(os.path.join(clustered, "_file_stats.json")) as f:
        stats = json.load(f)
    bands = [v["o_custkey"] for v in stats["files"].values()]
    assert all(b is not None for b in bands)
    assert min(b[0] for b in bands) == 0
    assert max(b[1] for b in bands) == 149
    # range layout: each of 4 files spans well under half the domain
    assert all(b[1] - b[0] < 75 for b in bands)


def test_pruned_scan_skips_files_and_never_opens_corrupt_decoy(
    spark, clustered
):
    from datafusion_dolomite_spark.sources.skipping import (
        STATS_NAME,
        select_files,
        skipping_scan,
    )

    decoy = os.path.join(clustered, "part-99999-deadbeef.parquet")
    with open(decoy, "wb") as f:
        f.write(b"NOT A PARQUET FILE")
    sp = os.path.join(clustered, STATS_NAME)
    with open(sp) as f:
        stats = json.load(f)
    stats["files"]["part-99999-deadbeef.parquet"] = {
        "o_custkey": [10**9, 2 * 10**9],
        "o_orderdate": None,
    }
    with open(sp, "w") as f:
        json.dump(stats, f)
    try:
        sel, total = select_files(clustered, "o_custkey", 0, 40)
        assert total == 5
        assert decoy not in sel
        assert 1 <= len(sel) <= 2, sel  # band [0,40] ~ 27% of 4 files
        got = (
            skipping_scan(spark, clustered, "o_custkey", 0, 40)
            .filter("o_custkey BETWEEN 0 AND 40")
            .collect()
        )
        want = (
            spark.read.parquet(SRC)
            .filter("o_custkey BETWEEN 0 AND 40")
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    finally:
        os.remove(decoy)


def test_timestamp_bands_prune(spark, tmp_path):
    from datafusion_dolomite_spark.sources.sinks import write_parquet
    from datafusion_dolomite_spark.sources.skipping import (
        select_files,
        skipping_scan,
        write_file_stats,
    )

    dest = str(tmp_path / "orders_by_date")
    write_parquet(
        spark.read.parquet(SRC), dest, cluster_by=["o_orderdate"], n_files=4
    )
    write_file_stats(dest, ["o_orderdate"])
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 12, 31)
    sel, total = select_files(dest, "o_orderdate", lo, hi)
    assert total == 4 and len(sel) < total
    got = (
        skipping_scan(spark, dest, "o_orderdate", lo, hi)
        .filter("o_orderdate BETWEEN '1996-01-01' AND '1996-12-31'")
        .count()
    )
    want = (
        spark.read.parquet(SRC)
        .filter("o_orderdate BETWEEN '1996-01-01' AND '1996-12-31'")
        .count()
    )
    assert got == want > 0


def test_bloom_skipping_point_lookup(spark, clustered):
    """Bloom filters prune point lookups on a column the layout is NOT
    clustered by; a corrupt decoy whose bloom excludes the probe values
    is never opened."""
    from datafusion_dolomite_spark.sources.skipping import (
        STATS_NAME,
        select_files_eq,
        skipping_scan_eq,
        write_file_blooms,
    )

    doc = write_file_blooms(clustered, ["o_orderkey"])
    assert len(doc["blooms"]["files"]) == 4
    # min/max bands survive the bloom merge in the same sidecar
    with open(os.path.join(clustered, STATS_NAME)) as f:
        stats = json.load(f)
    assert stats["files"] and stats["blooms"]

    keys = [11, 777, 1402]
    decoy = os.path.join(clustered, "part-99998-deadbeef.parquet")
    with open(decoy, "wb") as f:
        f.write(b"NOT A PARQUET FILE")
    stats["blooms"]["files"]["part-99998-deadbeef.parquet"] = {
        "o_orderkey": "0"  # empty bitset: admits nothing
    }
    with open(os.path.join(clustered, STATS_NAME), "w") as f:
        json.dump(stats, f)
    try:
        sel, total = select_files_eq(clustered, "o_orderkey", keys)
        assert total == 5 and decoy not in sel
        # 3 keys live in <=3 of the 4 real files (false positives allowed
        # but at 8192 bits / ~375 keys per file they're ~never observed)
        assert len(sel) <= 3, sel
        pred = f"o_orderkey IN ({', '.join(map(str, keys))})"
        got = (
            skipping_scan_eq(spark, clustered, "o_orderkey", keys)
            .filter(pred)
            .collect()
        )
        want = spark.read.parquet(SRC).filter(pred).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        assert len(got) == 3
    finally:
        os.remove(decoy)


def test_unbounded_and_missing_sidecar_keep_everything(spark, clustered, tmp_path):
    from datafusion_dolomite_spark.sources.sinks import write_parquet
    from datafusion_dolomite_spark.sources.skipping import select_files

    sel, total = select_files(clustered, "o_custkey")
    assert len(sel) == total
    # no sidecar at all -> no skipping, full file list
    bare = str(tmp_path / "bare")
    write_parquet(spark.read.parquet(SRC), bare, n_files=3)
    sel, total = select_files(bare, "o_custkey", 0, 1)
    assert len(sel) == total == 3


def test_dynamic_skip_scan_prunes_by_join_key(spark, tmp_path):
    """Join-key runtime file skipping: a key-clustered fact with
    per-file Blooms + a 2-key dim must open a strict subset of files,
    and the pruned join must equal the unpruned one."""
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.sources.skipping import (
        dynamic_skip_scan,
        write_file_blooms,
    )

    dest = str(tmp_path / "fact")
    rows = [(i % 40, i) for i in range(4000)]
    (
        spark.createDataFrame(rows, "k bigint, v bigint")
        .repartition(8, F.col("k"))
        .write.mode("overwrite")
        .parquet(dest)
    )
    write_file_blooms(dest, ["k"])
    dim = spark.createDataFrame([(3,), (17,)], "dk bigint")
    fact, kept, total = dynamic_skip_scan(spark, dest, "k", dim, "dk")
    assert total == 8 and 0 < kept < total, (kept, total)
    got = sorted(
        tuple(r)
        for r in fact.join(dim, F.col("k") == F.col("dk"))
        .select("k", "v")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(dest)
        .filter(F.col("k").isin(3, 17))
        .select("k", "v")
        .collect()
    )
    assert got == want


def test_dynamic_skip_scan_key_cap_falls_back(spark, tmp_path):
    """Above max_keys the function must fall back to the FULL scan —
    pruning is a cost optimization, never load-bearing."""
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.sources.skipping import (
        dynamic_skip_scan,
        write_file_blooms,
    )

    dest = str(tmp_path / "fact2")
    (
        spark.createDataFrame([(i, i) for i in range(100)], "k bigint, v bigint")
        .repartition(4, F.col("k"))
        .write.mode("overwrite")
        .parquet(dest)
    )
    write_file_blooms(dest, ["k"])
    dim = spark.createDataFrame([(i,) for i in range(50)], "dk bigint")
    fact, kept, total = dynamic_skip_scan(
        spark, dest, "k", dim, "dk", max_keys=10
    )
    assert kept == total  # no pruning claimed
    assert fact.count() == 100
