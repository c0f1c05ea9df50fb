"""Sinks: write a plan's result to parquet / orc / csv / json.

The reference has NO sinks at all (SURVEY §2.4 'no sinks'); this is
extension surface.  Scale defaults: parquet + snappy, optional
``partition_by`` (hive-style directory partitioning — the layout that
makes downstream partition pruning work), optional bucketing via
``bucket_by`` for co-located joins on re-read (requires ``table_name``
since Spark bucketing goes through the table catalog)."""

from __future__ import annotations

from typing import Optional, Sequence

__all__ = [
    "write_parquet",
    "write_csv",
    "write_json",
    "write_orc",
    "write_bucketed_table",
]


def write_bucketed_table(
    df,
    table_name: str,
    bucket_by: Sequence[str],
    n_buckets: int = 32,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (goes through the session catalog —
    Spark persists bucketing metadata only for tables, not raw paths).

    The 100 TB payoff: two tables bucketed on their join key with the
    same bucket count join WITHOUT any Exchange — each task reads the
    matching bucket from both sides.  For a fact table joined repeatedly
    on the same key, that amortizes the shuffle across every future
    query.  ``sort_by`` additionally pre-sorts each bucket so sort-merge
    joins skip their sort step."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(int(n_buckets), *bucket_by)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table_name)


def _writer(df, mode: str, partition_by: Optional[Sequence[str]]):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def write_parquet(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
    compression: str = "snappy",
    cluster_by: Optional[Sequence[str]] = None,
    n_files: Optional[int] = None,
) -> None:
    """Parquet sink with layout controls that matter at 100 TB:

    * ``cluster_by`` — range-repartition + sort-within-partitions on the
      given columns, so each file covers a narrow min/max band and
      later range-predicate scans skip whole files (row-group pruning).
    * ``n_files`` — compaction: coalesce/repartition to a target file
      count (the small-files problem kills listing + scheduling at
      scale; one file per ~128-512 MB is the usual target).
    """
    if cluster_by:
        if n_files:
            df = df.repartitionByRange(n_files, *cluster_by)
        else:
            df = df.repartitionByRange(*cluster_by)
        df = df.sortWithinPartitions(*cluster_by)
    elif n_files:
        df = df.repartition(n_files)
    _writer(df, mode, partition_by).option("compression", compression).parquet(path)


def write_orc(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
    compression: str = "zlib",
) -> None:
    _writer(df, mode, partition_by).option("compression", compression).orc(path)


def write_csv(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
    header: bool = True,
) -> None:
    _writer(df, mode, partition_by).option("header", str(header).lower()).csv(path)


def write_json(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
) -> None:
    _writer(df, mode, partition_by).json(path)
