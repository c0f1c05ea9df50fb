"""Source-data signatures for idempotent materializations.

Materialized derivatives of the testdata (hive-partitioned copies,
bucketed tables, streaming file sinks) must be invalidated when the
SOURCE changes, not merely when the destination is missing — a
``_SUCCESS`` marker alone keeps serving a stale copy after the source
parquet is regenerated in place, while the oracle reads the fresh data
(a persistent, confusing mismatch).  The streaming file sink solved
this with an mtime+size key; this module is that idea, shared, and
directory-aware: ``getmtime``/``getsize`` of a DIRECTORY don't change
when a contained part file is rewritten in place, so directory sources
fold the signature over the contained data files instead.
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["source_signature", "SIG_MARKER"]

#: marker file written next to a materialization recording the source
#: signature it was built from
SIG_MARKER = "_SRC_SIG"


def source_signature(path: str) -> str:
    """Short stable signature of a parquet source file or directory.

    Files: (basename, mtime, size).  Directories: the sorted fold of
    (relative path, mtime, size) over every non-hidden file inside —
    any rewrite, addition, or removal of a part file changes it.
    12 hex chars keeps directory names readable."""
    path = os.path.normpath(path)
    h = hashlib.md5()
    if os.path.isdir(path):
        for dirpath, dirnames, filenames in sorted(os.walk(path)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.startswith((".", "_")):
                    continue
                fp = os.path.join(dirpath, fn)
                st = os.stat(fp)
                rel = os.path.relpath(fp, path)
                h.update(f"{rel}|{st.st_mtime:.0f}|{st.st_size};".encode())
    else:
        st = os.stat(path)
        h.update(
            f"{os.path.basename(path)}|{st.st_mtime:.0f}|{st.st_size}".encode()
        )
    return h.hexdigest()[:12]


def read_marker(dest_dir: str) -> str | None:
    """The signature a materialization at ``dest_dir`` was built from,
    or None if never recorded."""
    p = os.path.join(dest_dir, SIG_MARKER)
    try:
        with open(p) as f:
            return f.read().strip() or None
    except OSError:
        return None


def write_marker(dest_dir: str, sig: str) -> None:
    os.makedirs(dest_dir, exist_ok=True)
    with open(os.path.join(dest_dir, SIG_MARKER), "w") as f:
        f.write(sig)
