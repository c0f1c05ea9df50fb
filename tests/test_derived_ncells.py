"""Stats-derived IVF/SemDeDup cell counts (VERDICT r6 item 7).

``derive_ncells`` targets ~64 vectors per cell (power of two, clamped
[4, 4096]) so the within-cell quadratic term of SemDeDup and the
per-probe work of IVF stay FLAT as the corpus grows — the scale property
the SemDeDup docstring promises ("k proportional to corpus size") but a
static ``ncells=8`` could not deliver.  Pinned here:

* the pure function itself (growth, clamps, power-of-two);
* two real sf dirs DERIVE DIFFERENT ncells (sf0.01 → 8, sf0.1 → 32),
  both from parquet-footer catalog stats, no data pass;
* the derived-cell IVF result at the NON-oracle sf still matches a
  DuckDB replay parameterized with the same derived count — the oracle
  is a function of the same stat, not a hardcoded 8.
"""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark.functions.similarity import derive_ncells

from .conftest import SF_DIR_ORACLE

SF_DIR_BIG = "/root/testdata/sf0.1"


def test_derive_ncells_pure_function():
    assert derive_ncells(0) == 8  # unknown → legacy default
    assert derive_ncells(None) == 8
    assert derive_ncells(10) == 4  # lower clamp
    assert derive_ncells(500) == 8
    assert derive_ncells(2000) == 32
    assert derive_ncells(64 * 1024) == 1024
    # r13: upper clamp lifted 4096 → 65536 (VERDICT r12 item 4) —
    # ~64 vectors/cell now holds to ~4M vectors
    assert derive_ncells(10**6) == 16384
    assert derive_ncells(10**9) == 65536  # upper clamp
    # power of two, monotone non-decreasing
    prev = 0
    for n in (1, 100, 1000, 10_000, 10**6, 10**8):
        c = derive_ncells(n)
        assert c & (c - 1) == 0
        assert c >= prev
        prev = c


def test_two_sf_dirs_derive_different_ncells():
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    n_small = derive_ncells(
        testdata_catalog(SF_DIR_ORACLE).statistics("embeddings").row_count
    )
    n_big = derive_ncells(
        testdata_catalog(SF_DIR_BIG).statistics("embeddings").row_count
    )
    assert n_small == 8  # what the static sf0.01 oracle bakes in
    assert n_big == 32
    assert n_small != n_big


def test_entry_oracle_ncells_matches_spark_side():
    """__spark_entry__'s static oracle and its Spark queries must agree
    on the sf0.01 cell count — both derive from the same stat."""
    import __spark_entry__ as entry
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    assert entry._oracle_ncells() == derive_ncells(
        testdata_catalog(SF_DIR_ORACLE).statistics("embeddings").row_count
    )


def test_ivf_derived_cells_matches_duckdb_at_big_sf(spark):
    """q_knn_ivf at sf0.1 (derived ncells=32) against a DuckDB replay
    parameterized with the SAME derived count — green oracle at a second
    sf choosing a different ncells (the VERDICT item's done-bar)."""
    import duckdb

    import __spark_entry__ as entry

    df = entry.queries()["q_knn_ivf"](spark, SF_DIR_BIG)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    )
    con = duckdb.connect()
    con.sql(
        "create view embeddings as select * from "
        f"read_parquet('{SF_DIR_BIG}/embeddings.parquet')"
    )
    sql = entry._knn_ivf_oracle(5, 10, 32, 3)
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want
