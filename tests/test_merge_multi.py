"""Multi-clause MERGE INTO (r8): Delta's grammar — any number of
``WHEN MATCHED [AND cond] THEN UPDATE SET …|DELETE`` plus
``WHEN NOT MATCHED [AND cond] THEN INSERT *``, evaluated in statement
order (first applicable clause wins).  A matched row no clause covers
keeps its values; a source-only row no clause covers is not
inserted."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog


def test_ordered_clauses_first_wins(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh2"))
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300), (9, 900)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "s1"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched and a.v < 15 then delete "
        "when matched and a.v < 25 then update set v = b.v "
        "when not matched and b.v > 500 then insert *"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    # k=1: first clause (v<15) → delete.  k=2: second clause → v=200.
    # k=3: matched, NO clause applies → keeps 30.  k=9: 900>500 → insert.
    assert got == [(2, 200), (3, 30), (9, 900)]


def test_update_only_merge_drops_uncovered_source_rows(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh3"))
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.createDataFrame(
        [(2, 200), (7, 700)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "s1"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched then update set v = b.v"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    assert got == [(1, 10), (2, 200)]  # no INSERT arm → k=7 NOT inserted


def test_classic_single_pair_unchanged(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh4"))
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.createDataFrame(
        [(2, 200), (7, 700)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "s1"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched then update set v = b.v "
        "when not matched then insert *"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    assert got == [(1, 10), (2, 200), (7, 700)]


def test_macro_in_merge_clause_condition(spark, tmp_path):
    """CREATE FUNCTION macros expand inside WHEN … AND conditions —
    the clause front door is the engine's parser, not raw F.expr."""
    cat = Catalog(warehouse=str(tmp_path / "wh6"))
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.createDataFrame(
        [(1, 100), (2, 200)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "s1"))
    qp = QueryPlanner(spark, cat)
    qp.sql("create function small(x) as x < 15").count()
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched and small(a.v) then update set v = b.v"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    assert got == [(1, 100), (2, 20)]  # only v=10 < 15 updated


def test_disjunctive_on_disables_file_pruning(spark, tmp_path):
    """ADVICE r9 (medium): under a disjunctive ON, source-key-range file
    pruning is UNSOUND — a target file outside the k-band can still hold
    rows matched via the other disjunct.  The planner must fall back to
    the full-table join; previously the alt-matched row in the pruned
    file silently kept its old value."""
    cat = Catalog(warehouse=str(tmp_path / "wh7"))
    spark.createDataFrame(
        [(1, 100, 10), (2, 101, 20)], "k bigint, alt bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    cat.register("t", str(tmp_path / "t1"))
    qp = QueryPlanner(spark, cat)
    # second data file with k band [50, 51] — outside the source's k
    # range, so conjunction-era pruning would hardlink it forward
    qp.sql("insert into t values (50, 7, 30), (51, 8, 40)").count()
    spark.createDataFrame(
        [(1, 999, 1000), (2, 7, 2000)], "k bigint, alt bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("s", str(tmp_path / "s1"))
    qp.sql(
        "merge into t as a using s as b "
        "on a.k = b.k or a.alt = b.alt "
        "when matched then update set v = b.v"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    # k=50 (alt=7) matches source (k=2, alt=7) via the alt disjunct even
    # though its file's k band is outside the source k range [1, 2]
    assert got == [(1, 1000), (2, 2000), (50, 2000), (51, 40)]


def test_conjunctive_on_with_parens_still_prunes_correctly(spark, tmp_path):
    """A parenthesized top-level equality conjunct is still recognized
    for pruning, and results are correct (extra conjuncts only shrink
    the match set — pruning by the equality stays safe)."""
    cat = Catalog(warehouse=str(tmp_path / "wh8"))
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    cat.register("t", str(tmp_path / "t1"))
    qp = QueryPlanner(spark, cat)
    qp.sql("insert into t values (50, 30), (51, 40)").count()
    spark.createDataFrame(
        [(1, 100), (2, 200)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("s", str(tmp_path / "s1"))
    qp.sql(
        "merge into t as a using s as b "
        "on (a.k = b.k) and b.v > 150 "
        "when matched then update set v = b.v"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    assert got == [(1, 10), (2, 200), (50, 30), (51, 40)]


def test_when_matched_text_inside_string_literal(spark, tmp_path):
    """ADVICE r9 (low): a SET expression whose string literal contains
    'when matched then …' must not split the clause mid-literal — the
    WHEN/THEN scan is quote-aware."""
    cat = Catalog(warehouse=str(tmp_path / "wh9"))
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, note string"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.createDataFrame(
        [(2, "z"), (7, "q")], "k bigint, note string"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "s1"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched then update set note = 'when matched then x' "
        "when not matched then insert *"
    ).count()
    got = sorted(
        (r["k"], r["note"]) for r in qp.sql("select * from t").collect()
    )
    assert got == [(1, "a"), (2, "when matched then x"), (7, "q")]


def test_not_matched_by_source_update_and_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE (r9): target rows with no source
    match take the first applicable BY SOURCE clause — Delta's
    sync-deletion arm.  Matched rows and inserts behave exactly as
    before; an uncovered target-only row keeps its values."""
    cat = Catalog(warehouse=str(tmp_path / "wh10"))
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.createDataFrame(
        [(1, 100), (9, 900)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "s1"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched then update set v = b.v "
        "when not matched then insert * "
        "when not matched by source and a.v < 25 then delete "
        "when not matched by source and a.v < 35 then update set v = 0"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    # k=1 matched → 100; k=2 unmatched v<25 → deleted; k=3 unmatched
    # second clause → 0; k=4 unmatched, uncovered → keeps 40; k=9 insert
    assert got == [(1, 100), (3, 0), (4, 40), (9, 900)]


def test_not_matched_by_source_sync_delete(spark, tmp_path):
    """The canonical full-sync shape: source is the new truth — update
    matches, insert new rows, delete everything the source no longer
    carries."""
    cat = Catalog(warehouse=str(tmp_path / "wh11"))
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.createDataFrame(
        [(2, 200), (7, 700)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "s1"))
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched then update set v = b.v "
        "when not matched then insert * "
        "when not matched by source then delete"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    assert got == [(2, 200), (7, 700)]  # target == source now


def test_by_source_disables_file_pruning(spark, tmp_path):
    """A BY SOURCE clause must reach target files OUTSIDE the source
    key range — source-range pruning is disabled for the statement
    (the clause deletes an unmatched row in a file the band would have
    excluded)."""
    cat = Catalog(warehouse=str(tmp_path / "wh12"))
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "t1"))
    cat.register("t", str(tmp_path / "t1"))
    qp = QueryPlanner(spark, cat)
    qp.sql("insert into t values (50, 30), (51, 40)").count()  # 2nd file
    spark.createDataFrame(
        [(1, 100)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    cat.register("s", str(tmp_path / "s1"))
    qp.sql(
        "merge into t as a using s as b on a.k = b.k "
        "when matched then update set v = b.v "
        "when not matched by source and a.v = 30 then delete"
    ).count()
    got = sorted((r["k"], r["v"]) for r in qp.sql("select * from t").collect())
    # k=50 (v=30) sits in the file OUTSIDE the source k-range [1,1] —
    # still deleted; k=2/k=51 unmatched but uncovered → keep
    assert got == [(1, 100), (2, 20), (51, 40)]


def test_matched_by_source_rejected(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh13"))
    spark.createDataFrame([(1, 10)], "k bigint, v bigint").write.parquet(
        str(tmp_path / "t1")
    )
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "t1"))
    qp = QueryPlanner(spark, cat)
    with pytest.raises(Exception, match="BY SOURCE"):
        qp.sql(
            "merge into t as a using s as b on a.k = b.k "
            "when matched by source then delete"
        ).count()


def test_bad_clause_rejected(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh5"))
    spark.createDataFrame([(1, 10)], "k bigint, v bigint").write.parquet(
        str(tmp_path / "t1")
    )
    cat.register("t", str(tmp_path / "t1"))
    cat.register("s", str(tmp_path / "t1"))
    qp = QueryPlanner(spark, cat)
    with pytest.raises(Exception, match="INSERT \\*"):
        qp.sql(
            "merge into t as a using s as b on a.k = b.k "
            "when not matched then update set v = 1"
        ).count()
