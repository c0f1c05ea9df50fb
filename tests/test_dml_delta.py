"""Delta-sized DML (r8, VERDICT r7 items 2-4): INSERT INTO appends
O(delta) files, predicated UPDATE/DELETE/MERGE carry provably-untouched
files forward as hardlinks (footer min/max pruning, sources/dml.py),
and the version log persists so VERSION AS OF survives a new session.

Hardlink pins use inodes: a carried file shares st_ino with its
previous-version original (zero bytes copied); a rewritten file does
not."""

from __future__ import annotations

import os

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog
from datafusion_dolomite_spark.sources import dml


def _inodes(path):
    return {os.stat(f).st_ino for f in dml.data_files(path)}


def _carried(qp, table, before_inodes):
    """(carried, new) data-file counts of the table's current version
    vs a previous version's inode set."""
    files = dml.data_files(qp.catalog.path(table))
    carried = [f for f in files if os.stat(f).st_ino in before_inodes]
    return carried, [f for f in files if os.stat(f).st_ino not in before_inodes]


@pytest.fixture()
def qp(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, i * 10, "x") for i in range(10)],
        "k bigint, v bigint, tag string",
    ).coalesce(1).write.parquet(str(tmp_path / "t0"))
    cat.register("t", str(tmp_path / "t0"))
    return QueryPlanner(spark, cat)


@pytest.fixture()
def clustered(spark, tmp_path):
    """A 100-row table k=0..99 laid out as 4 files, each covering one
    disjoint k band of 25 — the clustered layout file pruning needs."""
    path = str(tmp_path / "clustered")
    for b in range(4):
        spark.createDataFrame(
            [(i, i * 2) for i in range(b * 25, b * 25 + 25)],
            "k bigint, v bigint",
        ).coalesce(1).write.mode("append").parquet(path)
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    cat.register("c", path)
    return QueryPlanner(spark, cat), path


def test_insert_appends_only_delta_files(qp, spark):
    """VERDICT item 2 pin: inserting N rows into a T-row table writes
    O(N) rows of NEW files; every pre-existing file is carried forward
    as a hardlink (zero data bytes copied), and time travel still reads
    the original exactly."""
    before = _inodes(qp.catalog.path("t"))
    out = qp.sql(
        "insert into t select cast(k + 100 as bigint) as k, v, tag "
        "from t where k < 3"
    )
    assert out.count() == 13
    carried, new = _carried(qp, "t", before)
    # all original files carried via hardlink, not rewritten
    assert len(carried) == len(before)
    assert all(os.stat(f).st_nlink >= 2 for f in carried)
    # the new files hold exactly the 3 inserted rows — O(delta)
    assert spark.read.parquet(*new).count() == 3
    assert qp.sql("select * from t version as of 0").count() == 10


def test_delete_prunes_nonoverlapping_files(clustered, spark):
    """VERDICT item 3 pin: a selective DELETE on clustered data rewrites
    ONLY the files whose [min,max] band overlaps the predicate — here
    k >= 75 touches 1 of 4 band files; the other 3 carry as links."""
    qp, path = clustered
    before = _inodes(path)
    out = qp.sql("delete from c where k >= 75")
    assert out.count() == 75
    carried, new = _carried(qp, "c", before)
    assert len(carried) == 3
    assert spark.read.parquet(*new).count() == 0 if new else True
    # the pruned result is exactly the surviving rows
    assert sorted(r["k"] for r in out.collect()) == list(range(75))


def test_update_prunes_nonoverlapping_files(clustered, spark):
    qp, path = clustered
    before = _inodes(path)
    out = qp.sql("update c set v = 0 where k < 25")
    carried, new = _carried(qp, "c", before)
    assert len(carried) == 3  # only the [0,24] file rewritten
    got = {r["k"]: r["v"] for r in out.collect()}
    assert all(got[k] == 0 for k in range(25))
    assert all(got[k] == k * 2 for k in range(25, 100))


def test_unprovable_predicate_falls_back_to_full_rewrite(clustered):
    """A predicate pruning can't model (expression on the left) must
    fall back to the r7 full rewrite — correctness never depends on
    skipping."""
    qp, path = clustered
    before = _inodes(path)
    out = qp.sql("delete from c where k + 0 >= 75")
    assert out.count() == 75
    carried, _ = _carried(qp, "c", before)
    assert carried == []  # nothing provable → everything rewritten


def test_merge_prunes_target_files_outside_source_key_range(
    clustered, spark, tmp_path
):
    """MERGE pruning: target files whose key band cannot intersect the
    source's [min,max] key range carry forward untouched."""
    qp, path = clustered
    spark.createDataFrame(
        [(k, 999) for k in range(80, 90)], "k bigint, v bigint"
    ).write.parquet(str(tmp_path / "src"))
    qp.catalog.register("s", str(tmp_path / "src"))
    before = _inodes(path)
    out = qp.sql(
        "merge into c as t using s as s on t.k = s.k "
        "when matched then update set v = s.v "
        "when not matched then insert *"
    )
    carried, _ = _carried(qp, "c", before)
    assert len(carried) == 3  # bands [0,24] [25,49] [50,74] untouched
    got = {r["k"]: r["v"] for r in out.collect()}
    assert len(got) == 100
    assert all(got[k] == 999 for k in range(80, 90))
    assert got[0] == 0 and got[75] == 150


def test_version_as_of_survives_new_session(spark, tmp_path):
    """VERDICT item 4 pin: versions created in one planner are readable
    from a NEW planner over a NEW catalog (same warehouse + same base
    registration) — the persisted version log is the lineage."""
    wh = str(tmp_path / "wh")
    base = str(tmp_path / "t0")
    spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "k bigint, v bigint"
    ).coalesce(1).write.parquet(base)

    cat1 = Catalog(warehouse=wh)
    cat1.register("t", base)
    qp1 = QueryPlanner(spark, cat1)
    qp1.sql("delete from t where k >= 7").count()   # v1: 7 rows
    qp1.sql("update t set v = 0 where k = 0").count()  # v2

    cat2 = Catalog(warehouse=wh)
    cat2.register("t", base)  # a session registers the BASE table
    qp2 = QueryPlanner(spark, cat2)
    # current registration follows the log head (v2)
    assert cat2.path("t") == qp1.catalog.path("t")
    assert qp2.sql("select * from t version as of 0").count() == 10
    assert qp2.sql("select * from t version as of 1").count() == 7
    v2 = {r["k"]: r["v"] for r in qp2.sql(
        "select * from t version as of 2"
    ).collect()}
    assert v2[0] == 0 and v2[1] == 10
    # and the lineage continues: one more DML appends version 3
    qp2.sql("delete from t where k = 1").count()
    assert qp2.sql("select * from t version as of 3").count() == 6
    assert qp2.sql("select * from t version as of 1").count() == 7


def test_stale_log_resets_lineage(spark, tmp_path):
    """Re-registering a table at NEW data kills the old lineage: the
    first DML starts versioning from the new base instead of serving
    another table's history."""
    wh = str(tmp_path / "wh")
    base = str(tmp_path / "t0")
    spark.createDataFrame([(1,)], "k bigint").write.parquet(base)
    cat1 = Catalog(warehouse=wh)
    cat1.register("t", base)
    qp1 = QueryPlanner(spark, cat1)
    qp1.sql("delete from t where k = 1").count()

    base2 = str(tmp_path / "t0b")
    spark.createDataFrame([(7,), (8,)], "k bigint").write.parquet(base2)
    cat2 = Catalog(warehouse=wh)
    cat2.register("t", base2)  # DIFFERENT base — old log must not apply
    qp2 = QueryPlanner(spark, cat2)
    assert cat2.path("t") == base2
    with pytest.raises(Exception):
        qp2.sql("select * from t version as of 0").count()
    qp2.sql("delete from t where k = 7").count()
    assert qp2.sql("select * from t version as of 0").count() == 2
    assert qp2.sql("select * from t version as of 1").count() == 1


def test_macro_expands_inside_dml(qp):
    """ADVICE r7: CREATE FUNCTION macros must expand inside DML
    statements (expansion now runs before the DML matchers)."""
    qp.sql("create function big(x) as x >= 7").count()
    out = qp.sql("delete from t where big(k)")
    assert out.count() == 7


def test_macro_substitution_is_hygienic(qp):
    """ADVICE r7: single-pass parameter substitution — an argument that
    IS a later parameter's name must not be re-substituted, and a
    backslash in a string-literal argument must not raise re.error."""
    qp.sql("create function addup(a, b) as a + b").count()
    rows = qp.sql(
        "select addup(b, 2) as s from (select v as b from t where k = 1) q"
    ).collect()
    assert rows[0]["s"] == 12  # the bug expanded to (2) + (2) = 4
    qp.sql("create function ident(x) as x").count()
    rows = qp.sql(
        "select ident('a\\d') as s from t where k = 0"
    ).collect()
    assert rows[0]["s"] == "a\\d"


def test_merge_into_csv_registered_target(spark, tmp_path):
    """ADVICE r7: MERGE INTO a csv-registered table must use the
    format-aware scan's schema, not re-read the files as parquet."""
    import csv

    tdir = tmp_path / "tcsv"
    tdir.mkdir()
    with open(tdir / "data.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["k", "v"])
        for i in range(5):
            w.writerow([i, i * 10])
    spark.createDataFrame([(1, 111), (9, 999)], "k bigint, v bigint").write.parquet(
        str(tmp_path / "scsv")
    )
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    cat.register("t", str(tdir), format="csv")
    cat.register("s", str(tmp_path / "scsv"))
    qp = QueryPlanner(spark, cat)
    out = qp.sql(
        "merge into t as t using s as s on t.k = s.k "
        "when matched then update set v = s.v "
        "when not matched then insert *"
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {0: 0, 1: 111, 2: 20, 3: 30, 4: 40, 9: 999}


def test_optimize_table_compacts_files(qp, spark):
    """OPTIMIZE TABLE (r8): a lineage of small inserts fragments the
    table; compaction rewrites the current rows into few files as a NEW
    version — rows identical, pre-compaction versions still readable."""
    for i in range(3):
        qp.sql(
            f"insert into t select cast(k + {100 * (i + 1)} as bigint) as k, "
            "v, tag from t where k < 2"
        ).count()
    frag = len(dml.data_files(qp.catalog.path("t")))
    before_rows = sorted(
        r["k"] for r in spark.read.parquet(qp.catalog.path("t")).collect()
    )
    out = qp.sql("optimize table t").collect()[0]
    assert out["files_before"] == frag and out["files_after"] < frag
    after_rows = sorted(
        r["k"] for r in spark.read.parquet(qp.catalog.path("t")).collect()
    )
    assert after_rows == before_rows
    assert qp.sql("select * from t version as of 0").count() == 10


def test_timestamp_as_of(qp, spark):
    """TIMESTAMP AS OF (r8): the latest version committed at or before
    the instant; before-earliest errors; DESCRIBE HISTORY carries the
    commit timestamp; the resolution survives a new planner via the
    persisted log.  Commit instants are injected synthetically into
    ``_table_commit_ts`` (which resolution prefers over mtimes) so the
    assertions hold at any machine speed — no sleeps racing DML latency."""
    import datetime as dt
    import time

    qp.sql("delete from t where k < 3").count()  # v1
    qp.sql("delete from t where k >= 8").count()  # v2
    base = time.time()
    qp._table_commit_ts["t"] = [base - 30.0, base - 20.0, base - 10.0]
    qp._persist_versions("t")
    mid = dt.datetime.fromtimestamp(base - 15.0, dt.timezone.utc).isoformat()
    assert (
        qp.sql(f"select * from t timestamp as of '{mid}'").count() == 7
    )  # v1: rows 3..9
    # at/after the last commit → head
    now = dt.datetime.fromtimestamp(base, dt.timezone.utc).isoformat()
    assert qp.sql(f"select * from t timestamp as of '{now}'").count() == 5
    with pytest.raises(Exception, match="no version at or before"):
        qp.sql("select * from t timestamp as of '2000-01-01'").count()
    hist = qp.sql("describe history t").collect()
    assert all(r["commit_ts"] for r in hist)
    # persisted: a fresh planner resolves the same instant to v1
    cat2 = Catalog(warehouse=qp.catalog.warehouse_root())
    cat2.register("t", qp._table_history["t"][0])
    qp2 = QueryPlanner(spark, cat2)
    assert (
        qp2.sql(f"select * from t timestamp as of '{mid}'").count() == 7
    )


def test_vacuum_retain_keeps_window(qp, spark):
    """VACUUM … RETAIN n HOURS: versions committed inside the window
    survive (time travel to them keeps working, lineage re-based);
    only older warehouse version dirs are removed.  The window check is
    asserted against synthetic commit timestamps (vacuum prefers
    ``_table_commit_ts`` over mtimes) so it cannot race real DML latency
    on a slow machine."""
    import time

    qp.sql("delete from t where k = 0").count()  # v1 (old)
    qp.sql("delete from t where k = 1").count()  # v2 (recent)
    qp.sql("delete from t where k = 2").count()  # v3 (recent, head)
    now = time.time()
    # v0/v1 two hours old, v2/v3 seconds old; retain 1 hour
    qp._table_commit_ts["t"] = [now - 7200.0, now - 7200.0, now - 10.0, now - 5.0]
    out = qp.sql("vacuum t retain 1 hours").collect()[0]
    assert out["versions_removed"] == 1  # v1 (v0 base is never removed)
    # retained window still time-travels (re-based indices: 0 = old v2)
    assert qp.sql("select * from t version as of 0").count() == 8
    assert qp.sql("select * from t").count() == 7
    # a huge window removes nothing
    out2 = qp.sql("vacuum t retain 1000 hours dry run").collect()[0]
    assert out2["versions_removed"] == 0


def test_describe_detail(qp):
    """DESCRIBE DETAIL (r8): one row of table metadata from local
    file/state inspection — files, bytes, versions, properties,
    constraints, DV presence — no table scan."""
    import json

    qp.sql(
        "alter table t set tblproperties ('delete_mode'='merge-on-read')"
    ).count()
    qp.sql("delete from t where k = 1").count()
    d = qp.sql("describe detail t").collect()[0]
    assert d["table_name"] == "t" and d["format"] == "parquet"
    assert d["num_files"] == 1 and d["size_bytes"] > 0
    assert d["num_versions"] == 2 and d["has_dv"]
    assert json.loads(d["properties"])["delete_mode"] == "merge-on-read"


def test_vacuum_dry_run_and_restore_to_timestamp(qp, spark):
    """VACUUM DRY RUN reports removable dirs/bytes without touching
    anything; RESTORE … TO TIMESTAMP AS OF resolves like the read form;
    post-vacuum TIMESTAMP AS OF still resolves the surviving head."""
    import datetime as dt
    import time

    qp.sql("delete from t where k < 3").count()  # v1
    qp.sql("delete from t where k >= 8").count()  # v2
    base = time.time()
    qp._table_commit_ts["t"] = [base - 30.0, base - 20.0, base - 10.0]
    mid = dt.datetime.fromtimestamp(base - 15.0, dt.timezone.utc).isoformat()
    qp.sql(f"restore table t to timestamp as of '{mid}'").count()  # → v1
    assert qp.sql("select * from t").count() == 7
    dry = qp.sql("vacuum t dry run").collect()[0]
    assert dry["versions_removed"] >= 1
    # nothing was actually removed: time travel still works
    assert qp.sql("select * from t version as of 2").count() == 5
    real = qp.sql("vacuum t").collect()[0]
    assert real["versions_removed"] == dry["versions_removed"]
    # post-vacuum: head still resolves by timestamp (list re-seeded)
    now = dt.datetime.now(dt.timezone.utc).isoformat()
    assert qp.sql(f"select * from t timestamp as of '{now}'").count() == 7


def test_optimize_where_compacts_only_matching_files(clustered, spark):
    """OPTIMIZE … WHERE (r8): only files whose bands can satisfy the
    predicate compact; the rest carry forward as hardlinks — the
    compact-one-partition shape.  The WHERE picks files, never rows."""
    qp, path = clustered
    # fragment the k<25 band with two small inserts
    qp.sql("insert into c values (1, 2), (2, 4)").count()
    qp.sql("insert into c values (3, 6)").count()
    before = {os.stat(f).st_ino for f in dml.data_files(qp.catalog.path("c"))}
    rows_before = sorted(
        (r["k"], r["v"]) for r in qp.sql("select * from c").collect()
    )
    out = qp.sql("optimize table c where k < 25").collect()[0]
    head = qp.catalog.path("c")
    after_files = dml.data_files(head)
    carried = [f for f in after_files if os.stat(f).st_ino in before]
    # the three k>=25 band files carried untouched; the fragmented
    # band (original file + 2 insert files) compacted
    assert len(carried) == 3
    assert out["files_before"] == 6 and out["files_after"] < 6
    rows_after = sorted(
        (r["k"], r["v"]) for r in qp.sql("select * from c").collect()
    )
    assert rows_after == rows_before  # no row dropped
    with pytest.raises(Exception, match="no provable"):
        qp.sql("optimize table c where k % 3 = 0").count()


def test_auto_compact_opt_in(qp, spark):
    """auto_compact_files=N (r8, Delta's autoOptimize.autoCompact):
    a DML statement leaving MORE than N data files triggers an
    immediate op-tagged OPTIMIZE — a stream of small inserts pays one
    compaction per ~N files, never one per statement."""
    qp.sql(
        "alter table t set tblproperties ('auto_compact_files'='4')"
    ).count()
    for i in range(5):
        qp.sql(
            f"insert into t select cast(k + {100 * (i + 1)} as bigint) "
            "as k, v, tag from t where k < 2"
        ).count()
    # never more than limit+1 files survive a statement (the append
    # that crosses the limit compacts right after)
    n = len(dml.data_files(qp.catalog.path("t")))
    assert n <= 5, f"expected compacted head, found {n} files"
    ops = [r["operation"] for r in qp.sql("describe history t").collect()]
    assert "auto-compact" in ops
    # values exact through the compactions; fragmented versions remain
    got = sorted(r["k"] for r in qp.sql("select k from t").collect())
    want = sorted(
        list(range(10)) + [100 * (i + 1) + k for i in range(5) for k in (0, 1)]
    )
    assert got == want
    assert qp.sql("select * from t version as of 0").count() == 10


def test_auto_compact_off_by_default(qp):
    """Without the property, small inserts fragment freely — compaction
    is the user's O(table) call to schedule."""
    for i in range(5):
        qp.sql(
            f"insert into t select cast(k + {100 * (i + 1)} as bigint) "
            "as k, v, tag from t where k < 2"
        ).count()
    assert len(dml.data_files(qp.catalog.path("t"))) >= 6
    ops = [r["operation"] for r in qp.sql("describe history t").collect()]
    assert "auto-compact" not in ops


def test_vacuum_frees_old_versions_keeps_head(qp, spark):
    """VACUUM (r8): non-head version dirs are removed; the head still
    reads exactly (hardlinked files survive via their head-dir name),
    old VERSION AS OF reads are gone, numbering continues."""
    import os

    base = qp.catalog.path("t")
    qp.sql("delete from t where k >= 7").count()         # v1
    qp.sql(
        "insert into t select cast(50 as bigint) as k, "
        "cast(0 as bigint) as v, 'n' as tag from t where k = 0"
    ).count()                                             # v2
    v1_dir = qp._table_history["t"][1]
    head = qp.catalog.path("t")
    head_rows = sorted(r["k"] for r in spark.read.parquet(head).collect())
    out = qp.sql("vacuum t").collect()[0]
    assert out["versions_removed"] == 1  # v1; base is never touched
    assert not os.path.exists(v1_dir)
    assert os.path.exists(base)  # user's original registration survives
    # the head reads exactly — carried hardlinks kept the data alive
    assert sorted(
        r["k"] for r in spark.read.parquet(head).collect()
    ) == head_rows == [0, 1, 2, 3, 4, 5, 6, 50]
    with pytest.raises(Exception):
        qp.sql("select * from t version as of 2").count()
    assert qp.sql("select * from t version as of 0").count() == 8  # = head
    # lineage continues: next DML becomes version 1 of the new history
    qp.sql("delete from t where k = 50").count()
    assert qp.sql("select * from t version as of 1").count() == 7


@pytest.fixture()
def partitioned(spark, tmp_path):
    """A hive-partitioned table: p in {0,1,2,3}, 25 rows each."""
    path = str(tmp_path / "part")
    spark.createDataFrame(
        [(i, i % 4, i * 2) for i in range(100)],
        "k bigint, p bigint, v bigint",
    ).repartition("p").write.partitionBy("p").parquet(path)
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    cat.register("pt", path)
    return QueryPlanner(spark, cat), path


def test_partitioned_delete_prunes_and_preserves_layout(partitioned, spark):
    """DML on a hive-partitioned table (r8): a predicate on the
    partition column prunes via the key=value path (partition values
    never reach footers), untouched partitions carry forward AT their
    relative paths, and the rewritten output keeps the partitionBy
    layout — so partition values survive the carry."""
    qp, path = partitioned
    before = _inodes(path)
    out = qp.sql("delete from pt where p = 3")
    carried, _ = _carried(qp, "pt", before)
    assert len(carried) >= 3  # p=0,1,2 files untouched
    cur = qp.catalog.path("pt")
    # layout preserved: carried files still sit under p=<val> dirs
    assert all("p=" in f.replace(cur, "") for f in carried)
    got = {r["k"]: (r["p"], r["v"]) for r in out.collect()}
    assert len(got) == 75 and all(p != 3 for p, _ in got.values())
    # partition values correct after the carry (the r8 bug this pins:
    # flat links would have dropped/nulled the partition column)
    assert all(got[k] == (k % 4, k * 2) for k in got)


def test_partitioned_insert_and_update(partitioned, spark):
    qp, path = partitioned
    # positional VALUES follow the table schema, which for a hive
    # table lists partition columns LAST (Spark's own convention):
    # (k, v, p).  The explicit column list is order-free.
    out = qp.sql("insert into pt (k, p, v) values (1000, 2, 0)")
    got = {r["k"]: (r["p"], r["v"]) for r in out.collect()}
    assert got[1000] == (2, 0) and len(got) == 101
    out = qp.sql("update pt set v = -1 where p = 0")
    got = {r["k"]: (r["p"], r["v"]) for r in out.collect()}
    assert all(v == -1 for k, (p, v) in got.items() if p == 0)
    assert got[1] == (1, 2)  # other partitions untouched
    # and the current version is still a valid partitioned dir
    re_read = spark.read.parquet(qp.catalog.path("pt"))
    assert "p" in re_read.columns and re_read.count() == 101


def test_file_excluded_is_sound_property():
    """Property pin for the pruning proof: `file_excluded` may only
    return True when NO value in the file's band satisfies the
    predicate.  Brute-forced over randomized bands, ops and literals
    (ints, floats, strings, dates) — soundness is what keeps pruned
    DML rewrites exactly equal to full rewrites."""
    import datetime
    import random

    from datafusion_dolomite_spark.sources.dml import file_excluded

    rng = random.Random(99)
    ops = ["=", "<", "<=", ">", ">="]

    def sat(v, op, lit):
        return {
            "=": v == lit, "<": v < lit, "<=": v <= lit,
            ">": v > lit, ">=": v >= lit,
        }[op]

    def domain(kind):
        if kind == "int":
            return [rng.randint(-5, 15) for _ in range(6)]
        if kind == "float":
            return [round(rng.uniform(-3, 3), 2) for _ in range(6)]
        if kind == "str":
            return [rng.choice("abcdef") * rng.randint(1, 3) for _ in range(6)]
        return [
            datetime.date(2020, 1, 1) + datetime.timedelta(days=rng.randint(0, 400))
            for _ in range(6)
        ]

    checked = excluded = 0
    for _ in range(2000):
        kind = rng.choice(["int", "float", "str", "date"])
        values = domain(kind)
        band = (min(values), max(values))
        op = rng.choice(ops)
        lit = rng.choice(domain(kind))
        if kind == "date":
            lit = lit.isoformat()  # SQL literals arrive as strings
            lit_cmp = datetime.date.fromisoformat(lit)
        else:
            lit_cmp = lit
        conj = [("c", op, lit)]
        if file_excluded({"c": band}, conj):
            excluded += 1
            assert not any(sat(v, op, lit_cmp) for v in values), (
                kind, band, op, lit, values,
            )
        checked += 1
    # the proof must actually fire sometimes, or the test is vacuous
    assert excluded > 100, excluded
    # and unknown bands/columns never exclude
    assert not file_excluded({"c": None}, [("c", "=", 1)])
    assert not file_excluded({}, [("c", "=", 1)])
    assert not file_excluded({"c": (0, 10)}, [("c", "=", "x")])  # type mix


def test_optimize_zorder_clusters_and_prunes(spark, tmp_path):
    """OPTIMIZE TABLE ... ZORDER BY (r8): after z-ordering on (x, y),
    each file covers a narrow band of BOTH columns (vs the shuffled
    input where every file spans the full range), the skipping sidecar
    is rewritten, and a subsequent predicated DELETE on either column
    prunes files."""
    import random

    from datafusion_dolomite_spark.sources import dml
    from datafusion_dolomite_spark.sources.skipping import _load_stats

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 999), rng.randint(0, 999)) for i in range(4000)]
    path = str(tmp_path / "zt")
    spark.createDataFrame(rows, "k bigint, x bigint, y bigint").repartition(
        8
    ).write.parquet(path)
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    cat.register("zt", path)
    qp = QueryPlanner(spark, cat)

    before = {r["k"] for r in spark.read.parquet(path).collect()}
    # at test scale AQE coalesces the whole table into ONE file
    # (correct, but then there is nothing to band-check) — pin the file
    # count through the n_files control the SQL path leaves adaptive
    base_bands = dml.file_bands(dml.data_files(path), {"x", "y"})
    base_mean = sum(
        b[c][1] - b[c][0] for b in base_bands.values() for c in ("x", "y")
    ) / (2 * len(base_bands))
    qp._optimize_table("zt", zorder="x, y", n_files=16).count()
    cur = qp.catalog.path("zt")
    files = dml.data_files(cur)
    assert len(files) > 4
    bands = dml.file_bands(files, {"x", "y"})
    # z-ordering must shrink the MEAN per-file band on both clustered
    # columns well below the unclustered layout's (~full-domain) bands.
    # (A per-file bound would be wrong: a z-slice crossing a quad-cell
    # boundary legitimately spans one dimension.)
    z_mean = sum(
        bands[f][c][1] - bands[f][c][0] for f in files for c in ("x", "y")
    ) / (2 * len(files))
    assert z_mean < 0.6 * base_mean, (z_mean, base_mean)
    # sidecar written for the zorder columns
    st = _load_stats(cur)
    assert st is not None and set(st["columns"]) == {"x", "y"}
    # rows identical
    assert {r["k"] for r in spark.read.parquet(cur).collect()} == before
    # and a selective DELETE on x now prunes files
    inodes = {__import__("os").stat(f).st_ino for f in files}
    qp.sql("delete from zt where x >= 900").count()
    import os as _os

    kept = [
        f
        for f in dml.data_files(qp.catalog.path("zt"))
        if _os.stat(f).st_ino in inodes
    ]
    assert kept, "z-ordered layout should let the DELETE carry files"


def test_macro_predicate_still_prunes(clustered):
    """A CREATE FUNCTION macro in a DELETE predicate expands inside the
    pruner too — the file-skipping proof sees the underlying
    col-op-literal conjunct."""
    qp, path = clustered
    qp.sql("create function hot(x) as x >= 75").count()
    before = _inodes(path)
    out = qp.sql("delete from c where hot(k)")
    assert out.count() == 75
    carried, _ = _carried(qp, "c", before)
    assert len(carried) == 3


def test_concurrent_writer_detected(spark, tmp_path):
    """Optimistic concurrency (r8): two planners sharing one lineage —
    the second writer's OVERLAPPING DML fails with ConcurrentWriteError
    instead of silently overwriting the first one's version dir.  (The
    single-file table makes any two predicates overlap, so r9's
    retry-with-rebase correctly refuses and the original abort
    semantics hold.)"""
    from datafusion_dolomite_spark.sources.dml import ConcurrentWriteError

    wh = str(tmp_path / "wh")
    base = str(tmp_path / "t0")
    spark.createDataFrame(
        [(i,) for i in range(10)], "k bigint"
    ).write.parquet(base)
    cat_a = Catalog(warehouse=wh)
    cat_a.register("t", base)
    qp_a = QueryPlanner(spark, cat_a)
    qp_a.sql("delete from t where k = 0").count()  # v1, creates lineage

    cat_b = Catalog(warehouse=wh)
    cat_b.register("t", base)
    qp_b = QueryPlanner(spark, cat_b)  # loads the lineage at head v1
    qp_a.sql("delete from t where k = 1").count()  # A advances to v2
    with pytest.raises(ConcurrentWriteError):
        qp_b.sql("delete from t where k = 2")
    # A's lineage intact, B never wrote
    assert qp_a.sql("select * from t version as of 2").count() == 8
    hist = [r["version"] for r in qp_a.sql("describe history t").collect()]
    assert hist == [0, 1, 2]


def test_concurrent_disjoint_deletes_rebase(spark, tmp_path):
    """Retry-with-rebase (r9, VERDICT item 5): two planners commit
    DELETEs whose file sets are provably disjoint (footer-band proof on
    the loser's snapshot vs the winner's inode-diffed rewrites) — the
    loser adopts the winner's lineage suffix and re-executes; BOTH land
    with a linear history."""
    wh = str(tmp_path / "wh")
    base = str(tmp_path / "t0")
    # two data files with disjoint k bands: [0..49] and [100..149]
    spark.createDataFrame(
        [(i,) for i in range(50)], "k bigint"
    ).coalesce(1).write.parquet(base)
    spark.createDataFrame(
        [(i,) for i in range(100, 150)], "k bigint"
    ).coalesce(1).write.mode("append").parquet(base)
    cat_a = Catalog(warehouse=wh)
    cat_a.register("t", base)
    qp_a = QueryPlanner(spark, cat_a)
    qp_a.sql("delete from t where k = 0").count()  # v1 (low file)

    cat_b = Catalog(warehouse=wh)
    cat_b.register("t", base)
    qp_b = QueryPlanner(spark, cat_b)  # lineage at head v1
    qp_a.sql("delete from t where k = 1").count()  # A → v2 (low file)
    # B's DELETE touches only the HIGH file — disjoint from A's v2
    assert qp_b.sql("delete from t where k = 100").count() == 97
    hist = [r["version"] for r in qp_b.sql("describe history t").collect()]
    assert hist == [0, 1, 2, 3]  # linear: base, A, A, B
    ks = {r["k"] for r in qp_b.sql("select * from t").collect()}
    assert {0, 1, 100}.isdisjoint(ks) and {2, 49, 101, 149} <= ks


def test_concurrent_insert_rebases_over_delete(spark, tmp_path):
    """An INSERT is append-only — it rebases over ANY foreign commit
    (nothing it touches can have been removed); the inserted rows and
    the foreign delete both survive."""
    wh = str(tmp_path / "wh")
    base = str(tmp_path / "t0")
    spark.createDataFrame(
        [(i,) for i in range(10)], "k bigint"
    ).coalesce(1).write.parquet(base)
    cat_a = Catalog(warehouse=wh)
    cat_a.register("t", base)
    qp_a = QueryPlanner(spark, cat_a)
    qp_a.sql("delete from t where k = 0").count()  # v1

    cat_b = Catalog(warehouse=wh)
    cat_b.register("t", base)
    qp_b = QueryPlanner(spark, cat_b)
    qp_a.sql("delete from t where k = 1").count()  # A → v2
    qp_b.sql("insert into t values (777)").count()  # rebases → v3
    ks = sorted(r["k"] for r in qp_b.sql("select * from t").collect())
    assert ks == [2, 3, 4, 5, 6, 7, 8, 9, 777]
    hist = [r["version"] for r in qp_b.sql("describe history t").collect()]
    assert hist == [0, 1, 2, 3]


def test_vacuum_racing_reader_deterministic_error(spark, tmp_path):
    """VACUUM vs a concurrent reader (r9, VERDICT item 6): a reader
    whose lineage still lists a version that another planner's VACUUM
    removed gets a deterministic VersionVacuumedError naming the
    RETAIN retention lever — not an undefined filesystem error.  The
    head (and any surviving version) keeps reading."""
    from datafusion_dolomite_spark.sources.dml import VersionVacuumedError

    wh = str(tmp_path / "wh")
    base = str(tmp_path / "t0")
    spark.createDataFrame(
        [(i,) for i in range(10)], "k bigint"
    ).coalesce(1).write.parquet(base)
    cat_a = Catalog(warehouse=wh)
    cat_a.register("t", base)
    qp_a = QueryPlanner(spark, cat_a)
    qp_a.sql("delete from t where k = 0").count()  # v1
    qp_a.sql("delete from t where k = 1").count()  # v2 (head)

    # reader planner resolves v1 fine before the vacuum
    cat_r = Catalog(warehouse=wh)
    cat_r.register("t", base)
    qp_r = QueryPlanner(spark, cat_r)
    assert qp_r.sql("select * from t version as of 1").count() == 9

    qp_a.sql("vacuum t").count()  # removes v1's dir (head survives)
    with pytest.raises(VersionVacuumedError, match="RETAIN n HOURS"):
        qp_r.sql("select * from t version as of 1").count()
    # the head still reads through the stale-lineage planner
    assert qp_r.sql("select * from t version as of 2").count() == 8


def test_explain_dml_reports_pruning(clustered):
    """EXPLAIN DELETE/UPDATE (r8): the pruning verdict without
    executing — and the table is untouched afterwards."""
    qp, path = clustered
    before = _inodes(path)
    row = qp.sql("explain delete from c where k >= 75").collect()[0]
    assert (row["mode"], row["data_files"], row["files_carried"],
            row["files_rewritten"]) == ("pruned rewrite", 4, 3, 1)
    row = qp.sql("explain update c set v = 0 where k < 25").collect()[0]
    assert (row["mode"], row["files_carried"]) == ("pruned rewrite", 3)
    row = qp.sql("explain update c set v = 0 where k + 0 < 10").collect()[0]
    assert row["mode"] == "full rewrite" and row["files_carried"] == 0
    assert _inodes(path) == before  # nothing executed
    assert qp.catalog.path("c") == path  # no new version


def test_insert_schema_evolution_auto(qp, spark, tmp_path):
    """r9: with schema_evolution='auto', an INSERT listing a column the
    table doesn't have ADDS it (Delta's mergeSchema): old files
    null-fill on read, the delta file materializes it, the evolved
    schema survives a fresh planner via the persisted log.  Without
    the property the statement still errors."""
    with pytest.raises(Exception, match="unknown column"):
        qp.sql(
            "insert into t (k, v, tag, note) values "
            "(100, 1000, 'n', 'hello')"
        ).count()
    qp.sql(
        "alter table t set tblproperties ('schema_evolution'='auto')"
    ).count()
    qp.sql(
        "insert into t (k, v, tag, note) values (100, 1000, 'n', 'hello')"
    ).count()
    rows = {r["k"]: r["note"] for r in qp.sql("select * from t").collect()}
    assert rows[100] == "hello"
    assert rows[0] is None  # pre-evolution rows null-fill
    cols = [r["col_name"] for r in qp.sql("describe t").collect()]
    assert cols == ["k", "v", "tag", "note"]
    # evolution + property ride the persisted log into a new planner
    cat2 = Catalog(warehouse=qp.catalog.warehouse_root())
    cat2.register("t", qp._table_history["t"][0])
    qp2 = QueryPlanner(spark, cat2)
    rows2 = {r["k"]: r["note"] for r in qp2.sql("select * from t").collect()}
    assert rows2[100] == "hello" and rows2[3] is None
    qp2.sql(
        "insert into t (k, v, tag, note, extra) values "
        "(101, 1010, 'm', 'w', 7)"
    ).count()
    got = qp2.sql("select k, extra from t where k >= 100 order by k").collect()
    assert [(r["k"], r["extra"]) for r in got] == [(100, None), (101, 7)]


def test_link_collision_suffix_keeps_dv_keys_distinct(spark, tmp_path):
    """ADVICE r9 (low): basename collisions in a hardlink carry get a
    ``-linkedN`` SUFFIX before the extension — deliberately NOT
    strippable, so two distinct files can never share a deletion-vector
    row key (the old ``linked-{i}-`` prefix was stripped at scan time
    and made a collision pair indistinguishable)."""
    import re

    from datafusion_dolomite_spark.sources import dml as _dml

    for d in ("x", "y"):
        spark.createDataFrame([(d,)], "v string").coalesce(1).write.parquet(
            str(tmp_path / d)
        )
    a = _dml.data_files(str(tmp_path / "x"))[0]
    b = _dml.data_files(str(tmp_path / "y"))[0]
    os.rename(b, os.path.join(os.path.dirname(b), os.path.basename(a)))
    b = os.path.join(os.path.dirname(b), os.path.basename(a))
    dest = str(tmp_path / "dest")
    out = _dml.link_files([a, b], dest)
    names = [os.path.basename(p) for p in out]
    assert len(set(names)) == 2  # distinct DV identities
    assert not any(n.startswith("linked-") for n in names)
    assert any(re.search(r"-linked\d+\.parquet$", n) for n in names)
    # both link targets share bytes with their sources (hardlinks)
    assert os.stat(out[0]).st_ino == os.stat(a).st_ino
    assert os.stat(out[1]).st_ino == os.stat(b).st_ino


def test_vacuum_counts_cross_victim_hardlinks_once(qp, spark):
    """ADVICE r9 (low): a file hardlinked by SEVERAL victim version
    dirs frees its bytes when the LAST victim goes — the dry-run
    accounting counts it once instead of skipping it because each
    victim alone sees st_nlink > 1."""
    qp.sql("delete from t where k = 0").count()   # v1: rewritten file A
    qp.sql(
        "insert into t values (100, 1000, 'z')"
    ).count()  # v2: A carried (nlink 2) + delta file
    qp.sql("update t set v = v + 1").count()  # v3: full rewrite, A dropped
    v1 = qp._table_history["t"][1]
    a_files = dml.data_files(v1)
    a_bytes = sum(os.path.getsize(f) for f in a_files)
    assert all(os.stat(f).st_nlink >= 2 for f in a_files)  # shared v1↔v2
    dry = qp.sql("vacuum t dry run").collect()[0]
    assert dry["versions_removed"] == 2  # v1, v2 (v0 base + head stay)
    # the shared file's bytes ARE counted (old code skipped nlink>1)
    assert dry["bytes_freed"] >= a_bytes
    real = qp.sql("vacuum t").collect()[0]
    assert real["bytes_freed"] == dry["bytes_freed"]
    assert qp.sql("select * from t").count() == 10  # 10 - 1 + 1
