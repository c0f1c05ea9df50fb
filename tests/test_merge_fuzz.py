"""Differential MERGE fuzzing (r10): random multi-clause MERGE
statements — ordered WHEN MATCHED arms (UPDATE/DELETE, conditional),
WHEN NOT MATCHED INSERT *, WHEN NOT MATCHED BY SOURCE arms,
UPDATE SET *, and source-side schema evolution — executed through the
engine's full SQL front door (parse → clause split → full-outer join +
chained CASE → copy-on-write), then compared row-for-row against an
INDEPENDENT Python replay of Delta's dispatch semantics
(first-applicable clause wins; uncovered matched/target-only rows
keep; uncovered source-only rows are not inserted).

The generator pairs every SQL condition/action with the Python lambda
that defines its meaning, so the replay shares no code with the
engine's parser or planner — a genuine second implementation, the
same discipline as the SELECT fuzzer's DuckDB twin.  Seed-pinned:
failures reproduce; the failing statement prints."""

from __future__ import annotations

import random

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog

N_STATEMENTS = 25
SEED = 20251015


def _mk_tables(spark, tmp_path, rng, tag):
    """Small target/source with overlapping keys; source sometimes
    carries an extra column (the evolution case)."""
    n_t = rng.randint(6, 40)
    t_rows = [(k, rng.randint(0, 9)) for k in range(n_t)]
    # source: some matched keys, some new, shuffled values
    s_keys = [k for k in range(n_t) if rng.random() < 0.5] + [
        n_t + i for i in range(rng.randint(1, 8))
    ]
    evolve = rng.random() < 0.4
    if evolve:
        s_rows = [
            (k, rng.randint(0, 9), f"tag{k % 3}") for k in s_keys
        ]
        s_schema = "k bigint, v bigint, extra string"
    else:
        s_rows = [(k, rng.randint(0, 9)) for k in s_keys]
        s_schema = "k bigint, v bigint"
    base = tmp_path / f"m{tag}"
    spark.createDataFrame(t_rows, "k bigint, v bigint").coalesce(
        1
    ).write.parquet(str(base / "t"))
    spark.createDataFrame(s_rows, s_schema).coalesce(1).write.parquet(
        str(base / "s")
    )
    cat = Catalog(warehouse=str(base / "wh"))
    cat.register("t", str(base / "t"))
    cat.register("s", str(base / "s"))
    qp = QueryPlanner(spark, cat)
    if evolve:
        qp.sql(
            "alter table t set tblproperties ('schema_evolution'='auto')"
        ).count()
    return qp, dict(t_rows), {r[0]: r[1:] for r in s_rows}, evolve


def _cond(rng, side):
    """(sql_text, lambda(t_v, s_v) -> bool) pairs.  ``side`` limits the
    referenced columns: matched arms see both, NMS arms see target
    only (no source row exists for them)."""
    c = rng.randint(0, 9)
    choices = [(f"a.v >= {c}", lambda tv, sv, c=c: tv >= c),
               (f"a.v < {c}", lambda tv, sv, c=c: tv < c)]
    if side == "m":
        choices += [
            (f"b.v >= {c}", lambda tv, sv, c=c: sv >= c),
            (f"a.v <> b.v", lambda tv, sv: tv != sv),
        ]
    return rng.choice(choices)


def _m_action(rng, evolve):
    """(sql_text, apply(t_v, s_v, s_extra) -> None-for-delete |
    (new_v, new_extra)) for a MATCHED arm."""
    r = rng.random()
    if r < 0.25:
        return "delete", lambda tv, sv, se: None
    if r < 0.5:
        return (
            "update set v = b.v",
            lambda tv, sv, se: (sv, "KEEP"),
        )
    if r < 0.7:
        return (
            "update set v = a.v + 100",
            lambda tv, sv, se: (tv + 100, "KEEP"),
        )
    if evolve and r < 0.85:
        # SET * writes every shared column from the source (post-
        # evolution: v and extra)
        return (
            "update set *",
            lambda tv, sv, se: (sv, se),
        )
    return (
        "update set v = a.v + b.v",
        lambda tv, sv, se: (tv + sv, "KEEP"),
    )


def _nms_action(rng):
    r = rng.random()
    if r < 0.4:
        return "delete", None
    if r < 0.7:
        return "update set v = a.v + 1000", 1000
    return "update set v = -1", "SET-1"


@pytest.mark.parametrize("i", range(N_STATEMENTS))
def test_merge_differential(spark, tmp_path, i):
    rng = random.Random(SEED + i)
    qp, t_map, s_map, evolve = _mk_tables(spark, tmp_path, rng, i)

    m_arms = []  # (cond_sql|None, cond_fn, action_sql, apply_fn)
    for _ in range(rng.randint(0, 3)):
        has_cond = rng.random() < 0.7
        csql, cfn = _cond(rng, "m") if has_cond else (None, None)
        asql, afn = _m_action(rng, evolve)
        m_arms.append((csql, cfn, asql, afn))
    nmt = None  # (cond_sql|None, cond_fn)
    if rng.random() < 0.8:
        has_cond = rng.random() < 0.4
        nmt = _cond(rng, "s") if has_cond else (None, None)
        # NOT MATCHED conds may reference only the source side
        if nmt[0] is not None:
            c = rng.randint(0, 9)
            nmt = (f"b.v >= {c}", lambda tv, sv, c=c: sv >= c)
    nms_arms = []
    for _ in range(rng.randint(0, 2)):
        has_cond = rng.random() < 0.6
        csql, cfn = _cond(rng, "nms") if has_cond else (None, None)
        asql, delta = _nms_action(rng)
        nms_arms.append((csql, cfn, asql, delta))
    if not m_arms and nmt is None and not nms_arms:
        m_arms.append((None, None, "update set v = b.v",
                       lambda tv, sv, se: (sv, "KEEP")))

    parts = []
    for csql, _c, asql, _a in m_arms:
        w = "when matched"
        if csql:
            w += f" and {csql}"
        parts.append(f"{w} then {asql}")
    if nmt is not None:
        w = "when not matched"
        if nmt[0]:
            w += f" and {nmt[0]}"
        parts.append(f"{w} then insert *")
    for csql, _c, asql, _d in nms_arms:
        w = "when not matched by source"
        if csql:
            w += f" and {csql}"
        parts.append(f"{w} then {asql}")
    sql = "merge into t as a using s as b on a.k = b.k " + " ".join(parts)

    qp.sql(sql).count()
    out = qp.sql("select * from t")
    has_extra = "extra" in out.columns  # evolution fires only when an
    # arm can WRITE the new column (INSERT * / SET * / explicit set)
    got = {
        r["k"]: (r["v"], r["extra"] if has_extra else None)
        for r in out.collect()
    }

    # -- independent replay --------------------------------------------
    exp = {}
    for k, tv in t_map.items():
        if k in s_map:
            sv = s_map[k][0]
            se = s_map[k][1] if evolve else None
            for csql, cfn, _asql, afn in m_arms:
                if cfn is None or cfn(tv, sv):
                    out = afn(tv, sv, se)
                    if out is not None:
                        nv, ne = out
                        exp[k] = (nv, None if ne == "KEEP" else ne)
                    break
            else:
                exp[k] = (tv, None)
        else:
            for csql, cfn, _asql, delta in nms_arms:
                if cfn is None or cfn(tv, None):
                    if delta is None:
                        pass  # deleted
                    elif delta == "SET-1":
                        exp[k] = (-1, None)
                    else:
                        exp[k] = (tv + delta, None)
                    break
            else:
                exp[k] = (tv, None)
    for k, srow in s_map.items():
        if k in t_map or nmt is None:
            continue
        sv = srow[0]
        se = srow[1] if evolve else None
        if nmt[1] is None or nmt[1](None, sv):
            exp[k] = (sv, se)

    assert got == exp, (
        f"\nSTATEMENT: {sql}\n"
        f"evolve={evolve}\nt={t_map}\ns={s_map}\n"
        f"got-exp diff: "
        f"{ {k: (got.get(k), exp.get(k)) for k in set(got) | set(exp) if got.get(k) != exp.get(k)} }"
    )
