"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare row-count / schema /
order-insensitive values against ``oracle_sql()`` via DuckDB.

Usage: python tools/check_oracle.py [--gate] [--rotation] [--only] [name ...]
(--gate restricts to the FIRST 50 registry entries — the exact set the
driver's correctness gate checks; --rotation prints the gate/past-cap
split — which oracle-backed green entries sit OUTSIDE the gate and
stand on a prior round's driver record — then exits)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    from guac_ray.pipelines.suite import SUITE, resolve_sql
    from guac_ray.synth import corpus_for_sf

    corpus_for_sf(SF_DIR)  # KG fixture for THIS sf (idempotent, seeded)
    qs = e.queries()
    # which entries HAVE an oracle (cheap); the SQL itself resolves
    # LAZILY per checked name — eager resolution builds every KG
    # document fleet up front even for a single-query run
    has_sql = {name for name, (_fn, sql) in SUITE.items()
               if sql is not None}
    _sql_cache: dict = {}

    def sql_for(name: str) -> str:
        if name not in _sql_cache:
            _sql_cache[name] = resolve_sql(SUITE[name][1], SF_DIR)
        return _sql_cache[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    args = [a for a in sys.argv[1:] if a != "--only"]
    gate_only = "--gate" in args
    rotation = "--rotation" in args
    only = set(a for a in args if a not in ("--gate", "--rotation"))
    # comma-separated names (the --only a,b,c form) expand too
    only = {n for a in only for n in a.split(",") if n}
    unknown = only - set(qs)
    if unknown:
        # a typo'd name (or flag) must NEVER filter everything out and
        # exit 0 'all green' — that is a false-green gate
        print(f"error: unknown query name(s): {sorted(unknown)}",
              file=sys.stderr)
        ray.shutdown()
        return 2
    gate = set(list(qs)[:50])  # the driver checks exactly these
    if rotation:
        names = list(qs)
        in_gate = names[:50]
        past = names[50:]
        print(f"registry: {len(names)} entries "
              f"({sum(1 for n in names if n in has_sql)} oracle-backed, "
              f"{sum(1 for n in names if n not in has_sql)} golden-pinned)")
        print(f"IN GATE (driver-checked, first 50): {len(in_gate)}")
        for n in in_gate:
            print(f"  {n}")
        print(f"PAST CAP (green via check_oracle + prior driver record): "
              f"{len(past)}")
        for n in past:
            kind = "oracle" if n in has_sql else "golden-pinned"
            print(f"  {n} [{kind}]")
        ray.shutdown()
        return 0
    fails = []
    for name, fn in qs.items():
        if gate_only and name not in gate:
            continue
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(SF_DIR))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        dt = time.time() - t0
        if name not in has_sql:
            print(f"ok?  {name}: rows={len(got)} (rows-only, no oracle) [{dt:.1f}s]")
            if len(got) == 0:
                # every golden-pinned query is non-empty at every sf —
                # a zero-row regression must FAIL, not print ok?
                print(f"FAIL {name}: golden-pinned query returned 0 rows")
                fails.append(name)
            continue
        try:
            want = con.execute(sql_for(name)).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        g, w = normalize(got), normalize(want)
        status = []
        if len(g) != len(w):
            status.append(f"rows {len(g)} != {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"cols {list(g.columns)} != {list(w.columns)}")
        else:
            try:
                # TIGHT values: integers/strings compare exactly;
                # floats at rtol=1e-12 — one-ulp summation-order noise
                # (pandas sequential cumsum vs DuckDB's windowed-sum
                # tree, ~2e-16 relative, which the driver's float
                # normalization also tolerates per the r4 hash-exact
                # record) passes, while real drift (1e-6-scale, the
                # class pandas' default rtol=1e-5 would green-light)
                # fails.
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              rtol=1e-12, atol=1e-12)
            except AssertionError as ex:
                status.append("values differ: " + str(ex).split("\n")[-2][:160])
        if status:
            print(f"FAIL {name}: {'; '.join(status)} [{dt:.1f}s]")
            fails.append(name)
        else:
            # dtype strictness (the driver checks schema)
            dtypes_differ = [
                c for c in g.columns if str(g[c].dtype) != str(w[c].dtype)
            ]
            note = f" DTYPE? {dtypes_differ}" if dtypes_differ else ""
            print(f"PASS {name}: rows={len(g)}{note} [{dt:.1f}s]")
    ray.shutdown()
    if fails:
        print("FAILURES:", fails)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
