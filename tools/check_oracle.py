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
    # resolve oracle SQL against the sf under test, not the driver default
    sqls = {
        name: resolve_sql(sql, SF_DIR)
        for name, (_fn, sql) in SUITE.items()
        if sql is not None
    }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    args = [a for a in sys.argv[1:] if a != "--only"]
    gate_only = "--gate" in args
    rotation = "--rotation" in args
    only = set(a for a in args if a not in ("--gate", "--rotation"))
    gate = set(list(qs)[:50])  # the driver checks exactly these
    if rotation:
        names = list(qs)
        in_gate = names[:50]
        past = names[50:]
        print(f"registry: {len(names)} entries "
              f"({sum(1 for n in names if n in sqls)} oracle-backed, "
              f"{sum(1 for n in names if n not in sqls)} golden-pinned)")
        print(f"IN GATE (driver-checked, first 50): {len(in_gate)}")
        for n in in_gate:
            print(f"  {n}")
        print(f"PAST CAP (green via check_oracle + prior driver record): "
              f"{len(past)}")
        for n in past:
            kind = "oracle" if n in sqls else "golden-pinned"
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
        if name not in sqls:
            print(f"ok?  {name}: rows={len(got)} (rows-only, no oracle) [{dt:.1f}s]")
            if len(got) < 0:
                fails.append(name)
            continue
        try:
            want = con.execute(sqls[name]).df()
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
                pd.testing.assert_frame_equal(g, w, check_dtype=False)
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
