"""Simulate the driver's correctness gate locally.

Usage: python tools/driver_sim.py [sf_dir] [--budget SEC] [query ...]

Runs each __ray_entry__.queries() callable at sf_dir (default sf0.01),
compares against oracle_sql() via DuckDB: row count, column names, and
order-insensitive value comparison (columns sorted by name, rows sorted).

``--budget SEC`` turns slowness into failure: any single query whose
Ray-side wall exceeds SEC is reported and fails the run (the real
driver runs the whole catalog under a wall budget — round 3 went
all-green but banked an EMPTY correctness file because the catalog
outgrew it; the round-close soak runs this mode so that never
silently recurs).  A total-wall line is always printed.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    budget = None
    if "--budget" in args:
        i = args.index("--budget")
        budget = float(args[i + 1])
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e  # installs quiet_empty_bundle_warnings

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    sqls = e.oracle_sql()
    n_fail = 0
    timings: dict[str, float] = {}
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        timings[name] = dt
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(mine)} rows  [{dt:.1f}s]")
            continue
        try:
            oracle = normalize(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            n_fail += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != "
                  f"{list(oracle.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} != {len(oracle)}")
            n_fail += 1
            continue
        bad = None
        for c in mine.columns:
            a, b = mine[c].values, oracle[c].values
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = np.allclose(a.astype(float), b.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
                exact = eq
            else:
                exact = (a == b).all()
            if not exact:
                bad = c
                break
        if bad is not None:
            print(f"FAIL {name}: column {bad} differs")
            m = mine[mine[bad].astype(str) != oracle[bad].astype(str)]
            print(mine.loc[m.index[:3]])
            print(oracle.loc[m.index[:3]])
            n_fail += 1
        else:
            print(f"ok   {name}: {len(mine)} rows == oracle  [{dt:.1f}s]")
    ray.shutdown()
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print("TOTAL WALL: %.1fs over %d queries; slowest: %s"
          % (time.time() - t_start, len(timings),
             ", ".join(f"{k}={v:.1f}s" for k, v in slow)))
    if budget is not None:
        over = {k: v for k, v in timings.items() if v > budget}
        for k, v in sorted(over.items(), key=lambda kv: -kv[1]):
            print(f"OVER BUDGET ({budget:.0f}s): {k} took {v:.1f}s")
        n_fail += len(over)
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
