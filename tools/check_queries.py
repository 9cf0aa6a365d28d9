"""Local emulation of the driver's correctness gate: run every
``queries()`` entry at a given sf_dir, run its ``oracle_sql()`` in
DuckDB over the same parquet tables, and compare row count, column
names, and order-insensitive values (exact for ints/strings, isclose
for floats).

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        errs.append(f"columns: ray={sorted(got.columns)} oracle={sorted(exp.columns)}")
        return errs
    if len(got) != len(exp):
        errs.append(f"rows: ray={len(got)} oracle={len(exp)}")
        return errs
    g, e = canon(got), canon(exp)
    for col in g.columns:
        gv, ev = g[col].to_numpy(), e[col].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            if not np.allclose(gv.astype(float), ev.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True):
                bad = np.nonzero(~np.isclose(gv.astype(float), ev.astype(float), rtol=1e-9, equal_nan=True))[0][:3]
                errs.append(f"float col {col} mismatch at rows {bad}: {gv[bad]} vs {ev[bad]}")
        else:
            if not (gv == ev).all():
                bad = np.nonzero(gv != ev)[0][:3]
                errs.append(f"col {col} mismatch at rows {bad}: {gv[bad]!r} vs {ev[bad]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: ray query raised: {ex!r}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle sql raised: {ex!r}")
            failures += 1
            continue
        errs = compare(name, got, exp)
        if errs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"PASS {name}: rows={len(got)} [{time.time()-t0:.1f}s]")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
