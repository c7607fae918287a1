"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin side-by-side, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: RAY ERROR {exc!r}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        want = canon(con.execute(oracles[name]).df())
        status = "OK"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA MISMATCH got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWCOUNT got={len(got)} want={len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            except AssertionError as exc:
                status = "VALUES " + str(exc).split("\n")[0]
        if status != "OK":
            failures += 1
        print(f"{name}: {status} ({len(got)} rows, {dt:.1f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    ray.shutdown()
    sys.exit(code)
