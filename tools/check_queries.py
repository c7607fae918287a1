"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin side-by-side, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [name ...]
       python tools/check_queries.py --json SWEEP.json [sf_dir] [name ...]

``--json OUT`` writes a machine-readable per-query record (status, row
count, wall seconds) — the whole-surface sweep artifact committed per
round as ``SWEEP_r{N}.json`` so every round ships fresh evidence for
ALL queries, not just the driver's 50-query sample.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: RAY ERROR {exc!r}")
            failures += 1
            records[name] = {"status": f"RAY ERROR {exc!r}", "ok": False}
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            records[name] = {
                "status": "rows-only", "ok": True,
                "rows": len(got), "sec": round(dt, 2),
            }
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
        records[name] = {
            "status": status, "ok": status == "OK",
            "rows": len(got), "sec": round(dt, 2),
        }
    if json_out:
        n_ok = sum(1 for r in records.values() if r["ok"])
        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(records),
            "n_ok": n_ok,
            "n_fail": len(records) - n_ok,
            "queries": records,
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"[sweep] {n_ok}/{len(records)} OK -> {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    ray.shutdown()
    sys.exit(code)
