#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same sf tables,
and compares: row count, column names, dtypes, and values (columns sorted by
name, rows sorted by all columns). Dev-only tool — not part of the engine.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    failures = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        # ordered comparison first (queries declare ORDER BY on both sides,
        # so raw row order should already agree — catches a driver that
        # hashes without sorting)
        ordered_ok = False
        try:
            go = got[sorted(got.columns)].reset_index(drop=True)
            wo = want[sorted(want.columns)].reset_index(drop=True)
            pd.testing.assert_frame_equal(go, wo, check_dtype=False,
                                          check_exact=True)
            ordered_ok = True
        except Exception:  # noqa: BLE001
            pass
        g, w = normalize(got), normalize(want)
        if not ordered_ok:
            print(f"WARN {name}: rows equal only after sorting "
                  "(ordered comparison failed)")
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        dt_g, dt_w = [str(t) for t in g.dtypes], [str(t) for t in w.dtypes]
        dtype_note = "" if dt_g == dt_w else f"  [dtype diff: {dt_g} vs {dt_w}]"
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"  OK {name}: {len(g)} rows{dtype_note}")
            if dtype_note:
                failures += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e).splitlines()[-1]}")
            failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
