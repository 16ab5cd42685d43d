"""Local stand-in for the driver's correctness gate: runs every queries()
entry at sf0.01 and compares against oracle_sql() via DuckDB
(row count + column names + order-insensitive value comparison)."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes, bytearray)):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    only = sys.argv[1:] or list(qs)
    ok = fail = 0
    for name in only:
        fn = qs[name]
        t0 = time.time()
        try:
            ray_df = to_df(fn(SF))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?  {name}: rows-only ({len(ray_df)} rows, {dt:.1f}s) cols={list(ray_df.columns)}")
            ok += 1
            continue
        try:
            ora_df = con.execute(sqls[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            fail += 1
            continue
        a, b = canon(ray_df), canon(ora_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"OK   {name}: {len(a)} rows ({dt:.1f}s)")
            ok += 1
        except AssertionError as e:
            # retry with tolerance to show near-misses distinctly
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9, rtol=1e-12)
                print(f"OK~  {name}: {len(a)} rows (float-tolerance only, {dt:.1f}s)")
                ok += 1
            except AssertionError:
                print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
                fail += 1
    print(f"\n{ok} ok, {fail} fail")
    ray.shutdown()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
