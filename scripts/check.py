#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry (views over the sf parquet
tables) and compares against the Spark result parquet written by
graft.Verify: columns sorted by name, rows sorted, values hashed.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays -> tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     (hasattr(v, '__len__') and not isinstance(v, str) and not pd.api.types.is_scalar(v))).any():
            df[c] = df[c].map(lambda v: tuple(v) if v is not None and not pd.api.types.is_scalar(v) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    failures = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); failures += 1; continue
        try:
            got = canon(pd.read_parquet(spark_dir))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); failures += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name}: {len(got)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            for c in got.columns:
                if not got[c].equals(want[c]):
                    diff = (got[c] != want[c])
                    print(f"  col {c}: {int(diff.sum())} differing rows; "
                          f"spark={got[c][diff].head(3).tolist()} duck={want[c][diff].head(3).tolist()}")
            failures += 1
    print(f"{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
