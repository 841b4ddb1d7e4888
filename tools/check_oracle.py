#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL on the same sf dir, compare
column-sorted / row-sorted values. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                exact = ((av == bv) | (av.isna() & bv.isna())).all()
                if not exact:
                    print(f"  note {name}.{c}: float not bit-exact, "
                          f"max|diff|={float((av - bv).abs().max()):.3e}")
                ok = ((av - bv).abs() < 1e-9) | (av.isna() & bv.isna())
            else:
                ok = (av == bv) | (av.isna() & bv.isna())
            if not ok.all():
                i = (~ok).idxmax()
                return f"VALUES col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
        except Exception as e:  # noqa: BLE001
            if not av.astype(str).equals(bv.astype(str)):
                return f"VALUES col={c} (str-compare) {e}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracles:
            try:
                n = len(pd.read_parquet(p))
                print(f"rows {name}: {n}")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: unreadable ({e})")
                failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
