#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: selfcheck.py [sfDir] [verifyOutDir] [query ...]

Reads oracle_sql.json + per-query parquet dumps produced by
`graft.Verify`, runs each oracle against DuckDB views over the same
testdata parquet, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact for ints/strings/bools, exact for floats
too — stricter than any sane driver tolerance).
"""
import duckdb, sys, json, glob
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    fails, nrows = [], {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f'{name}: ORACLE ERROR {ex}')
            fails.append(name); continue
        files = glob.glob(f'{out}/{name}/*.parquet')
        if not files:
            print(f'{name}: NO SPARK OUTPUT')
            fails.append(name); continue
        got = pd.concat([pq.read_table(p).to_pandas() for p in files],
                        ignore_index=True)
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f'{name}: SCHEMA spark={gc} duck={ec}')
            fails.append(name); continue
        got, exp = got[gc], exp[gc]
        if len(got) != len(exp):
            print(f'{name}: ROWS spark={len(got)} duck={len(exp)}')
            fails.append(name); continue
        got = got.sort_values(gc).reset_index(drop=True)
        exp = exp.sort_values(gc).reset_index(drop=True)
        ok = True
        for c in gc:
            a, b = got[c], exp[c]
            dt_note = '' if str(a.dtype) == str(b.dtype) else \
                f' [dtype {a.dtype} vs {b.dtype}]'
            try:
                av, bv = a.values, b.values
                eq = (av == bv) | (pd.isna(a).values & pd.isna(b).values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not np.all(eq):
                i = int(np.argmin(eq))
                print(f'{name}: MISMATCH col={c}{dt_note} row={i}: '
                      f'spark={a.iloc[i]!r} duck={b.iloc[i]!r}')
                ok = False
                break
            if dt_note:
                print(f'{name}: note col={c}{dt_note} (values equal)')
        if ok:
            nrows[name] = len(got)
            print(f'{name}: OK ({len(got)} rows)')
        else:
            fails.append(name)
    print('---')
    print(f'{len(nrows)} OK, {len(fails)} FAILED' +
          (f': {fails}' if fails else ''))
    sys.exit(1 if fails else 0)

if __name__ == '__main__':
    main()
