#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, sorts columns by name + rows by all columns, and compares values
exactly. Exit code 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_convert(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            import datetime
            def conv(v):
                # NO list/ndarray shim here: the driver's checker does a plain
                # pandas sort that crashes on array cells ("unhashable type:
                # numpy.ndarray"), so queries must serialize arrays to scalars.
                # Keeping this gate identical means the failure reproduces
                # locally instead of surfacing only in CORRECTNESS_r{N}.json.
                if isinstance(v, (list, np.ndarray)):
                    raise TypeError(
                        f"array-typed cell {v!r}: driver checker cannot sort arrays; "
                        "serialize with array_join/to_json in the query")
                if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                    return pd.Timestamp(v)
                return v
            df[c] = s.map(conv)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures, passed, skipped = [], 0, 0
    result_dirs = sorted(d for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d))
    names = sorted({os.path.basename(d) for d in result_dirs} | set(oracle))
    for name in names:
        rdir = os.path.join(outdir, name)
        if name not in oracle:
            skipped += 1
            print(f"SKIP  {name} (no oracle — rows-only)")
            continue
        if not os.path.isdir(rdir):
            failures.append(name)
            print(f"FAIL  {name}: no Spark result written")
            continue
        try:
            got = normalize(pd.read_parquet(rdir))
            exp = normalize(con.sql(oracle[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            continue
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if not a.map(repr).equals(b.map(repr)):
                bad = (a.map(repr) != b.map(repr))
                if not bad.any():
                    # value-identical (e.g. both empty) but dtype differs —
                    # the driver hashes values, so treat as equal
                    continue
                i = bad.idxmax()
                print(f"FAIL  {name}: col {c} differs at row {i}: spark={a[i]!r} duckdb={b[i]!r} "
                      f"({int(bad.sum())} rows differ)")
                eq = False
                break
        if eq:
            passed += 1
            print(f"PASS  {name} ({len(got)} rows)")
        else:
            failures.append(name)
    print(f"\n{passed} passed, {len(failures)} failed, {skipped} rows-only")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
