#!/usr/bin/env python3
"""DuckDB-native compare for HUGE verify outputs.

tools/check.py (the driver-gate stand-in) round-trips both result sets
through pandas and sorts rows by repr — exact, but unusable at the scale of
e.g. q_multimodal_phash's sf1.0 output (~63M rows). This checker keeps the
whole compare inside DuckDB: it materializes the oracle SQL's result and
the Spark parquet dump, then asserts

    count(spark) == count(oracle)  AND  |spark EXCEPT ALL oracle| == 0
                                   AND  |oracle EXCEPT ALL spark| == 0

which is set-with-multiplicity equality — strictly stronger than the
hash compare for exact-typed columns. Use it only for keys whose columns
are integral/string/date (no float fuzz): EXCEPT ALL is bag semantics, so
a double that differs in the last ULP between engines would flag here the
same way the driver's hash would.

Usage: python3 tools/check_native.py <sfDir> <verifyOutDir> <key> [key...]
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failed = 0
    for k in keys:
        spark_glob = os.path.join(outdir, k, "*.parquet")
        con.sql(f"CREATE OR REPLACE TABLE __oracle AS ({oracle[k]})")
        con.sql(
            "CREATE OR REPLACE TABLE __spark AS "
            f"SELECT * FROM read_parquet('{spark_glob}')")
        # align column order by name (the driver's convention) before EXCEPT
        cols = ", ".join(sorted(
            r[0] for r in con.sql("DESCRIBE __oracle").fetchall()))
        n_s = con.sql("SELECT count(*) FROM __spark").fetchone()[0]
        n_o = con.sql("SELECT count(*) FROM __oracle").fetchone()[0]
        d1 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM __spark "
                     f"EXCEPT ALL SELECT {cols} FROM __oracle)").fetchone()[0]
        d2 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM __oracle "
                     f"EXCEPT ALL SELECT {cols} FROM __spark)").fetchone()[0]
        ok = n_s == n_o and d1 == 0 and d2 == 0
        failed += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {k} "
              f"(spark={n_s} oracle={n_o} s-o={d1} o-s={d2})")
    print(f"\n{len(keys) - failed} passed, {failed} failed (native EXCEPT-ALL compare)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
