#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB with the sf tables registered
as views. Compares schema (column names), row count, and values
cell-by-cell (sorted columns by name; exact for non-floats, tolerant +
exact report for floats).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_types = dict(zip(spark_rel.columns,
                                   (str(t) for t in spark_rel.types)))
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            duck_rel = con.sql(sql)
            duck_cols_orig = duck_rel.columns
            duck_cols = sorted(duck_cols_orig)
            duck_types = dict(zip(duck_rel.columns,
                                  (str(t) for t in duck_rel.types)))
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) +
                f" FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        errs = []
        # Mirror the driver's strictness, which plain value-compare hides:
        # (1) the driver's pandas row-sort cannot hash LIST cells — any
        #     array-typed output column is an automatic driver failure;
        # (2) pandas renders DuckDB HUGEINT/different widths differently
        #     from Spark's BIGINT → hash drift even when values are equal.
        for c in spark_cols:
            if c in duck_types:
                st, dt = spark_types[c], duck_types[c]
                if st.endswith("[]") or dt.endswith("[]"):
                    errs.append(f"array-typed column {c} ({st} vs {dt}): "
                                "driver compare cannot hash arrays")
                elif st != dt:
                    errs.append(f"type mismatch {c}: spark={st} duck={dt} "
                                "(driver hash would drift)")
        if spark_cols != duck_cols:
            errs.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        elif len(spark_rows) != len(duck_rows):
            errs.append(f"rowcount differ: spark={len(spark_rows)} duck={len(duck_rows)}")
        else:
            exact_mismatch = 0
            tol_mismatch = 0
            first = None
            for i, (sr, dr) in enumerate(zip(spark_rows, duck_rows)):
                for j, (a, b) in enumerate(zip(sr, dr)):
                    if a == b:
                        continue
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        exact_mismatch += 1
                        if abs(a - b) > 1e-9 * max(1.0, abs(a), abs(b)):
                            tol_mismatch += 1
                            if first is None:
                                first = (i, spark_cols[j], a, b)
                    else:
                        exact_mismatch += 1
                        tol_mismatch += 1
                        if first is None:
                            first = (i, spark_cols[j], a, b)
            if tol_mismatch:
                errs.append(f"{tol_mismatch} cells differ beyond tol; first={first}")
            elif exact_mismatch:
                errs.append(f"WEAK: {exact_mismatch} float cells differ within tol "
                            f"(driver may hash-mismatch)")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
