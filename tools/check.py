#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Reads the Verify.scala output dir (parquet per query + oracle_sql.json),
runs each oracle in DuckDB over the same sf parquet tables, and compares:
row count, schema (column names), and exact values after sorting columns
by name and rows by all columns. Exit 0 iff everything matches.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) for v in r))
    return sorted(out)


def nested_cols(rel):
    """Columns the driver's pandas comparator cannot sort/hash.

    The driver gate dies on array/map/struct cells (numpy arrays are
    unhashable); this emulator's str() normalization used to pass them
    vacuously — the round-7 q_scalar_map gap. Mirror the driver: reject.
    """
    bad = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if "[]" in t or any(k in t for k in ("STRUCT", "MAP", "LIST", "JSON")):
            bad.append(f"{name}:{typ}")
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = []
    import os
    qnames = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    # A query Verify attempted but that produced no output dir THREW —
    # fail it instead of silently skipping (gate must not pass vacuously).
    ran_path = os.path.join(out_dir, "ran.json")
    if os.path.exists(ran_path):
        with open(ran_path) as f:
            attempted = set(json.load(f))
        for m in sorted(attempted - set(qnames)):
            print(f"{m}: NO OUTPUT (query threw in Verify)")
            failures.append(m)
    for name in qnames:
        spark_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols = sorted(spark_rel.columns)
        bad = nested_cols(spark_rel)
        if bad:
            print(f"{name}: NESTED OUTPUT COLUMN(S) {bad} "
                  "(driver comparator cannot hash these)")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            n = len(spark_rel.fetchall())
            status = "ROWS_ONLY_OK" if n > 0 else "ROWS_ONLY_EMPTY"
            print(f"{name}: {status} ({n} rows, no oracle)")
            if n == 0:
                failures.append(name)
            continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            bad = nested_cols(duck_rel)
            if bad:
                print(f"{name}: NESTED ORACLE COLUMN(S) {bad}")
                failures.append(name)
                continue
            if spark_cols != duck_cols:
                print(f"{name}: SCHEMA MISMATCH spark={spark_cols} "
                      f"duck={duck_cols}")
                failures.append(name)
                continue
            s_rows = norm(con.sql(
                "SELECT " + ",".join(f'"{c}"' for c in spark_cols) +
                f" FROM '{out_dir}/{name}/*.parquet'").fetchall())
            d_sql = ("SELECT " + ",".join(f'"{c}"' for c in duck_cols) +
                     f" FROM ({sql}) oracle_q")
            d_rows = norm(con.sql(d_sql).fetchall())
            if len(s_rows) != len(d_rows):
                print(f"{name}: ROWCOUNT spark={len(s_rows)} "
                      f"duck={len(d_rows)}")
                failures.append(name)
            elif s_rows != d_rows:
                bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows))
                           if a != b)
                print(f"{name}: VALUE MISMATCH at sorted row {bad}:")
                print(f"  spark: {s_rows[bad]}")
                print(f"  duck : {d_rows[bad]}")
                failures.append(name)
            else:
                print(f"{name}: OK ({len(s_rows)} rows)")
        except Exception as e:
            print(f"{name}: ORACLE ERROR {str(e)[:300]}")
            failures.append(name)

    # total = present output dirs + attempted-but-missing (the latter are
    # already counted in failures, so don't double-subtract them)
    missing_count = len([f for f in failures if f not in qnames])
    total = len(qnames) + missing_count
    print(f"\n{total - len(failures)}/{total} green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
