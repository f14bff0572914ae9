#!/usr/bin/env python3
"""Partition-invariance sweep: compare two Verify output dirs produced at
different parallelism (e.g. SPARK_GRAFT_CPUS=32 vs 7). The library's
determinism invariants (decimal-exact aggregates, total-order ORDER BY,
hash-keyed sampling) claim every query's RESULT is identical under any
partitioning; the driver gate only runs one config, this proves the claim.

Values are compared (per-query sorted row multiset), not parquet bytes —
file layout legitimately differs with parallelism.

Usage: python3 tools/detcheck.py <outdirA> <outdirB>
"""
import sys
import duckdb


def profile(con, path):
    # stable row-multiset digest: serialize each row as JSON (a REAL
    # serialization: NULL -> null vs 'null' -> "null", every value
    # escaped), sort, hash. The previous concat_ws('|') digest SKIPPED
    # null cells and didn't escape '|' in values, so ('a',NULL,'b') and
    # ('a','b',NULL) hashed identically -- a partition-variance diff in
    # null placement could masquerade as OK.
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()]
    packed = ", ".join(f'"{c}" := "{c}"' for c in cols)
    return con.execute(
        f"SELECT COUNT(*), md5(string_agg(rowtxt, '\n' ORDER BY rowtxt)) "
        f"FROM (SELECT CAST(to_json(struct_pack({packed})) AS VARCHAR) AS rowtxt "
        f"FROM '{path}/*.parquet')").fetchone()


def main():
    a, b = sys.argv[1], sys.argv[2]
    import os
    qs = sorted(d for d in os.listdir(a)
                if os.path.isdir(os.path.join(a, d)))
    qs_b = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    missing = [q for q in qs if q not in qs_b]
    if missing:
        print(f"MISSING in {b}: {missing}")
        sys.exit(1)
    con = duckdb.connect()
    bad = []
    for q in qs:
        pa = profile(con, os.path.join(a, q))
        pb = profile(con, os.path.join(b, q))
        ok = pa == pb
        print(f"{q}: {'OK' if ok else f'MISMATCH {pa} != {pb}'}")
        if not ok:
            bad.append(q)
    print()
    if bad:
        print(f"{len(bad)} queries NOT partition-invariant: {bad}")
        sys.exit(1)
    print(f"{len(qs)}/{len(qs)} partition-invariant")


if __name__ == "__main__":
    main()
