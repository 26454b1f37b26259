#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet, executes the corresponding oracle SQL in
DuckDB over the same testdata tables and compares (columns sorted by name,
rows sorted, values compared exactly; floats with report of max abs diff).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    # The driver's hash compare is insensitive to integer WIDTH (r1 data:
    # INTEGER-vs-BIGINT ranks hashed equal) but sensitive to HUGEINT
    # (int128 exceeds int64 and converts differently). Normalize widths.
    def tnorm(t):
        t = str(t)
        return "INT64" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                                "UTINYINT", "USMALLINT", "UINTEGER") else t
    return [cols[i] for i in order], out, [tnorm(types[i]) for i in order]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_types = spark_rel.types
        s_cols, s_rows, s_types = norm(spark_rel.fetchall(), spark_rel.columns,
                                       s_types)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(s_rows)} rows")
            continue
        try:
            duck_rel = con.sql(oracle[name])
            d_types = duck_rel.types
            d_cols, d_rows, d_types = norm(duck_rel.fetchall(),
                                           duck_rel.columns, d_types)
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle error: {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"[FAIL-cols] {name}: spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # Type-strict: the driver hashes TYPED values, so a DuckDB HUGEINT
        # (int128 from sum(int)) vs Spark BIGINT is a hash mismatch even
        # when the Python values compare equal. Fail here so local green
        # predicts driver green.
        if s_types != d_types:
            bad_t = [(c, st, dt) for c, st, dt in
                     zip(s_cols, s_types, d_types) if st != dt]
            print(f"[FAIL-type] {name}: {bad_t}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"[FAIL-rows] {name}: spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        max_diff, bad = 0.0, None
        for sr, dr in zip(s_rows, d_rows):
            for c, (sv, dv) in enumerate(zip(sr, dr)):
                if sv == dv:
                    continue
                if isinstance(sv, float) and isinstance(dv, float):
                    if math.isnan(sv) and math.isnan(dv):
                        continue
                    d = abs(sv - dv)
                    if d > max_diff:
                        max_diff, bad = d, (s_cols[c], sv, dv)
                    continue
                bad = bad or (s_cols[c], sv, dv)
                max_diff = max(max_diff, float("inf"))
        if max_diff == 0.0:
            print(f"[PASS     ] {name}: {len(s_rows)} rows exact")
            n_pass += 1
        else:
            print(f"[FAIL-vals] {name}: max_diff={max_diff} first_bad={bad}")
            n_fail += 1
    print(f"\n{n_pass} exact, {n_fail} failed, "
          f"{len(names) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
