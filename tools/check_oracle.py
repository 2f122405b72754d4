#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, run the matching
oracle SQL from oracle_sql.json in DuckDB against the same sf tables, sort
columns by name, and compare row-by-row (exact; floats must match bit-for-
bit thanks to the engine's determinism measures — SURVEY.md §7.4).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            exp_rel = con.sql(sql)
            if sorted(got_rel.columns) != sorted(exp_rel.columns):
                print(f"FAIL {name}: columns {sorted(got_rel.columns)} != "
                      f"{sorted(exp_rel.columns)}")
                n_fail += 1
                continue
            # Type check: the driver's gate hashes a TYPED representation,
            # so BIGINT vs HUGEINT (DuckDB promotes SUM(BIGINT)) fails there
            # even when values match. Match that sensitivity — but no more:
            # CORRECTNESS_r03 shows the driver accepts int32-vs-int64 (11
            # queries with Spark INTEGER vs oracle BIGINT all hash-matched),
            # so integer widths up to 64 bits are one equivalence class;
            # HUGEINT (int128) is what actually fails there.
            def norm(t):
                s = str(t)
                return "INT<=64" if s in ("TINYINT", "SMALLINT", "INTEGER",
                                          "BIGINT", "UTINYINT", "USMALLINT",
                                          "UINTEGER") else s
            got_types = sorted(zip(got_rel.columns,
                                   (norm(t) for t in got_rel.types)))
            exp_types = sorted(zip(exp_rel.columns,
                                   (norm(t) for t in exp_rel.types)))
            if got_types != exp_types:
                diff = [(g, e) for g, e in zip(got_types, exp_types) if g != e]
                print(f"FAIL {name}: column types differ (spark vs oracle): "
                      f"{diff}")
                n_fail += 1
                continue
            order = ", ".join('"%s"' % c for c in sorted(got_rel.columns))
            # Sort rows in Python: SQL gives no guarantee a subquery's
            # ORDER BY survives the outer projection, and parquet_scan row
            # order depends on DuckDB's preserve_insertion_order default.
            key = lambda r: tuple((v is None, v) for v in r)
            got_raw = con.sql(f"SELECT {order} FROM got_rel").fetchall()
            exp_raw = con.sql(f"SELECT {order} FROM exp_rel").fetchall()
            got = sorted(got_raw, key=key)
            exp = sorted(exp_raw, key=key)
            # Ordering check (advisory): when the oracle's OUTER query
            # declares ORDER BY, the engine's parquet (written with
            # coalesce(1), insertion order preserved) must already be in
            # the oracle's order. Subquery ORDER BYs don't survive the
            # outer projection, so only flag, never fail, on mismatch.
            if "order by" in sql.rsplit(")", 1)[-1].lower() and got_raw != exp_raw \
                    and got == exp:
                print(f"WARN {name}: values match but output ordering differs "
                      f"from the declared ORDER BY")
            if len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                n_fail += 1
                continue
            bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
            if bad:
                i, g, e = bad[0]
                print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:")
                print(f"   got {g}")
                print(f"   exp {e}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
