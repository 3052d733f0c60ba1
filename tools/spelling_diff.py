#!/usr/bin/env python3
"""Prove two oracle SQL spellings produce IDENTICAL full result sets
in DuckDB over the same parquet tables — the equivalence receipt the
gate discipline requires when a doc-level oracle is replaced by a
quotient respelling (SqlDump writes the spellings).

Usage: spelling_diff.py <sfDir> <a.sql> <b.sql>
Prints row counts and the symmetric-difference count; exits 0 iff 0.
"""
import os, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, a_path, b_path):
    con = duckdb.connect()
    con.sql(f"SET temp_directory='{os.path.dirname(a_path)}/duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        except Exception:
            pass
    a = open(a_path).read()
    b = open(b_path).read()
    na = con.sql(f"SELECT COUNT(*) FROM ({a})").fetchone()[0]
    nb = con.sql(f"SELECT COUNT(*) FROM ({b})").fetchone()[0]
    d = con.sql(
        f"SELECT COUNT(*) FROM ((({a}) EXCEPT ALL ({b})) UNION ALL (({b}) EXCEPT ALL ({a})))"
    ).fetchone()[0]
    print(f"rows A={na} B={nb} symmetric_diff={d}")
    return 0 if d == 0 and na == nb else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
