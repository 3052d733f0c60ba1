#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff exactly (sorted columns,
sorted rows). Usage: compare.py <sfDir> <verifyOutDir>"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def mem_limit_gb():
    """Memory cap for DuckDB: 80% of MemAvailable, ceilinged at 90GB —
    on a smaller box the 90GB literal would never bind and the kernel
    OOM killer could still take the gate down. Override with
    GRAFT_DUCKDB_MEM_GB when a run needs a specific bound."""
    import os
    if os.environ.get("GRAFT_DUCKDB_MEM_GB"):
        return int(os.environ["GRAFT_DUCKDB_MEM_GB"])
    try:
        kb = int(next(l for l in open("/proc/meminfo")
                      if l.startswith("MemAvailable")).split()[1])
        return max(4, min(90, int(kb / 1024 / 1024 * 0.8)))
    except Exception:
        return 90

def main(sf_dir, out_dir, skip=()):
    import os
    con = duckdb.connect()
    # Bound DuckDB's memory so an oracle too big for the box fails as a
    # clean per-query error (a FAIL row) instead of the kernel OOM
    # killer taking the whole run down mid-gate (observed: the
    # doc-level grouped-minhash spelling at the 64x rung, 130 GB RSS).
    con.sql(f"SET memory_limit='{mem_limit_gb()}GB'")
    con.sql(f"SET temp_directory='{out_dir}/duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (excluded by caller)")
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols, g_rows = canon(got.fetchall(), [d[0] for d in got.description])
            exp = con.sql(sql)
            e_cols, e_rows = canon(exp.fetchall(), [d[0] for d in exp.description])
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL {name}: cols spark={g_cols} oracle={e_cols}")
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows spark={len(g_rows)} oracle={len(e_rows)}")
            print("  spark head:", g_rows[:2])
            print("  oracle head:", e_rows[:2])
            n_fail += 1
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(g_rows, e_rows)):
            if not all(cell_eq(a, b) for a, b in zip(gr, er)):
                bad = (i, gr, er)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}\n  spark:  {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional 3rd arg: comma-separated query names to skip (for rungs
    # where a deliberately doc-level oracle spelling is infeasible —
    # document any use in the gate artifact)
    skips = tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()
    sys.exit(main(sys.argv[1], sys.argv[2], skips))
