#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Verify parquet
output (columns sorted by name; doubles compared with tolerance).

Helpers (split_stages / canon / cmp_vals) are import-safe for
tools/test_oracle_check.py; the gate itself runs only as __main__."""
import json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def _default_mem_gb():
    try:
        with open("/proc/meminfo") as f:
            total_kb = int(next(l for l in f if l.startswith("MemTotal")).split()[1])
        return max(1, min(48, int(total_kb * 0.7 / 1024 / 1024)))
    except Exception:
        return 8  # conservative fallback when /proc is unavailable

def canon(df):
    df = df[sorted(df.columns)]
    return df

def split_stages(sql):
    """Split a staged oracle script on its ';---STAGE---' separators.

    The marker must sit at a STATEMENT boundary — anchored to the start
    of a (whitespace-indented) line and consuming to end-of-line — so a
    literal ';---STAGE---' inside a string constant mid-expression is
    never mis-split, and a marker at end-of-script (no trailing newline)
    still splits (round-15 advisor: the unanchored `;---STAGE---\\n` form
    matched anywhere and required the trailing newline).
    """
    import re
    return [p.strip()
            for p in re.split(r"(?m)^[ \t]*;---STAGE---[ \t]*$\n?", sql)]

def cmp_vals(a, b):
    import pandas as pd
    if a is None and b is None: return True
    if pd.isna(a) if not isinstance(a, (list, tuple)) else False:
        return pd.isna(b) if not isinstance(b, (list, tuple)) else False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb): return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

    con = duckdb.connect()
    # decade-scale oracles materialize multi-hundred-MB temp tables; give the
    # allocator a spill path and a bounded budget instead of an abort. The
    # budget derives from HOST RAM (override with DUCKDB_MEM): a hardcoded
    # 48GB would let DuckDB grow past physical memory on a smaller machine
    # and OOM the host before it ever decides to spill.
    os.makedirs("/tmp/duckdb_tmp", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_tmp'")
    mem = os.environ.get("DUCKDB_MEM", f"{_default_mem_gb()}GB")
    con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written amplified corpora are part-file DIRECTORIES
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # --scale: overlay the group-grain quotient oracles (the 10x/100x gates'
    # feasible twins of the node-grain recursive-CTE CC forms)
    if "--scale" in sys.argv:
        sp = f"{out_dir}/oracle_sql_scale.json"
        if os.path.exists(sp):
            overrides = json.load(open(sp))
            oracle.update(overrides)  # may also ADD oracles (rows-only at sf)
            print(f"[scale] overlaid {len(overrides)} quotient-grain oracles")

    fails, passes, skips = [], [], []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = canon(con.execute(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            fails.append((name, f"no spark output: {e}")); continue
        try:
            # staged scripts (";---STAGE---" separators): run every stage but
            # the last as a statement (CREATE TEMP TABLE ... materializations
            # — the decomposition that keeps a 5M-doc quotient oracle inside
            # DuckDB's allocator instead of re-deriving the signature table
            # within one monolithic recursive chain); the last stage SELECTs.
            stages = split_stages(sql)
            for st in stages[:-1]:
                con.execute(st)
            want = canon(con.execute(stages[-1]).df())
        except Exception as e:
            fails.append((name, f"oracle sql error: {e}")); continue
        if list(got.columns) != list(want.columns):
            fails.append((name, f"columns differ: spark={list(got.columns)} duck={list(want.columns)}")); continue
        for col in got.columns:  # surface dtype drift (int32 vs hugeint etc.)
            if str(got[col].dtype) != str(want[col].dtype):
                print(f"  [dtype] {name}.{col}: spark={got[col].dtype} duck={want[col].dtype}")
        if len(got) != len(want):
            fails.append((name, f"rowcount differ: spark={len(got)} duck={len(want)}")); continue
        bad = None
        for col in got.columns:
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not cmp_vals(x, y):
                    bad = f"col {col} row {i}: spark={x!r} duck={y!r}"
                    break
            if bad: break
        if bad: fails.append((name, bad))
        else: passes.append(name)

    print(f"PASS {len(passes)}: {' '.join(passes)}")
    if fails:
        print(f"FAIL {len(fails)}:")
        for n, why in fails:
            print(f"  {n}: {why}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
