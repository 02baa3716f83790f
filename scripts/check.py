#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (Spark result) and runs
<outDir>/oracle_sql.json[name] in DuckDB with the sf tables registered as
views; compares row counts, column names, and values (sorted rows/cols,
float tolerance).
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa
import os

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    # df: list of dicts -> sorted rows of stringified values, cols sorted by name
    cols = sorted(df.column_names)
    data = df.select(cols).to_pylist()
    def norm(v):
        if v is None: return None
        if isinstance(v, float):
            if math.isnan(v): return "nan"
            return round(v, 6)
        if isinstance(v, list): return tuple(norm(x) for x in v)
        try:
            import decimal, datetime
            if isinstance(v, decimal.Decimal): return round(float(v), 6)
            if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
        except Exception: pass
        return v
    rows = sorted([tuple(norm(r[c]) for c in cols) for r in data], key=lambda t: tuple(str(x) for x in t))
    return cols, rows

def _fresh_con(sf_dir):
    con = duckdb.connect()
    # Cap DuckDB's allocator well below the host's free memory: under
    # neighbor contention the default (80% of RAM) lets one query's hash
    # table push the HOST into exhaustion, after which even 16 KiB mallocs
    # fail and every later query in the run reports a phantom OOM (round 8
    # lost 3 green rows this way). 4 GB is ~100x what any sf0.01 oracle
    # needs; with the cap, a too-big query spills instead of killing the run.
    con.execute("PRAGMA memory_limit='4GB'")
    con.execute("PRAGMA threads=4")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _run_oracle(sf_dir, sql):
    # One FRESH connection per query: a prior query's OOM poisons the shared
    # connection's buffer accounting, turning every subsequent row red. A
    # per-query connection costs ~ms (views over parquet are lazy) and makes
    # rows independent. Retry once on OOM after a backoff for transient host
    # exhaustion.
    for attempt in range(2):
        con = _fresh_con(sf_dir)
        try:
            return con.execute(sql).fetch_arrow_table()
        except duckdb.OutOfMemoryException:
            if attempt == 1: raise
            import time; time.sleep(10)
        finally:
            try: con.close()
            except Exception: pass


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p): continue
        spark_df = pq.read_table(p)
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({spark_df.num_rows} rows)")
            n_skip += 1
            continue
        try:
            duck_df = _run_oracle(sf_dir, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
