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
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = _fresh_con(sf_dir)
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
            # transient malloc failures under host contention poison the
            # connection's buffer accounting: retry on a FRESH connection
            # before reporting a phantom oracle error
            for attempt in range(4):
                try:
                    duck_df = con.execute(oracle[name]).fetch_arrow_table()
                    break
                except duckdb.OutOfMemoryException:
                    if attempt == 3: raise
                    import time; time.sleep(5 * (attempt + 1))
                    try: con.close()
                    except Exception: pass
                    con = _fresh_con(sf_dir)
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
