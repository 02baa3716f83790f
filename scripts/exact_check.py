#!/usr/bin/env python3
"""Strict replica of the driver's correctness gate: arrow-schema equality
plus bit-exact value comparison (check.py's 1e-6 float tolerance and
tz-stripping can hide driver-red mismatches — this cannot).

Usage: python3 scripts/exact_check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow.parquet as pq


def fresh_con(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # see check.py: cap the allocator so one query spills instead of
    # exhausting the HOST and poisoning every later row in the run
    con.execute("PRAGMA memory_limit='4GB'")
    con.execute("PRAGMA threads=4")
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    return con


class ConBox:
    def __init__(self, sf_dir):
        self.sf_dir = sf_dir
        self.con = fresh_con(sf_dir)

    def run(self, q_sql):
        """This host's neighbor contention makes malloc fail transiently
        (tiny-block bad_alloc with 100+ GB free), and a failed allocation
        can leave the connection's buffer accounting poisoned — retry on
        a FRESH connection instead of reporting a phantom failure. The
        connection is also rebuilt BEFORE each query so one row's OOM can
        never bleed into the next (round 8 lost 3 green rows that way)."""
        for attempt in range(4):
            try:
                self.con.close()
            except Exception:
                pass
            self.con = fresh_con(self.sf_dir)
            try:
                return self.con.execute(q_sql).arrow()
            except duckdb.OutOfMemoryException:
                if attempt == 3:
                    raise
                time.sleep(5 * (attempt + 1))


def main(sf_dir: str, out_dir: str) -> int:
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    box = ConBox(sf_dir)

    failures = []
    for q in sorted(sql):
        files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        if not files:
            failures.append((q, "no spark output"))
            continue
        spark_tbl = pq.read_table(files[0])
        oracle_tbl = box.run(sql[q])
        s_schema = {f.name: str(f.type) for f in spark_tbl.schema}
        o_schema = {f.name: str(f.type) for f in oracle_tbl.schema}
        if s_schema != o_schema:
            failures.append((q, f"schema {s_schema} != {o_schema}"))
            continue
        cols = sorted(s_schema)
        sp = spark_tbl.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
        oc = oracle_tbl.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(sp, oc, check_exact=True)
            print(f"EXACT {q} ({len(sp)} rows)")
        except AssertionError as e:
            failures.append((q, str(e).split("\n")[0]))

    for q, why in failures:
        print(f"FAIL  {q}: {why}")
    print(f"\n{len(sql) - len(failures)} exact, {len(failures)} fail")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
