#!/usr/bin/env python3
"""Oracle-SQL memory audit: the minimum DuckDB memory_limit tier at which
each oracle completes WITHOUT spill (temp_directory disabled).

Why this exists: the driver's correctness gate runs the oracle SQL on a
host we don't control, under unknown memory pressure. In rounds 8-9 a
GREEN query was reported red after a host-level malloc failure; the
repo-side lever is keeping every oracle's no-spill peak tiny. DuckDB
inlines non-MATERIALIZED CTEs once per reference, so an innocent-looking
fan-out (a 32-branch UNION ALL consumed by a self-join, an unrolled
iteration chain) can multiply the live plan until fixed per-operator
allocations dominate — kilobyte inputs peaking at 1 GB. `AS MATERIALIZED`
on the fan-out CTE is the fix.

Usage: python3 scripts/mem_audit.py <sfDir> <verifyOutDir>
Maintained bar (end of round 10): every oracle passes at <= 128MB;
anything above 128MB is a regression to fix before shipping the round.
"""
import json, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
TIERS = ["64MB", "128MB", "256MB", "512MB", "1GB", "4GB"]
BAR = "128MB"


def try_run(sf_dir, sql, limit):
    con = duckdb.connect()
    try:
        con.execute(f"PRAGMA memory_limit='{limit}'")
        con.execute("PRAGMA threads=2")
        con.execute("SET temp_directory=''")  # no spill: pure in-memory peak
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        con.execute(sql).fetchall()
        return True
    except duckdb.OutOfMemoryException:
        return False
    finally:
        con.close()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    over_bar = []
    for name, sql in sorted(oracles.items()):
        tier = next((t for t in TIERS if try_run(sf_dir, sql, t)), ">4GB")
        over = tier not in TIERS or TIERS.index(tier) > TIERS.index(BAR)
        print(f"{name:35s} {tier:>6s}{'  <-- over bar' if over else ''}", flush=True)
        if over:
            over_bar.append((name, tier))
    if over_bar:
        print(f"\nFAIL: {len(over_bar)} oracle(s) over the {BAR} bar: {over_bar}")
        sys.exit(1)
    print(f"\nOK: all {len(oracles)} oracles within {BAR} (no-spill)")


if __name__ == "__main__":
    main()
