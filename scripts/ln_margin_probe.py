#!/usr/bin/env python3
"""Boundary-margin audit for the ln-derived integer-quantized gates.

sample_weighted_k's ln is PortableMath (engine-independent by
construction), but text_lm_score / text_nb_classify / text_kl_sources
still quantize libm-ln-derived doubles (floor(v*1e6+0.5) / q9). A 1-ulp
JVM-vs-DuckDB ln difference flips a gate only if some value sits within
~|v|*2.2e-16 of a rounding boundary. This probe measures the MINIMUM
distance of every quantized value to its nearest boundary at the gate's
scale factor, so the exposure is a measured number, not a guess.

Round-10 measurements at sf0.01 (margin = min |v - round(v)|, v the
pre-floor value):
  text_lm_score    q6  margin 3.5e-3  over 27165 values  (worst shift ~4e-9)
  text_nb_classify q6  margin 7.7e-4  over   640 values  (worst shift ~2e-9)
  nb priors        q6  margin 2.3e-1  over    20 values
  text_kl_sources  q9  margin 1.3e-4  over   520 values  (worst shift ~1e-7)
Safety factor >= ~1000x everywhere -> the 1-ulp risk is theoretical on
this corpus. Re-run after changing any of those oracles or the fixture.

Usage: python3 scripts/ln_margin_probe.py <sfDir> <verifyOutDir>
(<verifyOutDir>/oracle_sql.json must contain the three queries.)
"""
import json
import re
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def con(sf):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return c


def margin(sf, sql, value_expr, from_clause):
    head = sql[:sql.rstrip().rfind("\nSELECT")]
    q = (f"{head}\nSELECT min(abs({value_expr} - round({value_expr}))) AS margin, "
         f"count(*) AS n FROM {from_clause}")
    return con(sf).execute(q).fetchall()[0]


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    o = json.load(open(f"{outdir}/oracle_sql.json"))

    lm_v = ("(-ln((CAST(coalesce(bt.n, 0) AS DOUBLE) + 1.0) / "
            "(CAST(coalesce(c.n, 0) AS DOUBLE) + (CAST(s.vsize AS DOUBLE) + 1.0))) * 1e6 + 0.5)")
    print("text_lm_score q6:", margin(sf, o["text_lm_score"], lm_v,
          "pairs pr LEFT JOIN bigtop bt ON bt.p = pr.p AND bt.w = pr.w "
          "LEFT JOIN ctx c ON c.w = pr.p CROSS JOIN stats s"))

    nb_v = ("(-ln((CAST(coalesce(cn.n, 0) AS DOUBLE) + 1.0) / "
            "(CAST(ct.nt AS DOUBLE) + CAST(vs.vp AS DOUBLE))) * 1e6 + 0.5)")
    print("text_nb_classify cost q6:", margin(sf, o["text_nb_classify"], nb_v,
          "ctot ct CROSS JOIN vkeys vk CROSS JOIN vsize vs "
          "LEFT JOIN cnt cn ON cn.c = ct.c AND cn.w = vk.w"))
    pr_v = "(-ln(CAST(d.nd AS DOUBLE) / CAST(t.ndocs AS DOUBLE)) * 1e6 + 0.5)"
    print("text_nb_classify prior q6:", margin(sf, o["text_nb_classify"], pr_v,
          "dpri d CROSS JOIN tot t"))

    kl_sql = o["text_kl_sources"]
    m = re.search(r"terms AS \(.*?CAST\(floor\((.*?) \+ 0\.5\) AS BIGINT\) AS term_q9",
                  kl_sql, re.S)
    print("text_kl_sources q9:", margin(sf, kl_sql, f"({m.group(1)} + 0.5)", "grid"))


if __name__ == "__main__":
    main()
