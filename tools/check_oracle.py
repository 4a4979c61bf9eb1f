#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
SQL from oracle_sql.json in DuckDB (tables = the sfDir parquet files), sorts
columns by name, canonicalizes rows, and reports match/mismatch per query.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string repr with float rounding guard
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            out[c] = col.round(6)
        elif str(col.dtype).startswith("datetime"):
            out[c] = col.astype("datetime64[us]")
        else:
            out[c] = col
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def run(views, out_dir):
    """Compare every oracle in out_dir/oracle_sql.json against DuckDB views.

    `views` maps table name -> SELECT defining it (lets callers point at
    single-file parquet, directory-parquet globs, or transformed columns).
    """
    con = duckdb.connect()
    # bound DuckDB so a heavy oracle spills to disk instead of exhausting
    # the process (GRAFT_DUCKDB_MEM, e.g. "32GB"; unset = duckdb default)
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    for t, src in views.items():
        con.sql(f"CREATE VIEW {t} AS {src}")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # GRAFT_ORACLE_SKIP: comma-separated query names to exclude, for scale
    # dirs where an oracle is computationally infeasible IN DUCKDB (e.g.
    # dd5/dd5b's O(n^2 * dim) exact cosine referee at sf10's 200k vectors).
    # Skips are printed loudly -- an excluded query is a documented hole,
    # never a silent pass.
    skip = set(filter(None, os.environ.get("GRAFT_ORACLE_SKIP", "").split(",")))
    # GRAFT_ORACLE_ONLY: restrict to these name PREFIXES (for retrying a
    # batch in a fresh process after a resource-cascade failure) -- same
    # prefix semantics as the Spark-side SPARK_GRAFT_ONLY (Verify.scala uses
    # n.startsWith), so the same filter string selects the same queries on
    # both sides. An ONLY filter that selects nothing is an error, not a
    # green run: exit non-zero so a typo'd retry can't look like a pass.
    only = set(filter(None, os.environ.get("GRAFT_ORACLE_ONLY", "").split(",")))
    if only:
        oracles = {k: v for k, v in oracles.items()
                   if any(k.startswith(p) for p in only)}
        if not oracles:
            print(f"FAIL: GRAFT_ORACLE_ONLY={','.join(sorted(only))} "
                  "selected zero oracles -- nothing was checked")
            sys.exit(1)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if name in skip:
            print(f"SKIP {name} (GRAFT_ORACLE_SKIP)")
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(x.columns)}")
            n_bad += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(x)}")
            n_bad += 1
            continue
        # Driver hashes rendered values, so int 1 vs float 1.0 is a mismatch
        # even when numerically equal. Mirror that: dtype *kind* must agree
        # (signed/unsigned int treated as one family).
        fam = lambda k: "i" if k in "iu" else k
        kind_bad = [(c, str(g[c].dtype), str(x[c].dtype)) for c in g.columns
                    if fam(g[c].dtype.kind) != fam(x[c].dtype.kind)]
        if kind_bad:
            print(f"FAIL {name}: rendered-type mismatch {kind_bad}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e).splitlines()[-1] if str(e) else e}")
            # show first differing rows
            neq = (g != x) & ~(g.isna() & x.isna())
            bad_rows = neq.any(axis=1)
            print(g[bad_rows].head(3))
            print(x[bad_rows].head(3))
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(oracles)} total")
    sys.exit(1 if n_bad else 0)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    run({t: f"SELECT * FROM '{sf_dir}/{t}.parquet'" for t in TABLES}, out_dir)


if __name__ == "__main__":
    main()
