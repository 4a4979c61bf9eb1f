#!/usr/bin/env python3
"""DuckDB-side horizon proof for ses1_exp_smoothing (the ADVICE r11 ask).

The driver corpus spans 30 days, so the correctness gate never exercises
ses1's t > 62 two-factor pow2 branch (where a single 64-bit shift would
wrap mod 64) or the t > 90 exactness horizon (HUGEINT/decimal(38,0)
headroom). The Scala side is pinned by ExpSmoothingSpec's 130-day fixture;
this tool pins the DUCKDB side of the same contract: it builds the
identical 130-day synthetic series, runs the ses1 oracle SQL from a Verify
dump, and checks every row against an exact python-int replay of the
literal recursion S_t = (x_t + S_{t-1}) / 2 — non-NULL and exact for
t <= 90, NULL for t > 90.

Usage: python3 tools/test_ses1_horizon.py [verifyOutDir]
  (default target/verify_out — must contain oracle_sql.json)
"""
import json
import os
import sys
import tempfile

import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "target/verify_out"
with open(f"{out_dir}/oracle_sql.json") as f:
    sql = json.load(f)["ses1_exp_smoothing"]

# the same 130-day fixture as ExpSmoothingSpec: day i carries
# cents = (i*13) % 97 + 1, one purchase at noon
days = 130
rows = pd.DataFrame({
    "event_id": range(days),
    "ts": pd.to_datetime("2024-01-01 12:00:00") + pd.to_timedelta(range(days), unit="D"),
    "user_id": 1,
    "event_type": "purchase",
    "value": [((i * 13) % 97 + 1) / 100.0 for i in range(days)],
    "props": "{}",
})
tmp = tempfile.mkdtemp(prefix="ses1h")
path = os.path.join(tmp, "events.parquet")
rows.to_parquet(path)

con = duckdb.connect()
con.sql(f"CREATE VIEW events AS SELECT * FROM '{path}'")
got = con.sql(sql).fetchall()
assert len(got) == days, f"expected {days} rows, got {len(got)}"

u = 0
bad = 0
for i, (day, cents, smoothed) in enumerate(sorted(got)):
    t = i + 1
    expect_cents = (i * 13) % 97 + 1
    assert cents == expect_cents, f"{day}: cents {cents} != {expect_cents}"
    u += cents if t == 1 else cents << (t - 2)
    if t <= 90:
        expect = u >> (t - 1)
        if smoothed != expect:
            print(f"FAIL {day} (t={t}): duckdb {smoothed}, recursion {expect}")
            bad += 1
    else:
        if smoothed is not None:
            print(f"FAIL {day} (t={t}): past-horizon row not NULL ({smoothed})")
            bad += 1

if bad:
    print(f"{bad} mismatching rows")
    sys.exit(1)

# ── magnitude-contract fixture (ExpSmoothingSpec's bound-crossing twin):
# |cents| > 3.2e11 contributes 0 and NULLs every row from the breach on;
# a day exactly AT the bound stays exact. Proves the DuckDB side of the
# symmetric guard — the HUGEINT exact-then-error divergence is unreachable.
BOUND = 320_000_000_000
cents_by_day = [100, BOUND, 500, BOUND + 100, 700]
rows2 = pd.DataFrame({
    "event_id": range(5),
    "ts": pd.to_datetime("2024-01-01 12:00:00") + pd.to_timedelta(range(5), unit="D"),
    "user_id": 1,
    "event_type": "purchase",
    "value": [c / 100.0 for c in cents_by_day],
    "props": "{}",
})
path2 = os.path.join(tmp, "events2.parquet")
rows2.to_parquet(path2)
con2 = duckdb.connect()
con2.sql(f"CREATE VIEW events AS SELECT * FROM '{path2}'")
got2 = sorted(con2.sql(sql).fetchall())
assert len(got2) == 5, f"expected 5 rows, got {len(got2)}"
u = 0
for i, (day, cents, smoothed) in enumerate(got2):
    t = i + 1
    assert cents == cents_by_day[i], f"{day}: cents {cents} != {cents_by_day[i]}"
    u += cents if t == 1 else cents << (t - 2)
    if t <= 3:  # at-bound day 2 is inside the contract
        expect = u >> (t - 1)
        if smoothed != expect:
            print(f"FAIL {day} (t={t}): duckdb {smoothed}, recursion {expect}")
            bad += 1
    elif smoothed is not None:
        print(f"FAIL {day} (t={t}): post-breach row not NULL ({smoothed})")
        bad += 1
if bad:
    print(f"{bad} mismatching rows in the magnitude fixture")
    sys.exit(1)
print("ok: duckdb ses1 exact through t=90 (incl. the t>62 two-factor pow2 "
      "branch), NULL for t=91..130 — matches the python-int recursion and "
      "the Scala-side ExpSmoothingSpec fixture; magnitude guard NULLs "
      "symmetrically from the first >3.2e11-cents day onward")
