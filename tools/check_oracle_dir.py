#!/usr/bin/env python3
"""check_oracle.py variant for SYNTHESIZED scale dirs (graft.ScaleData output).

Differences from the driver-mimicking tool:
- tables are directory-parquet (Spark writes `t.parquet/` part files), so
  views read a glob;
- events.ts tracks the driver corpus's physical form (Tables.events accepts
  both): from a NANOS-era corpus ScaleData writes BIGINT nanoseconds (Spark
  cannot write parquet TIMESTAMP(NANOS)) and the view truncates to
  microsecond TIMESTAMP; from a MICROS-era corpus (round 9+) ts passes
  through as TIMESTAMP already and needs no conversion. The tool probes the
  written type and applies the matching view, so either generation checks.

Usage: python3 tools/check_oracle_dir.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check_oracle import TABLES, run  # noqa: E402


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    views = {t: f"SELECT * FROM \'{sf_dir}/{t}.parquet/*.parquet\'" for t in TABLES}
    ts_type = duckdb.sql(
        "SELECT column_type FROM (DESCRIBE SELECT * FROM "
        f"'{sf_dir}/events.parquet/*.parquet') WHERE column_name = 'ts'"
    ).fetchone()[0]
    if ts_type == "BIGINT":
        # truncate-toward-zero ns->us division, matching Spark's `ts div
        # 1000` (Tables.events): DuckDB's // floors toward -inf, which would
        # differ by 1us on pre-1970 (negative-nanos) timestamps. Integer CASE
        # arithmetic, not float trunc -- ns magnitudes (~1.7e18) exceed
        # double's 2^53.
        views["events"] = (
            "SELECT * REPLACE (make_timestamp("
            "CASE WHEN ts >= 0 THEN ts // 1000 ELSE -((-ts) // 1000) END) AS ts) "
            f"FROM \'{sf_dir}/events.parquet/*.parquet\'")
    elif "TIMESTAMP_NS" in ts_type:
        # a TIMESTAMP_NS physical form would pass nanosecond precision
        # through while Tables.events truncates to micros -- normalize so
        # every physical form converges on microsecond TIMESTAMP.
        views["events"] = (
            "SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) "
            f"FROM \'{sf_dir}/events.parquet/*.parquet\'")
    run(views, out_dir)


if __name__ == "__main__":
    main()
