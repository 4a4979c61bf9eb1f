#!/usr/bin/env python3
"""Wedge count of gr2/gr4's degree-oriented co-purchase graph at a scale
dir (VERDICT r13 directive 1: pin the graph family's sfN cost curves to
wedge count, not plan behavior). The wedge count is the row count of the
plans' dominant join (dir e1 JOIN dir e2 ON e1.dst = e2.src) = sum over
nodes of indeg(v) * outdeg(v) in the degree-oriented edge set — computed
here directly from the orientation, so it is the EXACT intermediate
cardinality both gr2 and gr4 materialize.

Usage: python3 tools/wedge_count.py <sfDir> [<sfDir> ...]
  sfDir may be driver testdata (single .parquet file) or ScaleData output
  (directory of part files).
"""
import os
import sys

import duckdb


def wedges(sf_dir):
    li = f"{sf_dir}/lineitem.parquet"
    src = f"'{li}/*.parquet'" if os.path.isdir(li) else f"'{li}'"
    q = f"""
    WITH base AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
                  FROM {src} WHERE l_quantity >= 40),
    hot AS (SELECT o FROM base GROUP BY o HAVING count(*) > 25),
    bc AS (SELECT b.o, b.s FROM base b
           WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = b.o)),
    e AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
          FROM bc x JOIN bc y ON x.o = y.o AND x.s < y.s),
    deg AS MATERIALIZED (SELECT n, count(*) AS d
            FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
    dir AS MATERIALIZED (
      SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
             CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst
      FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
    io AS (SELECT node, sum(i) AS indeg, sum(o) AS outdeg FROM (
             SELECT dst AS node, 1 AS i, 0 AS o FROM dir
             UNION ALL SELECT src, 0, 1 FROM dir) GROUP BY 1)
    SELECT (SELECT count(*) FROM e) AS n_edges,
           CAST(sum(indeg * outdeg) AS BIGINT) AS n_wedges FROM io
    """
    return duckdb.sql(q).fetchone()


if __name__ == "__main__":
    for d in sys.argv[1:]:
        n_edges, n_wedges = wedges(d)
        print(f"{d}: edges={n_edges} wedges={n_wedges}")
