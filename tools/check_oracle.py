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


def md5_bucket(col):
    """16-bit md5 bucket of a key column — graft.operators.Sampling's bucket
    expressed in DuckDB SQL (same hex-nibble arithmetic on both engines)."""
    return (
        f"(strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 1, 1)) - 1) * 4096"
        f" + (strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 2, 1)) - 1) * 256"
        f" + (strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 3, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 4, 1)) - 1)")


MD5_BUCKET = md5_bucket("vec_id")


def referee_neardup(con, out_dir, threshold=0.45, target_sample=3000):
    """Scale-feasible exact referee for dd5/dd5b (GRAFT_NEARDUP_REFEREE=1).

    The full DuckDB oracle for the exact near-dup pair set is O(n**2 * dim)
    -- infeasible past ~20k vectors (sf10 is 200k -> 2e10 pair-cosines).
    This referee checks the SAME result exactly in O(result + sample**2):

      1. SOUNDNESS: every pair dd5 reported is recomputed in DuckDB from the
         raw embeddings -- orientation (i < j), no duplicates, exact rounded
         cosine value, and value >= threshold. O(|result| * dim).
      2. COMPLETENESS (sampled): a deterministic md5-bucket vector sample
         (the sp1/dd5c pattern, ~target_sample vectors at any corpus size)
         is exhaustively paired in DuckDB; every qualifying sampled pair
         must appear in dd5's reported set. A dropped-pair bug surfaces
         here with probability -> 1 as dropped pairs accumulate.
      3. dd5b CONSISTENCY: its n_exact must equal the (now verified) dd5
         pair count, and recall_ok must be 1.

    Returns (n_ok, n_bad) over the two query names.
    """
    n_ok = n_bad = 0
    rep = f"{out_dir}/dd5_embedding_neardup/*.parquet"
    con.sql("CREATE OR REPLACE TEMP TABLE ref_e AS "
            "SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS v, "
            "sqrt(array_inner_product(CAST(embedding AS DOUBLE[64]), "
            "CAST(embedding AS DOUBLE[64]))) AS nrm FROM embeddings")
    con.sql(f"CREATE OR REPLACE TEMP TABLE ref_rep AS SELECT * FROM '{rep}'")
    n_rep = con.sql("SELECT count(*) FROM ref_rep").fetchone()[0]
    bad_shape = con.sql(
        "SELECT count(*) FROM (SELECT i, j FROM ref_rep WHERE i >= j "
        "UNION ALL SELECT i, j FROM ref_rep GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    bad_val = con.sql(
        "SELECT count(*) FROM ref_rep r "
        "LEFT JOIN ref_e a ON a.vec_id = r.i LEFT JOIN ref_e b ON b.vec_id = r.j "
        "WHERE a.vec_id IS NULL OR b.vec_id IS NULL "
        f"OR round(array_inner_product(a.v, b.v) / (a.nrm * b.nrm), 4) <> r.cos_sim "
        f"OR r.cos_sim < {threshold}").fetchone()[0]
    n = con.sql("SELECT count(*) FROM ref_e").fetchone()[0]
    t = min(65536, 65536 * target_sample // n)
    con.sql("CREATE OR REPLACE TEMP TABLE ref_s AS "
            f"SELECT * FROM ref_e WHERE {MD5_BUCKET} < {t}")
    n_s = con.sql("SELECT count(*) FROM ref_s").fetchone()[0]
    qual, missing = con.sql(
        "SELECT count(*), count(*) FILTER (r.i IS NULL) "
        "FROM ref_s a JOIN ref_s b ON a.vec_id < b.vec_id "
        "LEFT JOIN ref_rep r ON r.i = a.vec_id AND r.j = b.vec_id "
        f"WHERE round(array_inner_product(a.v, b.v) / (a.nrm * b.nrm), 4) "
        f">= {threshold}").fetchone()
    if bad_shape or bad_val or missing:
        print(f"FAIL dd5_embedding_neardup (sampled-referee: shape={bad_shape} "
              f"value={bad_val} missing-from-sample={missing}/{qual})")
        n_bad += 1
    else:
        print(f"ok   dd5_embedding_neardup ({n_rep} rows, sampled-referee: "
              f"all sound; {qual} qualifying pairs over {n_s} sampled vectors "
              "all present)")
        n_ok += 1
    b = con.sql("SELECT n_exact, recall_ok FROM "
                f"'{out_dir}/dd5b_embedding_neardup_lsh/*.parquet'").fetchone()
    if b[0] == n_rep and b[1] == 1 and not (bad_shape or bad_val or missing):
        print(f"ok   dd5b_embedding_neardup_lsh (1 rows, referee: n_exact="
              f"{b[0]} == verified dd5 pair count, recall_ok=1)")
        n_ok += 1
    else:
        print(f"FAIL dd5b_embedding_neardup_lsh (n_exact={b[0]} vs verified "
              f"{n_rep}, recall_ok={b[1]})")
        n_bad += 1
    return n_ok, n_bad


def referee_jaccard(con, out_dir, threshold=0.8, target_sample=2000):
    """Scale-feasible exact referee for dd2 (GRAFT_NGRAM_REFEREE=1).

    dd2's full DuckDB oracle builds the distinct-3-gram-shingle table for the
    WHOLE corpus and self-joins it on shingle -- its spill exceeds this box's
    disk past ~500k documents (sf30 is 1.5M). Jaccard is a pure pair-local
    function of the two documents' shingle sets, so the dd5 referee pattern
    (tools/check_oracle.py referee_neardup; SURVEY.md X89) transfers exactly:

      1. SOUNDNESS: every pair dd2 reported is recomputed from raw text, with
         shingles built ONLY for documents that appear in a reported pair --
         orientation (a < b), no duplicates, exact rounded jaccard, and
         unrounded jaccard >= threshold (the oracle's WHERE semantics).
         O(|result| * shingles-per-doc).
      2. COMPLETENESS (sampled, two subsets): the FULL oracle pipeline runs
         on two deterministic document subsets -- restricting the corpus
         cannot change a sampled doc's own shingle set, so subset-pair
         jaccards are exact -- and every qualifying subset pair must appear
         in dd2's reported set.
         (a) an md5-bucket sample (~target_sample docs): unbiased, but
             qualifying pairs need BOTH endpoints sampled, and >=0.8
             near-dups are sparse planted pairs, so its expected hit count
             scales as |result|*(s/n)^2 -- meaningful at sf1, vacuous by
             sf30. It stays as the unbiased guard;
         (b) the first target_sample doc_ids (the base-corpus block --
             ScaleData replica 0 IS the driver corpus): contains planted
             near-dup pairs at base density at EVERY scale factor, so this
             block keeps a ~constant, non-vacuous qualifying-pair count as
             the corpus grows;
         (c) an md5-bucket sample of candidate PAIRS, not docs: the full
             shingle table is linear to build, and the pair-key bucket
             predicate sits INSIDE the shingle self-join, so only the
             sampled fraction of matches ever reaches aggregation state --
             the spill that killed the full oracle scales down by the
             sample rate while the ENUMERATION stays exhaustive. With
             rate = target_sample/n_docs and qualifying pairs growing ~
             linearly with n, the expected sampled-qualifying count is
             ~constant at every scale factor (unlike (a)'s (s/n)^2 decay),
             and coverage is unbiased over the whole corpus (unlike (b)'s
             fixed block).

    Returns (n_ok, n_bad) over the one query name.
    """
    rep = f"{out_dir}/dd2_ngram_jaccard/*.parquet"
    con.sql(f"CREATE OR REPLACE TEMP TABLE jrep AS SELECT * FROM '{rep}'")
    n_rep = con.sql("SELECT count(*) FROM jrep").fetchone()[0]
    bad_shape = con.sql(
        "SELECT count(*) FROM (SELECT a, b FROM jrep WHERE a >= b "
        "UNION ALL SELECT a, b FROM jrep GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    shingles = (
        "SELECT DISTINCT doc_id, toks[r.range+1] || ' ' || toks[r.range+2] "
        "|| ' ' || toks[r.range+3] AS sh "
        "FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks "
        "      FROM documents WHERE doc_id IN (SELECT doc_id FROM {docs})) t, "
        "range(1024) r WHERE r.range < len(toks) - 2")
    # soundness: rebuild shingle sets for involved docs only, recompute
    con.sql("CREATE OR REPLACE TEMP TABLE jdocs AS "
            "SELECT DISTINCT a AS doc_id FROM jrep "
            "UNION SELECT DISTINCT b FROM jrep")
    con.sql("CREATE OR REPLACE TEMP TABLE jsh AS " + shingles.format(docs="jdocs"))
    con.sql("CREATE OR REPLACE TEMP TABLE jsz AS "
            "SELECT doc_id, count(*) AS sz FROM jsh GROUP BY doc_id")
    bad_val = con.sql(
        "SELECT count(*) FROM jrep r "
        "LEFT JOIN (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter "
        "           FROM jsh x JOIN jsh y ON y.sh = x.sh AND x.doc_id < y.doc_id "
        "           GROUP BY 1, 2) i ON i.a = r.a AND i.b = r.b "
        "LEFT JOIN jsz sa ON sa.doc_id = r.a LEFT JOIN jsz sb ON sb.doc_id = r.b "
        "WHERE i.inter IS NULL OR sa.sz IS NULL OR sb.sz IS NULL "
        "OR round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 4) <> r.jaccard "
        f"OR i.inter * 1.0 / (sa.sz + sb.sz - i.inter) < {threshold}"
    ).fetchone()[0]
    # sampled completeness: full oracle pipeline on an md5-bucket doc subset
    n = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    t = min(65536, 65536 * target_sample // n)
    con.sql("CREATE OR REPLACE TEMP TABLE jsdoc AS SELECT doc_id "
            f"FROM documents WHERE {md5_bucket('doc_id')} < {t}")
    n_s = con.sql("SELECT count(*) FROM jsdoc").fetchone()[0]
    con.sql("CREATE OR REPLACE TEMP TABLE jshs AS " + shingles.format(docs="jsdoc"))
    def subset_completeness(sh_table):
        return con.sql(
            "SELECT count(*), count(*) FILTER (r.a IS NULL) FROM "
            "(SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter "
            f" FROM {sh_table} x JOIN {sh_table} y "
            "   ON y.sh = x.sh AND x.doc_id < y.doc_id GROUP BY 1, 2) i "
            "JOIN (SELECT doc_id, count(*) AS sz FROM "
            f"      {sh_table} GROUP BY doc_id) sa ON sa.doc_id = i.a "
            "JOIN (SELECT doc_id, count(*) AS sz FROM "
            f"      {sh_table} GROUP BY doc_id) sb ON sb.doc_id = i.b "
            "LEFT JOIN jrep r ON r.a = i.a AND r.b = i.b "
            f"WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= {threshold}"
        ).fetchone()

    qual, missing = subset_completeness("jshs")
    con.sql("CREATE OR REPLACE TEMP TABLE jbdoc AS SELECT doc_id "
            f"FROM documents ORDER BY doc_id LIMIT {target_sample}")
    con.sql("CREATE OR REPLACE TEMP TABLE jshb AS " + shingles.format(docs="jbdoc"))
    qual_b, missing_b = subset_completeness("jshb")
    # pair-sampled completeness (c): full linear shingle table; the ordered
    # pair-key bucket predicate filters matches inside the self-join, so
    # aggregation state is rate * |matches| while enumeration covers every
    # candidate pair in the corpus. The predicate is a pure function of
    # (a, b), so a sampled pair keeps ALL its shingle matches -- its
    # intersection count, and hence its jaccard, is exact.
    con.sql("CREATE OR REPLACE TEMP TABLE jshf AS "
            + shingles.format(docs="documents"))
    con.sql("CREATE OR REPLACE TEMP TABLE jszf AS "
            "SELECT doc_id, count(*) AS sz FROM jshf GROUP BY doc_id")
    t_pair = min(65536, max(1, 65536 * target_sample // max(n, 1)))
    pair_key = md5_bucket("x.doc_id || '|' || y.doc_id")
    qual_p, missing_p = con.sql(
        "SELECT count(*), count(*) FILTER (r.a IS NULL) FROM "
        "(SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter "
        " FROM jshf x JOIN jshf y ON y.sh = x.sh AND x.doc_id < y.doc_id "
        f"   AND {pair_key} < {t_pair} GROUP BY 1, 2) i "
        "JOIN jszf sa ON sa.doc_id = i.a JOIN jszf sb ON sb.doc_id = i.b "
        "LEFT JOIN jrep r ON r.a = i.a AND r.b = i.b "
        f"WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= {threshold}"
    ).fetchone()
    if bad_shape or bad_val or missing or missing_b or missing_p:
        print(f"FAIL dd2_ngram_jaccard (jaccard-referee: shape={bad_shape} "
              f"value={bad_val} missing-from-sample={missing}/{qual} "
              f"missing-from-base-block={missing_b}/{qual_b} "
              f"missing-from-pair-sample={missing_p}/{qual_p})")
        return 0, 1
    print(f"ok   dd2_ngram_jaccard ({n_rep} rows, jaccard-referee: all sound; "
          f"{qual} qualifying pairs over {n_s} sampled docs, {qual_b} over "
          f"the {target_sample}-doc base block, and {qual_p} over the "
          f"{t_pair}/65536 pair sample all present)")
    return 1, 0


def referee_fm2(con, out_dir, minsup=3, cap=60):
    """Scale-feasible exact referee for fm2 (GRAFT_FM2_REFEREE=1).

    fm2's full oracle materializes the customer-basket pair aggregate
    (~1e9 distinct pairs at sf10) before the Apriori-pruned triple count
    -- out-spilled a 73 GB disk. ScaleData's replica structure makes an
    exact referee cheap: part AND customer key spaces are offset per
    replica, so baskets never span replicas and every triple's support is
    replica-local.

      1. SOUNDNESS + support exactness: every reported triple's support
         and its three sub-pair supports are recomputed exactly over
         baskets RESTRICTED to the reported parts (a pair/triple's
         supporting customers all hold both/all parts, so the restriction
         loses nothing); the row passes iff recomputed == reported,
         support >= minsup, and all three sub-pairs are frequent. The
         basket-size cap is priced GLOBALLY (one distinct agg over the
         full basket table) exactly as the query does.
      2. COMPLETENESS (base block): the full fm2 pipeline re-run over the
         first 1/GRAFT_SCALE_REPS of the customer AND part key spaces
         (= ScaleData replica 0 when the env var matches the generation;
         any key-range block is SOUND -- cross-replica baskets don't
         exist, so a misaligned block only weakens the check, never
         false-fails) must be exactly the reported rows in that range.

    Returns (n_ok, n_bad) over the one query name.
    """
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "100"))
    rep = f"{out_dir}/fm2_frequent_triples/*.parquet"
    con.sql(f"CREATE OR REPLACE TEMP TABLE frep AS SELECT * FROM '{rep}'")
    n_rep = con.sql("SELECT count(*) FROM frep").fetchone()[0]
    bad_shape = con.sql(
        "SELECT count(*) FROM ("
        "  SELECT pa FROM frep WHERE NOT (pa < pb AND pb < pc) "
        f"  UNION ALL SELECT pa FROM frep WHERE support < {minsup} "
        "  UNION ALL SELECT pa FROM frep GROUP BY pa, pb, pc HAVING count(*) > 1)"
    ).fetchone()[0]
    con.sql("CREATE OR REPLACE TEMP TABLE fbb AS "
            "SELECT DISTINCT o_custkey AS c, l_partkey AS p "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
    con.sql("CREATE OR REPLACE TEMP TABLE fok AS "
            f"SELECT c FROM (SELECT c, count(*) n FROM fbb GROUP BY 1) WHERE n <= {cap}")
    con.sql("CREATE OR REPLACE TEMP TABLE fsb AS "
            "SELECT b.c, b.p FROM fbb b JOIN fok USING (c) "
            "WHERE b.p IN (SELECT pa FROM frep UNION SELECT pb FROM frep "
            "              UNION SELECT pc FROM frep)")
    # exact support of every reported triple and sub-pair over the
    # restricted baskets (group state = |reported| rows)
    bad_val = con.sql(
        "WITH ts AS (SELECT r.pa, r.pb, r.pc, r.support, count(x.c) AS s "
        "  FROM frep r "
        "  LEFT JOIN fsb x ON x.p = r.pa "
        "  JOIN fsb y ON y.p = r.pb AND y.c = x.c "
        "  JOIN fsb z ON z.p = r.pc AND z.c = x.c "
        "  GROUP BY 1, 2, 3, 4), "
        "ps AS (SELECT x.p AS a, y.p AS b, count(*) AS s "
        "  FROM fsb x JOIN fsb y ON y.c = x.c AND x.p < y.p GROUP BY 1, 2) "
        "SELECT count(*) FROM ts "
        "LEFT JOIN ps p1 ON p1.a = ts.pa AND p1.b = ts.pb "
        "LEFT JOIN ps p2 ON p2.a = ts.pa AND p2.b = ts.pc "
        "LEFT JOIN ps p3 ON p3.a = ts.pb AND p3.b = ts.pc "
        "WHERE ts.s IS DISTINCT FROM ts.support "
        f"   OR coalesce(p1.s, 0) < {minsup} OR coalesce(p2.s, 0) < {minsup} "
        f"   OR coalesce(p3.s, 0) < {minsup}"
    ).fetchone()[0]
    # completeness: full pipeline over the replica-0 key block
    cmax = con.sql("SELECT max(o_custkey) FROM orders").fetchone()[0]
    pmax = con.sql("SELECT max(l_partkey) FROM lineitem").fetchone()[0]
    cb, pb_ = cmax // reps + 1, pmax // reps + 1
    qual, missing = con.sql(
        f"WITH bb AS (SELECT c, p FROM fbb WHERE c <= {cb} AND p <= {pb_}), "
        f"ok2 AS (SELECT c FROM (SELECT c, count(*) n FROM bb GROUP BY 1) WHERE n <= {cap}), "
        "b2 AS (SELECT bb.c, bb.p FROM bb JOIN ok2 USING (c)), "
        "pr AS (SELECT x.p pa, y.p pb, count(*) s FROM b2 x "
        "       JOIN b2 y ON x.c = y.c AND x.p < y.p GROUP BY 1, 2), "
        f"fp AS (SELECT pa, pb FROM pr WHERE s >= {minsup}), "
        "tr AS (SELECT x.p pa, y.p pb, z.p pc, count(*) s "
        "       FROM b2 x JOIN b2 y ON x.c = y.c AND x.p < y.p "
        "       JOIN fp f1 ON f1.pa = x.p AND f1.pb = y.p "
        "       JOIN b2 z ON y.c = z.c AND y.p < z.p "
        "       JOIN fp f2 ON f2.pa = x.p AND f2.pb = z.p "
        "       JOIN fp f3 ON f3.pa = y.p AND f3.pb = z.p "
        f"      GROUP BY 1, 2, 3), q AS (SELECT * FROM tr WHERE s >= {minsup}) "
        "SELECT count(*), count(*) FILTER (r.pa IS NULL) FROM q "
        "LEFT JOIN frep r ON r.pa = q.pa AND r.pb = q.pb AND r.pc = q.pc "
        "  AND r.support = q.s"
    ).fetchone()
    if bad_shape or bad_val or missing:
        print(f"FAIL fm2_frequent_triples (fm2-referee: shape={bad_shape} "
              f"unsound={bad_val} missing-from-base-block={missing}/{qual})")
        return 0, 1
    print(f"ok   fm2_frequent_triples ({n_rep} rows, fm2-referee: every "
          f"reported support and sub-pair frequency recomputed exactly; "
          f"{qual} qualifying triples over the replica-0 block all present)")
    return 1, 0


def referee_substr(con, out_dir, cap=20, block=2000):
    """Scale-feasible exact referee for dd8 (GRAFT_SUBSTR_REFEREE=1).

    dd8's full oracle self-joins the stride-4 30-char-window table and
    DISTINCTs the pair output -- ~60 GB of spill at sf10 (BENCH_SCALE.md)
    and disk-infeasible a decade later. The X89 referee pattern transfers,
    with one twist the jaccard referee doesn't have: the df-cap (window
    document-frequency <= 20) is a CORPUS-GLOBAL property, so a pair's
    membership can't be recomputed from the pair's two documents alone,
    and restricting the corpus only LOWERS df -- a block-local rerun would
    admit pairs the full corpus suppresses. Both checks therefore price
    the cap from the full corpus via one linear window scan filtered to a
    bounded window set (state = sum of df over that set, O(result + block)
    windows, never the all-pairs join):

      1. SOUNDNESS: every reported pair must share >= 1 window whose
         GLOBAL df <= cap. Windows are rebuilt only for involved docs;
         their global df comes from the filtered corpus scan.
      2. COMPLETENESS (deterministic base block): among the first `block`
         doc_ids (ScaleData replica 0 = the driver corpus, planted-dup
         density preserved at every SF), every pair sharing a window with
         GLOBAL df <= cap must appear in dd8's report. Window sets are
         doc-local, so the block's candidate pairs are exact.

    Returns (n_ok, n_bad) over the one query name.
    """
    rep = f"{out_dir}/dd8_substring_dup/*.parquet"
    con.sql(f"CREATE OR REPLACE TEMP TABLE srep AS SELECT * FROM '{rep}'")
    n_rep = con.sql("SELECT count(*) FROM srep").fetchone()[0]
    bad_shape = con.sql(
        "SELECT count(*) FROM (SELECT a, b FROM srep WHERE a >= b "
        "UNION ALL SELECT a, b FROM srep GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    # window generation for a doc subset -- mirrors the dd8 oracle exactly:
    # stride-4 positions 1, 5, ... over docs of length >= 30, distinct per doc
    wins = (
        "SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 30) AS win "
        "FROM (SELECT doc_id, text, "
        "        unnest(range(1, CAST(length(text) AS BIGINT) - 28, 4)) AS i "
        "      FROM documents WHERE length(text) >= 30 "
        "        AND doc_id IN (SELECT doc_id FROM {docs}))")
    con.sql("CREATE OR REPLACE TEMP TABLE sdocs AS "
            "SELECT DISTINCT a AS doc_id FROM srep "
            "UNION SELECT DISTINCT b FROM srep")
    con.sql("CREATE OR REPLACE TEMP TABLE swin AS " + wins.format(docs="sdocs"))
    con.sql("CREATE OR REPLACE TEMP TABLE sbdoc AS SELECT doc_id "
            f"FROM documents ORDER BY doc_id LIMIT {block}")
    con.sql("CREATE OR REPLACE TEMP TABLE sbwin AS " + wins.format(docs="sbdoc"))
    # one linear corpus scan prices the global df for every window either
    # check needs; the IN-set filter runs BEFORE the aggregate, so group
    # state is bounded by the candidate window set, not the corpus
    con.sql("CREATE OR REPLACE TEMP TABLE sdf AS "
            "SELECT win, count(DISTINCT doc_id) AS df FROM "
            "(SELECT doc_id, substr(text, CAST(i AS INTEGER), 30) AS win "
            " FROM (SELECT doc_id, text, "
            "         unnest(range(1, CAST(length(text) AS BIGINT) - 28, 4)) AS i "
            "       FROM documents WHERE length(text) >= 30)) "
            "WHERE win IN (SELECT win FROM swin UNION SELECT win FROM sbwin) "
            "GROUP BY win")
    bad_val = con.sql(
        "SELECT count(*) FROM srep r LEFT JOIN "
        "(SELECT DISTINCT x.doc_id AS a, y.doc_id AS b "
        " FROM swin x JOIN swin y ON y.win = x.win AND x.doc_id < y.doc_id "
        f" JOIN sdf k ON k.win = x.win AND k.df <= {cap}) ok "
        "ON ok.a = r.a AND ok.b = r.b WHERE ok.a IS NULL"
    ).fetchone()[0]
    qual_b, missing_b = con.sql(
        "SELECT count(*), count(*) FILTER (r.a IS NULL) FROM "
        "(SELECT DISTINCT x.doc_id AS a, y.doc_id AS b "
        " FROM sbwin x JOIN sbwin y ON y.win = x.win AND x.doc_id < y.doc_id "
        f" JOIN sdf k ON k.win = x.win AND k.df <= {cap}) i "
        "LEFT JOIN srep r ON r.a = i.a AND r.b = i.b"
    ).fetchone()
    if bad_shape or bad_val or missing_b:
        print(f"FAIL dd8_substring_dup (substr-referee: shape={bad_shape} "
              f"unsound={bad_val} missing-from-base-block={missing_b}/{qual_b})")
        return 0, 1
    print(f"ok   dd8_substring_dup ({n_rep} rows, substr-referee: all sound "
          f"under the global df cap; {qual_b} qualifying pairs over the "
          f"{block}-doc base block all present)")
    return 1, 0


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
    n_total = len(oracles)
    # GRAFT_NEARDUP_REFEREE=1: check dd5/dd5b via the O(result + sample^2)
    # exact referee instead of their O(n^2 * dim) full oracles (scale dirs
    # where the quadratic baseline is infeasible IN DUCKDB).
    referee = {"dd5_embedding_neardup", "dd5b_embedding_neardup_lsh"}
    if os.environ.get("GRAFT_NEARDUP_REFEREE") and referee & set(oracles):
        oracles = {k: v for k, v in oracles.items() if k not in referee}
        ok, bad = referee_neardup(con, out_dir)
        n_ok += ok
        n_bad += bad
    # GRAFT_NGRAM_REFEREE=1: same pattern for dd2, whose full shingle
    # self-join oracle out-spills the disk past ~500k documents.
    if os.environ.get("GRAFT_NGRAM_REFEREE") and "dd2_ngram_jaccard" in oracles:
        oracles = {k: v for k, v in oracles.items() if k != "dd2_ngram_jaccard"}
        ok, bad = referee_jaccard(con, out_dir)
        n_ok += ok
        n_bad += bad
    # GRAFT_SUBSTR_REFEREE=1: same pattern for dd8, whose window self-join
    # + pair DISTINCT spilled ~60 GB at sf10 (df-cap priced globally -- see
    # referee_substr).
    if os.environ.get("GRAFT_SUBSTR_REFEREE") and "dd8_substring_dup" in oracles:
        oracles = {k: v for k, v in oracles.items() if k != "dd8_substring_dup"}
        ok, bad = referee_substr(con, out_dir)
        n_ok += ok
        n_bad += bad
    # GRAFT_FM2_REFEREE=1: same pattern for fm2, whose basket-pair
    # aggregate out-spills the disk at sf10 (supports are replica-local,
    # so the referee is exact -- see referee_fm2).
    if os.environ.get("GRAFT_FM2_REFEREE") and "fm2_frequent_triples" in oracles:
        oracles = {k: v for k, v in oracles.items() if k != "fm2_frequent_triples"}
        ok, bad = referee_fm2(con, out_dir)
        n_ok += ok
        n_bad += bad
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
    print(f"\n{n_ok} ok, {n_bad} failed, {n_total} total")
    sys.exit(1 if n_bad else 0)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    run({t: f"SELECT * FROM '{sf_dir}/{t}.parquet'" for t in TABLES}, out_dir)


if __name__ == "__main__":
    main()
