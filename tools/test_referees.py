#!/usr/bin/env python3
"""Negative-test harness for the sampled-exact dedup referees.

A referee that never fails is indistinguishable from one that checks
nothing, so this script proves the failure paths: it copies a REAL
Verify output dir, tampers each refereed query's parquet in both
directions (drop a reported pair -> completeness must flag it; plant a
bogus pair -> soundness must flag it), and asserts the referee FAILS on
the tampered copy while PASSING on the pristine one.

For dd2 the dropped pair is chosen, when possible, with both endpoints
OUTSIDE the base block and the md5 doc-sample bucket, so the rejection
must come from the pair-sampled subset alone -- the round-10 unbiasing
contract.

Usage: python3 tools/test_referees.py <sfDirOrScaleDir> <verifyOutDir>
(verifyOutDir must contain dd2_ngram_jaccard/ and dd8_substring_dup/;
 works against both single-file sf dirs and ScaleData directory dirs).
Exits non-zero on any assertion failure.
"""
import contextlib
import glob
import hashlib
import io
import os
import shutil
import sys
import tempfile

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, referee_jaccard, referee_substr  # noqa: E402


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def bucket(s):
    return int(hashlib.md5(str(s).encode()).hexdigest()[:4], 16)


def run_referee(fn, sf_dir, out_dir):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ok, bad = fn(connect(sf_dir), out_dir)
    return ok == 1 and bad == 0, buf.getvalue().strip()


def tampered_copy(out_dir, query, mutate):
    tmp = tempfile.mkdtemp(prefix="referee-neg-")
    shutil.copytree(out_dir, f"{tmp}/out")
    files = glob.glob(f"{tmp}/out/{query}/*.parquet")
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    for f in files[1:]:
        os.remove(f)
    mutate(df).to_parquet(files[0], index=False)
    return tmp, f"{tmp}/out"


def check(name, passed, msg):
    print(("ok  " if passed else "FAIL") + f" {name}: {msg}")
    return passed


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = connect(sf_dir)
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    con.close()
    t_doc = min(65536, 65536 * 2000 // n_docs)
    t_pair = min(65536, max(1, 65536 * 2000 // n_docs))
    all_ok = True

    ok, msg = run_referee(referee_jaccard, sf_dir, out_dir)
    all_ok &= check("dd2 pristine", ok, msg)
    ok8, msg8 = run_referee(referee_substr, sf_dir, out_dir)
    all_ok &= check("dd8 pristine", ok8, msg8)

    # dd2 completeness: drop a pair the PAIR SAMPLE must catch on its own
    rep = pd.concat([pd.read_parquet(f) for f in
                     glob.glob(f"{out_dir}/dd2_ngram_jaccard/*.parquet")],
                    ignore_index=True)
    only_pair = [i for i, (a, b) in enumerate(zip(rep.a, rep.b))
                 if bucket(f"{int(a)}|{int(b)}") < t_pair
                 and bucket(int(a)) >= t_doc and bucket(int(b)) >= t_doc
                 and a >= 2000 and b >= 2000]
    victims = only_pair or list(range(len(rep)))
    kind = "pair-sample-only" if only_pair else "any"
    tmp, tampered = tampered_copy(out_dir, "dd2_ngram_jaccard",
                                  lambda d: d.drop(index=victims[0]))
    ok, msg = run_referee(referee_jaccard, sf_dir, tampered)
    all_ok &= check(f"dd2 dropped {kind} pair rejected", not ok, msg)
    if only_pair:
        all_ok &= check("dd2 rejection came from the pair sample alone",
                        "missing-from-sample=0" in msg
                        and "missing-from-base-block=0" in msg
                        and "missing-from-pair-sample=1" in msg, msg)
    shutil.rmtree(tmp)

    # dd2 soundness: plant a pair of unrelated docs
    tmp, tampered = tampered_copy(
        out_dir, "dd2_ngram_jaccard",
        lambda d: pd.concat(
            [d, pd.DataFrame([{"a": 1, "b": int(d.b.max()) + 1,
                               "jaccard": 0.9}]).astype(d.dtypes.to_dict())],
            ignore_index=True))
    ok, msg = run_referee(referee_jaccard, sf_dir, tampered)
    all_ok &= check("dd2 planted bogus pair rejected", not ok, msg)
    shutil.rmtree(tmp)

    # dd8 completeness: coverage is the deterministic base block (first 2000
    # doc_ids), so the dropped pair must have BOTH endpoints inside it --
    # dropping a pair outside the block is, by design, not detectable
    con = connect(sf_dir)
    block = set(con.sql(
        "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 2000").df().doc_id)
    con.close()
    rep8 = pd.concat([pd.read_parquet(f) for f in
                      glob.glob(f"{out_dir}/dd8_substring_dup/*.parquet")],
                     ignore_index=True)
    in_block = [i for i, (a, b) in enumerate(zip(rep8.a, rep8.b))
                if a in block and b in block]
    assert in_block, "no dd8 pair inside the base block to drop"
    tmp, tampered = tampered_copy(out_dir, "dd8_substring_dup",
                                  lambda d: d.drop(index=in_block[0]))
    ok, msg = run_referee(referee_substr, sf_dir, tampered)
    all_ok &= check("dd8 dropped pair rejected", not ok, msg)
    shutil.rmtree(tmp)

    # dd8 soundness: plant a pair of unrelated docs
    tmp, tampered = tampered_copy(
        out_dir, "dd8_substring_dup",
        lambda d: pd.concat(
            [d, pd.DataFrame([{"a": 3, "b": int(d.b.max()) + 1}])
             .astype(d.dtypes.to_dict())], ignore_index=True))
    ok, msg = run_referee(referee_substr, sf_dir, tampered)
    all_ok &= check("dd8 planted bogus pair rejected", not ok, msg)
    shutil.rmtree(tmp)

    print("ALL OK" if all_ok else "FAILURES")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
