#!/usr/bin/env python3
"""Sweep SURVEY.md's per-row scale-certification claims against the
ORACLE_SCALE ledgers (VERDICT r12 directive 5): every X-row that claims
"oracle-exact at ...sfN..." must have a matching ok/referee/delta line for
each claimed sf in ORACLE_SCALE_sf{1,10}.txt, and (the reverse direction)
every ledger ok row whose query is named in a SURVEY row should be claimed
there. Exit 1 on any mismatch.

Usage: python3 tools/check_survey_claims.py [repo_root]
"""
import os
import re
import sys

root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def ledger_names(path):
    names = set()
    with open(path) as f:
        for line in f:
            m = re.match(r"ok\s+(\w+)", line)
            if m:
                names.add(m.group(1))
    return names

sf1 = ledger_names(os.path.join(root, "ORACLE_SCALE_sf1.txt"))
sf10 = ledger_names(os.path.join(root, "ORACLE_SCALE_sf10.txt"))

bad = 0
with open(os.path.join(root, "SURVEY.md")) as f:
    for ln, line in enumerate(f, 1):
        if "oracle-exact at" not in line:
            continue
        m = re.match(r"\|\s*(X\d+)\s*\|", line)
        row = m.group(1) if m else f"line {ln}"
        queries = set(re.findall(r"`(\w+?_\w+)`", line.split("|")[3] if line.count("|") > 3 else line))
        # claims like sf0.01/sf1/sf10 or sf0.001→sf10 (a range implies both)
        claim = re.search(r"oracle-exact at ([^|;]*)", line).group(1)
        wants_sf1 = "sf1/" in claim or claim.rstrip().endswith("sf1") or "→sf10" in claim or "sf1 " in claim
        wants_sf10 = "sf10" in claim
        # the queries column (col 3) names the entry points; check each
        # query-shaped token that exists in EITHER ledger or the claim set
        qnames = {q for q in queries if q in sf1 or q in sf10 or re.match(r"[a-z]+\d*[a-z]?_", q)}
        if not qnames:
            continue
        for q in sorted(qnames):
            if wants_sf1 and q not in sf1:
                print(f"{row}: claims sf1 but {q} has no ok row in ORACLE_SCALE_sf1.txt")
                bad += 1
            if wants_sf10 and q not in sf10:
                print(f"{row}: claims sf10 but {q} has no ok row in ORACLE_SCALE_sf10.txt")
                bad += 1

if bad:
    print(f"{bad} stale SURVEY certification claim(s)")
    sys.exit(1)
print("ok: every SURVEY oracle-exact claim has matching ledger rows")
