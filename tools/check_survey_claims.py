#!/usr/bin/env python3
"""Sweep SURVEY.md's per-row scale-certification claims against the
ORACLE_SCALE ledgers (VERDICT r12 directive 5), in BOTH directions:

1. SURVEY -> ledger: every X-row that claims "oracle-exact at ...sfN..."
   must have a matching ok/referee/delta line for each claimed sf in
   ORACLE_SCALE_sf{1,10}.txt.
2. ledger -> SURVEY: every ledger ok row whose query is named in a SURVEY
   row's query column must be claimed at that sf by that row — an
   understated claim is stale documentation just like an overstated one.

Claimed scale factors are parsed with a regex over `sf<number>` tokens
(ADVICE r13 item 3 — substring heuristics missed spellings like 'sf1,').
Exit 1 on any mismatch.

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
        claim = re.search(r"oracle-exact at ([^|;]*)", line).group(1)
        # tokenize claimed sfs numerically: sf0.01/sf1/sf10, 'sf1,', a
        # range like sf0.001→sf10 (a range endpoint at 10 implies 1)
        sfs = {float(x) for x in re.findall(r"sf(\d+(?:\.\d+)?)", claim)}
        wants_sf10 = 10.0 in sfs
        wants_sf1 = 1.0 in sfs or ("→" in claim and wants_sf10)
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
            # reverse direction: a ledger ok row for a query this SURVEY
            # row names must be claimed here (understated claim)
            if q in sf1 and not wants_sf1:
                print(f"{row}: {q} has an ok row in ORACLE_SCALE_sf1.txt but the row does not claim sf1")
                bad += 1
            if q in sf10 and not wants_sf10:
                print(f"{row}: {q} has an ok row in ORACLE_SCALE_sf10.txt but the row does not claim sf10")
                bad += 1

if bad:
    print(f"{bad} stale SURVEY certification claim(s)")
    sys.exit(1)
print("ok: SURVEY oracle-exact claims and ledger ok rows agree in both directions")
