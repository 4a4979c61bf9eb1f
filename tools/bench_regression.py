#!/usr/bin/env python3
"""Per-query bench regression gate (VERDICT r12 directive 6).

Compares two bench JSONs (each with a full per-query map, i.e. the
BENCH_LAST.json shape — BENCH_r{N}.json keeps only a ~2 KB tail) and flags
every query whose time moved more than FACTOR in either direction, subject
to a noise floor (sub-second queries jitter hugely on a shared host).

Usage: python3 tools/bench_regression.py <new.json> <old.json> [factor]
  factor default 2.0; exit 1 if any regression (new > factor*old) is found.
  Improvements are listed but never fail the gate.
"""
import json
import sys

FLOOR_SEC = 0.75  # both runs under this -> pure host noise, skip

def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        sys.exit(f"{path}: no per-query map (use the BENCH_LAST.json shape)")
    return d, q

def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    new_path, old_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    dn, new = load(new_path)
    do, old = load(old_path)
    if dn.get("sf") != do.get("sf"):
        print(f"note: sf differs ({dn.get('sf')} vs {do.get('sf')}) — "
              "cross-sf comparison, treat with care")

    regressions, improvements = [], []
    for name in sorted(set(new) & set(old)):
        a, b = new[name], old[name]
        if max(a, b) < FLOOR_SEC:
            continue
        if a > factor * b:
            regressions.append((name, b, a, a / b if b else float("inf")))
        elif b > factor * a:
            improvements.append((name, b, a, b / a if a else float("inf")))

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    tn, to = sum(new.values()), sum(old.values())
    print(f"total {to:.1f}s ({len(old)} q, {to/len(old):.3f} s/q) -> "
          f"{tn:.1f}s ({len(new)} q, {tn/len(new):.3f} s/q)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for name, b, a, r in sorted(improvements, key=lambda t: -t[3]):
        print(f"improved  {name}: {b:.2f}s -> {a:.2f}s ({r:.1f}x faster)")
    for name, b, a, r in sorted(regressions, key=lambda t: -t[3]):
        print(f"REGRESSED {name}: {b:.2f}s -> {a:.2f}s ({r:.1f}x slower)")
    if regressions:
        print(f"{len(regressions)} quer{'y' if len(regressions)==1 else 'ies'} "
              f"regressed >{factor}x — investigate before recording the round "
              "canonical (host-noise check: 3-run median via SPARK_GRAFT_ONLY)")
        sys.exit(1)
    print(f"ok: no per-query regression >{factor}x "
          f"(noise floor {FLOOR_SEC}s)")

if __name__ == "__main__":
    main()
