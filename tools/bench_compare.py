"""Compare two bench.py JSON outputs per query. Usage:

    python tools/bench_compare.py old.json new.json [ratio_threshold]

Accepts either the raw one-line bench output or the driver's BENCH_r*.json
wrapper (whose 'tail' string may truncate early entries — those are
skipped). Prints regressions (new/old >= threshold, default 1.5),
improvements (<= 1/threshold), and totals.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"]
    out: dict[str, float] = {}
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    tail = d.get("tail", "")
    for name, val in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail):
        out[name] = float(val)
    # scrub wrapper keys the regex also matches
    for k in ("value", "sf", "reps", "n", "rc", "cpus"):
        out.pop(k, None)
    return out


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load_queries(old_p), load_queries(new_p)
    common = sorted(set(old) & set(new))
    print(f"common={len(common)} old-only={len(set(old)-set(new))} "
          f"new-only={len(set(new)-set(old))}")
    regress, improve = [], []
    for k in common:
        a, b = old[k], new[k]
        if a < 0.05:  # too small to ratio meaningfully
            continue
        r = b / a
        if r >= thr:
            regress.append((r, k, a, b))
        elif r <= 1 / thr:
            improve.append((r, k, a, b))
    for title, rows in (("REGRESSIONS", sorted(regress, reverse=True)),
                        ("improvements", sorted(improve))):
        print(f"\n{title} (threshold {thr}x):")
        for r, k, a, b in rows:
            print(f"  {k:45s} {a:7.2f} -> {b:7.2f}  ({r:.2f}x)")
    tot_old = sum(old[k] for k in common)
    tot_new = sum(new[k] for k in common)
    print(f"\ncommon-query totals: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new/tot_old:.2f}x)")


if __name__ == "__main__":
    main()
