"""Per-query bench regression table across rounds.

Usage: python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [...]
       -> markdown to stdout (redirect to BENCH_REGRESSIONS.md)

Flags queries whose latest/first ratio exceeds THRESHOLD, with the
absolute delta alongside — sub-second queries on a 32-thread local
box routinely swing 1.3-1.5x from scheduling noise, so the absolute
delta is what separates a real regression from jitter.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.5


def main() -> int:
    paths = sys.argv[1:]
    if len(paths) < 2:
        print(__doc__)
        return 2
    rounds = []
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        if "queries" not in doc and "tail" in doc:
            # driver wrapper: the bench JSON line is embedded in "tail"
            line = next(
                ln for ln in doc["tail"].splitlines()
                if ln.startswith('{"metric"')
            )
            inner = json.loads(line)
            inner.setdefault("sf", doc.get("sf"))
            doc = inner
        rounds.append(doc)
    labels = [p.split("/")[-1].removesuffix(".json") for p in paths]

    names = sorted(set().union(*(r["queries"] for r in rounds)))
    print(f"# Bench regressions — {' vs '.join(labels)}")
    print()
    totals = " | ".join(f"{r['value']:.2f} s" for r in rounds)
    print(f"Totals: {totals} (sf={rounds[-1].get('sf', '?')}, local[32]).")
    print()
    header = " | ".join(labels)
    print(f"| query | {header} | last/first | flag |")
    print("|---|" + "---|" * (len(rounds) + 2))
    flagged = []
    for n in names:
        vals = [r["queries"].get(n) for r in rounds]
        cells = " | ".join("—" if v is None else f"{v:.2f}" for v in vals)
        present = [v for v in vals if v is not None]
        if len(present) >= 2 and present[0] > 0:
            ratio = present[-1] / present[0]
            delta = present[-1] - present[0]
            flag = ""
            if ratio > THRESHOLD:
                flag = "NOISE" if abs(delta) < 0.3 else "REGRESSION"
                flagged.append((n, ratio, delta, flag))
            print(f"| {n} | {cells} | {ratio:.2f}x | {flag} |")
        else:
            print(f"| {n} | {cells} | — | new |")
    print()
    if flagged:
        print("## Flagged")
        print()
        for n, ratio, delta, flag in flagged:
            cause = (
                "absolute delta under 0.3 s on a sub-second query — "
                "local scheduling jitter, not a plan change"
                if flag == "NOISE"
                else "exceeds threshold with a material absolute delta — "
                "investigate the plan"
            )
            print(f"- `{n}`: {ratio:.2f}x (+{delta:.2f} s) — {cause}")
    else:
        print(f"No query exceeded {THRESHOLD}x.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
