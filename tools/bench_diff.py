"""Mechanical round-over-round bench comparison (VERDICT r3 #3).

``python tools/bench_diff.py OLD.json NEW.json [min_delta_s]``

Both inputs are the full per-query artifacts bench.py persists
(docs/bench_r{N}_full.json). Prints: totals, queries only in one round,
and per-query deltas exceeding ``min_delta_s`` (default 0.25 s), worst
regressions first — so a verdict can diff rounds without re-timing.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    for name, d in (("old", old), ("new", new)):
        if "queries" not in d:
            print(
                f"{name} file has no 'queries' map — the driver's "
                "BENCH_rN.json keeps only a truncated tail; use the "
                "repo-persisted docs/bench_r{N}_full.json artifacts"
            )
            return 2
    oq, nq = old["queries"], new["queries"]

    print(
        f"total: {old['value']:.1f}s ({len(oq)} queries) -> "
        f"{new['value']:.1f}s ({len(nq)} queries)"
    )
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"removed ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(
            f"added ({len(only_new)}): "
            + ", ".join(f"{n} [{nq[n]:.2f}s]" for n in only_new)
        )

    deltas = sorted(
        ((nq[k] - oq[k], k) for k in set(oq) & set(nq)),
        reverse=True,
    )
    shown = [(d, k) for d, k in deltas if abs(d) >= thresh]
    print(f"\nper-query |delta| >= {thresh}s ({len(shown)} of {len(deltas)}):")
    for d, k in shown:
        tag = "REGRESSION" if d > 0 else "improved"
        print(f"  {d:+7.2f}s  {oq[k]:7.2f} -> {nq[k]:7.2f}  {k}  [{tag}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
