"""Mechanical round-over-round bench comparison (VERDICT r3 #3).

``python tools/bench_diff.py OLD.json NEW.json [min_delta_s]``

Both inputs are the full per-query artifacts bench.py persists
(docs/bench_r{N}_full.json). Prints: totals, queries only in one round,
and per-query deltas exceeding ``min_delta_s`` (default 0.25 s), worst
regressions first — so a verdict can diff rounds without re-timing.

``python tools/bench_diff.py --curves OLD_CURVES.json NEW_CURVES.json
[max_alpha_increase]`` instead diffs scaling-exponent artifacts
(docs/scaling_curves_*.json): for every query in both, flags any alpha
increase above the threshold (default 0.1) — the round-over-round
alpha-regression guard (VERDICT r4 #5).  Exit code 1 when a regression
is flagged, so the check can gate a round.
"""

from __future__ import annotations

import json
import sys


def diff_curves(old_path: str, new_path: str, max_increase: float) -> int:
    old, new = json.load(open(old_path)), json.load(open(new_path))
    common = sorted(set(old) & set(new))
    flagged = 0
    print(f"curves: {len(old)} old, {len(new)} new, {len(common)} common")
    for name in common:
        oa, na = old[name].get("alpha"), new[name].get("alpha")
        if oa is None or na is None:
            continue
        d = na - oa
        mark = ""
        if d > max_increase:
            mark = "  ALPHA REGRESSION"
            flagged += 1
        elif d < -max_increase:
            mark = "  improved"
        if mark or abs(d) > max_increase / 2:
            print(f"  alpha {oa:+.3f} -> {na:+.3f} ({d:+.3f})  {name}{mark}")
        ow, nw = old[name].get("work_alpha"), new[name].get("work_alpha")
        if ow is not None and nw is not None and nw - ow > max_increase:
            print(
                f"  WORK-alpha {ow:+.3f} -> {nw:+.3f}  {name}"
                "  WORK REGRESSION"
            )
            flagged += 1
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(
            "new curves: "
            + ", ".join(
                f"{n} [a={new[n].get('alpha')}]" for n in only_new
            )
        )
    print(f"{flagged} alpha regression(s) > {max_increase}")
    return 1 if flagged else 0


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--curves":
        thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
        return diff_curves(sys.argv[2], sys.argv[3], thresh)
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
