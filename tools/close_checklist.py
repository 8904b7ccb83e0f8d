"""Round-close gate: run AFTER the final registry commit and the final
bench (VERDICT r6 #3 — r6 closed with a 359-name committed artifact vs
a 361-query registry because two queries were registered after the last
builder bench).

Checks, in order:
1. the freshest bench artifact's query names == the live registry
   (and the artifact reported zero errors);
2. the working tree is clean (nothing uncommitted at close);
3. the two-SF vacuity sweep (check_oracle.py --sweep): every
   registered query returns >0 rows at BOTH sf0.01 and sf0.1
   (VERDICT r7 #6 — an SF-dependent vacuity must fail at close, not
   wait for a hand run at the other SF).  Skippable for quick local
   iteration with SPARK_GRAFT_SKIP_SWEEP=1; the round close runs it.

Exit 0 = safe to close; nonzero prints what to fix (usually: re-run
``SPARK_GRAFT_ROUND=<n> python bench.py`` and commit the snapshot).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from fortisiem_clickhouse_monitor_spark.testing import (  # noqa: E402
    latest_bench_artifact,
)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = 0

    path = latest_bench_artifact(repo)
    if path is None:
        print("FAIL: no bench artifact found — run bench.py")
        rc = 1
    else:
        art = json.load(open(path))
        bench_names = set(art.get("queries", {}))
        reg_names = set(entrymod.queries())
        missing = sorted(reg_names - bench_names)
        stale = sorted(bench_names - reg_names)
        if missing:
            print(f"FAIL: {len(missing)} registered queries not in "
                  f"{os.path.basename(path)}: {missing[:10]}")
            rc = 1
        if stale:
            print(f"FAIL: {len(stale)} bench names no longer registered: "
                  f"{stale[:10]}")
            rc = 1
        if art.get("errors"):
            print(f"FAIL: bench artifact has errors: {art['errors']}")
            rc = 1
        if rc == 0:
            print(f"OK: {os.path.basename(path)} covers all "
                  f"{len(reg_names)} registered queries, zero errors")

    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=repo,
        capture_output=True, text=True,
    ).stdout.strip()
    if dirty:
        print(f"FAIL: working tree not clean at close:\n{dirty}")
        rc = 1
    else:
        print("OK: working tree clean")

    if os.environ.get("SPARK_GRAFT_SKIP_SWEEP"):
        print("SKIP: two-SF vacuity sweep (SPARK_GRAFT_SKIP_SWEEP set)")
    else:
        sweep = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "check_oracle.py"),
             "--sweep"],
            cwd=repo, capture_output=True, text=True,
        )
        tail = "\n".join(sweep.stdout.strip().splitlines()[-6:])
        if sweep.returncode != 0:
            print(f"FAIL: two-SF vacuity sweep:\n{tail}")
            rc = 1
        else:
            print(f"OK: {tail.splitlines()[-1] if tail else 'sweep clean'}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
