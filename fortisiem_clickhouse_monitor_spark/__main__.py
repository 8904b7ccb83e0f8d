"""CLI entry points mirroring the reference's three modes
(chStats.py:631-746):

- one-shot: ``python -m fortisiem_clickhouse_monitor_spark -m dataHealth``
  runs the job's query and pretty-prints JSON rows (entry point A);
- upload: add ``-U`` to emit ``PH_SYSTEM_<TYPE>=<json>`` frames instead
  — printed by default, sent as UDP datagrams with ``--udp`` (entry
  point A with uploadEvents, chStats.py:736, 384-483);
- daemon: ``--daemon`` starts one Structured Streaming job per mode at
  the reference cadences (entry point B, chStats.py:560-579);
  ``--interval`` / ``--ticks`` shrink cadence and lifetime for
  local runs.

Mode names resolve case-insensitively (chStats.py:703-713).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

#: mode -> (registry query, syslog payload type). The five reference
#: jobs (chStats.py:667-673) mapped onto their relational analogs.
MODES: dict[str, tuple[str, str]] = {
    "dataHealth": ("health_nested_document", "CLICKHOUSE_DATA_HEALTH"),
    "dataReplicationHealth": ("health_parts_metrics", "CLICKHOUSE_REPL_HEALTH"),
    "keeperHealth": ("keeper_srvr_summary", "CLICKHOUSE_KEEPER_HEALTH"),
    "keeperStats": ("keeper_cons_clients", "CLICKHOUSE_KEEPER_STATS"),
    "keeperParams": ("keeper_conf_kv", "CLICKHOUSE_KEEPER_PARAMS"),
}


def resolve_mode(name: str) -> str:
    matches = [m for m in MODES if m.lower() == name.lower()]
    if not matches:
        sys.exit(
            f"unknown mode {name!r}; choose from: {', '.join(MODES)}"
        )
    return matches[0]


def one_shot(spark, mode: str, sf_dir: str, upload: bool, udp: bool) -> list[str]:
    """Run one job; return the printed lines (also printed to stdout)."""
    from .plans import health  # noqa: F401  (registration side effects)
    from . import registry
    from .streaming import jobs

    qname, ptype = MODES[mode]
    df = registry.queries()[qname](spark, sf_dir)
    out: list[str] = []
    if upload:
        frames = [r["frame"] for r in jobs.frame_syslog(df, ptype).collect()]
        if udp:
            jobs.udp_sink()(frames)
        out = frames
    else:
        out = [
            json.dumps(r.asDict(recursive=True), indent=2, default=str)
            for r in df.collect()
        ]
    for line in out:
        print(line)
    return out


def run_daemon(
    spark,
    sf_dir: str,
    interval_seconds: int | None,
    ticks: int,
    sink=None,
) -> int:
    """Start all five jobs as streaming queries over the events stream
    snapshotting each mode's frame per micro-batch; returns the number
    of frames emitted. `sink` (tests) collects frames instead of UDP."""
    import time

    from . import registry
    from .streaming import jobs

    frames: list[str] = []
    collect = sink or frames.extend
    queries = []
    for mode, (qname, ptype) in MODES.items():
        snapshot = registry.queries()[qname](spark, sf_dir)
        # periodic re-emission: a rate stream provides the trigger beat;
        # the job re-runs the batch frame inside foreachBatch each tick
        # (the reference recomputes per tick too, chStats.py:538-549).
        beat = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        )

        def emit(batch_df, batch_id, _df=snapshot, _pt=ptype):
            rows = jobs.frame_syslog(_df, _pt).collect()
            collect([r["frame"] for r in rows])

        iv = interval_seconds or jobs.JOB_INTERVALS.get(
            "data_health" if "Health" in mode else "keeper_stats", 180
        )
        q = (
            beat.writeStream.outputMode("append")
            .foreachBatch(emit)
            .trigger(processingTime=f"{iv} seconds")
            .queryName(f"daemon_{mode}")
            .start()
        )
        queries.append(q)

    deadline = time.time() + ticks * (interval_seconds or 180) + 30
    try:
        while time.time() < deadline and any(q.isActive for q in queries):
            time.sleep(0.5)
            if sink is None and len(frames) > 0:
                break
    finally:
        for q in queries:
            q.stop()
    return len(frames)


#: Remediation tasks section of the menu. The reference's own tasks
#: list is empty and its clearReplicationFailures is a stub
#: (chStats.py:360-361), so this stays empty — the section renders only
#: when populated, mirroring the reference's ``if tasks:`` guard.
TASKS: dict[str, tuple[str, str]] = {}


def interactive_menu(
    spark, sf_dir: str, upload: bool, udp: bool, input_fn=input, print_fn=print
) -> str | None:
    """Numbered-menu mode (entry point C, chStats.py:715-730): shown
    when no ``-m`` is given on a terminal. Invalid entries re-prompt;
    a valid number runs that job once via one_shot. Returns the mode
    that ran (None if the user EOF'd out)."""
    names = list(MODES) + list(TASKS)
    while True:
        print_fn(f"\nPlease select an option [1-{len(names)}]\n")
        print_fn("\n[Reporting Jobs]")
        for idx, name in enumerate(MODES, 1):
            print_fn(f"{idx}. {name}")
        if TASKS:
            print_fn("\n[Remediation Jobs]")
            for idx, name in enumerate(TASKS, len(MODES) + 1):
                print_fn(f"{idx}. {name}")
        try:
            selection = input_fn("\nEnter your choice: ")
        except EOFError:
            return None
        if selection.isdigit() and 0 < int(selection) <= len(names):
            mode = names[int(selection) - 1]
            one_shot(spark, mode, sf_dir, upload, udp)
            return mode
        print_fn(
            f'\nERROR: "{selection}" is not a valid entry, please try again.'
        )


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="fortisiem_clickhouse_monitor_spark")
    p.add_argument("-m", "--mode", help="job to run once: " + ", ".join(MODES))
    p.add_argument("-U", "--upload", action="store_true", help="emit syslog frames")
    p.add_argument("--udp", action="store_true", help="send frames as UDP datagrams")
    p.add_argument("--daemon", action="store_true", help="run all jobs on cadence")
    p.add_argument("--interval", type=int, default=None, help="daemon trigger seconds")
    p.add_argument("--ticks", type=int, default=1, help="daemon lifetime in ticks")
    p.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )
    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark("fcm-cli")
    if args.daemon:
        n = run_daemon(spark, args.sf_dir, args.interval, args.ticks)
        print(f"daemon emitted {n} frames")
    elif args.mode:
        one_shot(spark, resolve_mode(args.mode), args.sf_dir, args.upload, args.udp)
    elif sys.stdin.isatty():
        interactive_menu(spark, args.sf_dir, args.upload, args.udp)
    else:
        p.print_help()


if __name__ == "__main__":
    main()
