"""Per-stage resource diagnosis for one query at one or more scales.

``python tools/stage_metrics.py out.json QUERY SF_DIR [SF_DIR ...]``

Runs QUERY once per SF_DIR in a fresh event-logged session and
aggregates task metrics per stage from the event log (the status UI is
disabled in this deployment, so the event log is the public,
version-stable source): executor run time, JVM GC time, shuffle
read/write bytes, memory/disk spill, peak execution memory.  This is
the "which resource binds" evidence VERDICT r5 #4 asks for when a
query's wall time bends while its work probe stays linear (k-truss at
20x) — prose says "machine-bound", this says WHERE.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(query_name: str, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession
    from fortisiem_clickhouse_monitor_spark.session import RUNTIME_CONFS, tune

    log_dir = tempfile.mkdtemp(prefix="fcm_eventlog_")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(f"stage-metrics-{query_name}")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = tune(builder.getOrCreate())

    fn = entrymod.queries()[query_name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()
    wall = time.time() - t0
    spark.stop()  # flush the event log

    stages: dict[int, dict] = {}
    # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_*)
    # containing events_* files plus an empty appstatus marker.
    log_files = []
    for root, _dirs, files in os.walk(log_dir):
        log_files += [os.path.join(root, f) for f in files]
    for fname in sorted(log_files):
        with open(fname) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                s = stages.setdefault(
                    sid,
                    {
                        "n_tasks": 0,
                        "run_time_ms": 0,
                        "gc_time_ms": 0,
                        "shuffle_read_mb": 0.0,
                        "shuffle_write_mb": 0.0,
                        "mem_spill_mb": 0.0,
                        "disk_spill_mb": 0.0,
                        "peak_exec_mem_mb": 0.0,
                        "result_ser_ms": 0,
                        "deser_ms": 0,
                    },
                )
                s["n_tasks"] += 1
                s["run_time_ms"] += tm.get("Executor Run Time", 0)
                s["gc_time_ms"] += tm.get("JVM GC Time", 0)
                s["shuffle_read_mb"] += (
                    sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                ) / 1e6
                s["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                s["mem_spill_mb"] += tm.get("Memory Bytes Spilled", 0) / 1e6
                s["disk_spill_mb"] += tm.get("Disk Bytes Spilled", 0) / 1e6
                s["peak_exec_mem_mb"] = max(
                    s["peak_exec_mem_mb"],
                    tm.get("Peak Execution Memory", 0) / 1e6,
                )
                s["result_ser_ms"] += tm.get("Result Serialization Time", 0)
                s["deser_ms"] += tm.get("Executor Deserialize Time", 0)

    totals = {
        k: round(sum(s[k] for s in stages.values()), 1)
        for k in (
            "run_time_ms",
            "gc_time_ms",
            "shuffle_read_mb",
            "shuffle_write_mb",
            "mem_spill_mb",
            "disk_spill_mb",
        )
    }
    top = sorted(
        (
            {"stage": sid, **{k: round(v, 1) for k, v in s.items()}}
            for sid, s in stages.items()
        ),
        key=lambda s: -s["run_time_ms"],
    )[:8]
    return {
        "sf_dir": sf_dir,
        "wall_s": round(wall, 2),
        "n_stages": len(stages),
        "totals": totals,
        "gc_frac_of_run": round(
            totals["gc_time_ms"] / max(totals["run_time_ms"], 1), 4
        ),
        "top_stages": top,
    }


def main() -> None:
    out_path, query_name, sf_dirs = sys.argv[1], sys.argv[2], sys.argv[3:]
    result = {"query": query_name, "runs": [run_one(query_name, d) for d in sf_dirs]}
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    for r in result["runs"]:
        print(
            f"{r['sf_dir']}: wall={r['wall_s']}s run={r['totals']['run_time_ms']}ms "
            f"gc={r['totals']['gc_time_ms']}ms ({r['gc_frac_of_run']*100:.1f}%) "
            f"shufR={r['totals']['shuffle_read_mb']}MB "
            f"shufW={r['totals']['shuffle_write_mb']}MB "
            f"spill={r['totals']['mem_spill_mb']}+{r['totals']['disk_spill_mb']}MB"
        )


if __name__ == "__main__":
    main()
