"""Profile headline bench workloads stage-by-stage via the event log.

Runs each bench workload once (after one warmup) inside a Spark
session with event logging on, labels jobs with
``setJobDescription``, then parses the event log into a per-workload
stage breakdown: stage wall time, task count, executor run time,
Python eval time, shuffle bytes, and the top stage names.

Usage: python benchmarks/profile_bench.py [workload,...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def get_spark():
    import bench

    from pyspark.sql import SparkSession

    os.makedirs(EVDIR, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .appName("tcs-profile")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVDIR}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def main():
    import bench

    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    spark.read.parquet(f"{bench.SF_DIR}/lineitem.parquet").count()

    walls = {}
    for name, fn in bench.BENCHES.items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark)
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.perf_counter()
        fn(spark)
        walls[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse the event log (Spark 4 rolling layout: a directory of
    # zstd-compressed event files) ----
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = sorted(
            p for p in os.listdir(d) if p.startswith("events_")
        )
        path = [os.path.join(d, p) for p in parts]
    else:
        path = [path]
    jobs = {}  # job id -> {desc, submitted, completed, stages: [ids]}
    stage_info = {}  # stage id -> dict
    stage_task = defaultdict(lambda: defaultdict(float))
    stage_ntask = defaultdict(int)
    import io
    import subprocess

    def _lines():
        for p in path:
            if p.endswith(".zstd"):
                proc = subprocess.Popen(
                    ["zstdcat", p], stdout=subprocess.PIPE
                )
                yield from io.TextIOWrapper(proc.stdout, encoding="utf-8")
                proc.wait()
            else:
                with open(p) as fh:
                    yield from fh

    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "ntask": si["Number of Tasks"],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                stage_ntask[sid] += 1
                stage_task[sid]["run_ms"] += m.get("Executor Run Time", 0)
                stage_task[sid]["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
                stage_task[sid]["deser_ms"] += m.get(
                    "Executor Deserialize Time", 0
                )
                stage_task[sid]["gc_ms"] += m.get("JVM GC Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                stage_task[sid]["sh_read_b"] += sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
                stage_task[sid]["fetch_wait_ms"] += sr.get(
                    "Fetch Wait Time", 0
                )
                sw = m.get("Shuffle Write Metrics") or {}
                stage_task[sid]["sh_write_b"] += sw.get(
                    "Shuffle Bytes Written", 0
                )
                inp = m.get("Input Metrics") or {}
                stage_task[sid]["input_b"] += inp.get("Bytes Read", 0)

    # group timed jobs by workload
    by_wl = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        if j["desc"].startswith("timed:"):
            by_wl[j["desc"][6:]].append(jid)

    report = {}
    for wl, jids in by_wl.items():
        entries = []
        total_ms = 0
        for jid in jids:
            j = jobs[jid]
            jw = j.get("t1", j["t0"]) - j["t0"]
            total_ms += jw
            for sid in j["stages"]:
                si = stage_info.get(sid)
                if not si or si.get("t0") is None:
                    continue
                tm = stage_task[sid]
                entries.append(
                    {
                        "job": jid,
                        "stage": sid,
                        "wall_ms": si["t1"] - si["t0"],
                        "ntask": si["ntask"],
                        "run_ms": round(tm["run_ms"]),
                        "gc_ms": round(tm["gc_ms"]),
                        "fetch_ms": round(tm["fetch_wait_ms"]),
                        "in_mb": round(tm["input_b"] / 1e6, 2),
                        "shr_mb": round(tm["sh_read_b"] / 1e6, 2),
                        "shw_mb": round(tm["sh_write_b"] / 1e6, 2),
                        "name": si["name"][:90],
                    }
                )
        entries.sort(key=lambda d: -d["wall_ms"])
        report[wl] = {
            "wall_s": walls.get(wl),
            "jobs": len(jids),
            "job_wall_ms": total_ms,
            "stages": entries[:14],
        }

    out = os.environ.get("PROFILE_OUT", "/tmp/profile_bench.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    for wl, r in report.items():
        print(
            f"== {wl}: wall {r['wall_s']}s, {r['jobs']} jobs, "
            f"sum(job wall) {r['job_wall_ms']} ms"
        )
        for s in r["stages"][:8]:
            print(
                f"   stage {s['stage']:>4} wall {s['wall_ms']:>6} ms "
                f"ntask {s['ntask']:>3} run {s['run_ms']:>6} gc {s['gc_ms']:>4} "
                f"fetch {s['fetch_ms']:>4} in {s['in_mb']:>7} shr {s['shr_mb']:>6} "
                f"shw {s['shw_mb']:>6}  {s['name'][:60]}"
            )
    print(f"full report: {out}")


if __name__ == "__main__":
    main()
