"""Stage-level profiler for one registry query (round-12 optimization).

Runs ONE query solo (warmup + 1 timed run, noop sink) with the Spark
event log enabled, then parses the event log into a per-stage table:
stage id, name, task count, total executor run time, max task time,
input/shuffle bytes. This is the guide-§1 empirical loop without the UI
(spark.ui.enabled is false in this sandbox).

Usage: python tools/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from options_data_pipeline_spark import registry  # noqa: E402
from options_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    log_dir = f"/tmp/sparklogs_{name}_{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    fn = registry.queries()[name]
    # warmup (JIT, parquet footers, write-once indexes)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(f"timed:{name}")
    mark = spark.sparkContext.getLocalProperty("spark.job.description")
    assert mark
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_construct = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    t_total = time.perf_counter() - t0
    spark.stop()

    # parse event log
    stages: dict[int, dict] = {}
    jobs: list[dict] = []
    per_stage_tasks: dict[int, list[float]] = {}
    submit_ts: dict[int, int] = {}
    # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_<app>/)
    # holding events_* part files plus an appstatus marker
    candidates = sorted(
        p
        for p in glob.glob(f"{log_dir}/**", recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    )
    lines: list[str] = []
    for p in candidates:
        if p.endswith(".crc"):
            continue
        with open(p) as f:
            lines.extend(f)
    for line in lines:
        if True:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                jobs.append(
                    {
                        "job": ev["Job ID"],
                        "desc": desc,
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                        "t0": ev.get("Submission Time"),
                    }
                )
            elif e == "SparkListenerJobEnd":
                for j in jobs:
                    if j["job"] == ev["Job ID"]:
                        j["wall_ms"] = ev.get("Completion Time", 0) - (j["t0"] or 0)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                per_stage_tasks.setdefault(sid, []).append(
                    m.get("Executor Run Time", 0)
                )
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                name_s = si.get("Stage Name", "")
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "name": name_s.split("\n")[0][:70],
                    "tasks": si.get("Number of Tasks"),
                    "wall_ms": (comp - sub) if sub and comp else None,
                }

    timed_jobs = [j for j in jobs if j["desc"].startswith("timed:")]
    timed_stage_ids = {s for j in timed_jobs for s in j["stages"]}
    print(
        json.dumps(
            {
                "query": name,
                "construct_s": round(t_construct, 3),
                "total_s": round(t_total, 3),
                "n_jobs_timed": len(timed_jobs),
                "n_jobs_all": len(jobs),
            }
        )
    )
    rows = []
    for sid in sorted(stages):
        st = stages[sid]
        tt = per_stage_tasks.get(sid, [])
        rows.append(
            (
                sid,
                sid in timed_stage_ids,
                st["tasks"],
                st["wall_ms"],
                sum(tt),
                max(tt) if tt else 0,
                st["name"],
            )
        )
    # top stages by wall time
    rows.sort(key=lambda r: -(r[3] or 0))
    print("stage timed tasks wall_ms sum_run_ms max_task_ms name")
    for r in rows[:25]:
        print(
            f"{r[0]:>5} {str(r[1]):>5} {r[2]:>5} {r[3] or 0:>7} "
            f"{r[4]:>9} {r[5]:>10} {r[6]}"
        )
    # job-level summary for timed jobs (driver gaps = total - sum of job walls)
    jw = sum(j.get("wall_ms", 0) for j in timed_jobs)
    print(
        f"timed jobs wall sum: {jw} ms; timed total {t_total:.3f}s; "
        f"construct {t_construct:.3f}s"
    )


if __name__ == "__main__":
    main()
