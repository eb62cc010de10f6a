"""Attribute in-suite inflation for one query (r13).

Replays the bench loop over HEADLINE[:N] (min-of-2, _clear_state), then
runs the TARGET 3x with the event log on, separating per-run wall time
into (construct, job wall, gaps) and per-stage executor time — so the
inflated in-suite state is profiled, not the fast solo state. A fresh
session profiling the same query (tools/profile_query.py) is the
comparison arm.

Usage: python tools/inflation_probe.py <target> <prefix_n> [skip]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _clear_state  # noqa: E402
from options_data_pipeline_spark import registry  # noqa: E402
from options_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    target = sys.argv[1]
    prefix_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    skip = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = f"/tmp/sparklogs_infl_{target}_{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        f"inflation-{target}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    qs = registry.queries()
    qs["buffer_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    prefix = [n for n in HEADLINE[:prefix_n] if n != target][::skip]
    t_pre = time.perf_counter()
    for name in prefix:
        for _ in range(2):
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        _clear_state(spark)
    pre_wall = time.perf_counter() - t_pre
    runs = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"timed{i}:{target}")
        t0 = time.perf_counter()
        df = qs[target](spark, sf_dir)
        t_con = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        runs.append((round(t_con, 3), round(time.perf_counter() - t0, 3)))
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    stages: dict[int, dict] = {}
    jobs: list[dict] = []
    per_stage: dict[int, list[float]] = {}
    stage_gc: dict[int, int] = {}
    files = sorted(
        p
        for p in glob.glob(f"{log_dir}/**", recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
        and not p.endswith(".crc")
    )
    for p in files:
        with open(p) as f:
            for line in f:
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
                    per_stage.setdefault(sid, []).append(m.get("Executor Run Time", 0))
                    stage_gc[sid] = stage_gc.get(sid, 0) + m.get("JVM GC Time", 0)
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", "").split("\n")[0][:60],
                        "tasks": si.get("Number of Tasks"),
                        "wall_ms": (si.get("Completion Time") or 0)
                        - (si.get("Submission Time") or 0),
                    }
    print(
        json.dumps(
            {
                "target": target,
                "prefix_n": len(prefix),
                "prefix_wall_s": round(pre_wall, 1),
                "runs_construct_total": runs,
            }
        )
    )
    for i in range(3):
        tj = [j for j in jobs if j["desc"].startswith(f"timed{i}:")]
        sids = {s for j in tj for s in j["stages"]}
        jw = sum(j.get("wall_ms", 0) for j in tj)
        print(f"-- run {i}: {len(tj)} jobs, job wall {jw} ms")
        rows = [
            (
                sid,
                stages.get(sid, {}).get("tasks"),
                stages.get(sid, {}).get("wall_ms"),
                sum(per_stage.get(sid, [])),
                stage_gc.get(sid, 0),
                stages.get(sid, {}).get("name", "?"),
            )
            for sid in sorted(sids)
            if sid in stages
        ]
        rows.sort(key=lambda r: -(r[2] or 0))
        for r in rows[:8]:
            print(
                f"   stage {r[0]:>4} tasks={r[1]:>3} wall={r[2]:>6}ms "
                f"exec={r[3]:>7}ms gc={r[4]:>5}ms  {r[5]}"
            )


if __name__ == "__main__":
    main()
