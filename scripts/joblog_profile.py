#!/usr/bin/env python3
"""Per-query job/stage profile from a Spark event log.

Usage: joblog_profile.py <eventlog file> [topN]

Groups SparkListenerJobStart/JobEnd by the job description (graft.Bench
labels every query's jobs with its name — guide §1.5) and prints, per
query: job count, summed job wall, and the jobs' task-time sum vs wall
(the gap is scheduling/driver floor). The profiling aid behind the
round-19 pass-count work; reads driver-written logs only.
"""
import io
import json
import sys
from collections import defaultdict

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 40


def open_log(p):
    if p.endswith(".zstd"):
        import zstandard
        return io.TextIOWrapper(
            zstandard.ZstdDecompressor().stream_reader(open(p, "rb")))
    return open(p)

job_desc = {}
job_start = {}
job_sub = {}          # jobId -> stage ids
stage_info = {}       # stageId -> (numTasks)
stage_task_ms = defaultdict(float)
stage_wall = {}
per_q = defaultdict(lambda: [0, 0.0])   # desc -> [n_jobs, wall_ms]

with open_log(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            desc = e.get("Properties", {}).get("spark.job.description", "?")
            job_desc[jid] = desc
            job_start[jid] = e["Submission Time"]
            job_sub[jid] = [s["Stage ID"] for s in e.get("Stage Infos", [])]
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in job_start:
                d = job_desc.get(jid, "?")
                per_q[d][0] += 1
                per_q[d][1] += e["Completion Time"] - job_start[jid]
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            stage_task_ms[sid] += (m.get("Executor Run Time") or 0)

stage_of_q = defaultdict(float)
for jid, stages in job_sub.items():
    d = job_desc.get(jid, "?")
    for s in stages:
        stage_of_q[d] += stage_task_ms.get(s, 0.0)

rows = sorted(per_q.items(), key=lambda kv: -kv[1][1])[:top]
print(f"{'query':<34} {'jobs':>5} {'wall_s':>8} {'task_s':>8} {'floor_s':>8}")
for d, (n, wall) in rows:
    task = stage_of_q.get(d, 0.0) / 1000
    print(f"{d:<34} {n:>5} {wall/1000:>8.2f} {task:>8.2f} {max(0.0, wall/1000 - task):>8.2f}")
