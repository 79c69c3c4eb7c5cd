#!/usr/bin/env python
"""Parse an uncompressed single-file Spark event log: per-job wall time
(grouped by job description) and the slowest stages with task-time split.

Usage: python tools_r16_evlog.py [/tmp/sparklogs] [job-desc-filter]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparklogs"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    files = sorted(
        p for p in glob.glob(os.path.join(d, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in p and "inprogress" not in p
    ) or sorted(
        p
        for p in glob.glob(os.path.join(d, "**", "*"), recursive=True)
        if os.path.isfile(p)
    )
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    tasks: dict[int, list] = {}
    for f in files:
        for line in open(f, errors="replace"):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                desc = (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[e["Job ID"]] = {
                    "sub": e["Submission Time"], "end": None, "desc": desc,
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"][:80],
                    "n": si["Number of Tasks"],
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                }
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                ti = e["Task Info"]
                tm = e.get("Task Metrics") or {}
                tasks.setdefault(sid, []).append(
                    (
                        ti["Finish Time"] - ti["Launch Time"],
                        tm.get("JVM GC Time", 0),
                        tm.get("Executor Run Time", 0),
                        (tm.get("Shuffle Read Metrics") or {}).get(
                            "Fetch Wait Time", 0
                        ),
                        # executorCpuTime is NANOS (contention-robust: CPU
                        # actually burned, not wall descheduled under load)
                        tm.get("Executor CPU Time", 0) / 1e6,
                    )
                )

    per_desc: dict[str, list] = {}
    for jid, j in jobs.items():
        if j["end"] is None or filt not in (j["desc"] or ""):
            continue
        per_desc.setdefault(j["desc"], []).append(
            (jid, (j["end"] - j["sub"]) / 1000, j["stages"])
        )
    for desc, js in per_desc.items():
        tot = sum(d for _, d, _ in js)
        cpu_tot = sum(
            t[4] for _, _, sids in js for s in sids for t in tasks.get(s, [])
        ) / 1000
        print(
            f"\n== {desc or '(no desc)'}: {len(js)} jobs, {tot:.2f}s total, "
            f"cpuSum={cpu_tot:.2f}s"
        )
        for jid, dur, sids in sorted(js, key=lambda x: -x[1])[:12]:
            executed = [s for s in sids if s in stages]
            print(f"  job {jid}: {dur:6.2f}s stages={executed}")
            for sid in executed:
                s = stages[sid]
                sdur = ((s["done"] or 0) - (s["sub"] or 0)) / 1000
                ts = tasks.get(sid, [])
                ttot = sum(t[0] for t in ts) / 1000
                tgc = sum(t[1] for t in ts) / 1000
                tfw = sum(t[3] for t in ts) / 1000
                tcpu = sum(t[4] for t in ts) / 1000
                tmax = max((t[0] for t in ts), default=0) / 1000
                print(
                    f"    stage {sid}: {sdur:6.2f}s n={s['n']:3d} "
                    f"taskSum={ttot:6.2f}s cpuSum={tcpu:6.2f}s "
                    f"maxTask={tmax:5.2f}s "
                    f"gc={tgc:4.2f}s fetchWait={tfw:4.2f}s {s['name'][:60]}"
                )


if __name__ == "__main__":
    main()
