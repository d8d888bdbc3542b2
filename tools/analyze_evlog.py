"""Attribute a profiled scaling leg's wall to tasks / gaps / tails.

Reads a Spark event-log dir written by tools/profile_scaling.py plus the
pass windows that script printed, and reports per measured pass:

  * occupancy      — sum(task wall) / (pass wall x cores): how much of the
                     leg's core budget ran tasks at all
  * dead time      — core-seconds where NO task ran anywhere (serial
                     driver phases: planning, commit, collect)
  * tail loss      — core-seconds where SOME but not all cores ran tasks
                     (wave quantization / stragglers)
  * per-stage top offenders by idle core-time inside the stage window
  * task-metric totals: executor run, on-CPU, GC, (de)serialization,
    shuffle read/write, python (Arrow) time if present

Usage:
    python tools/analyze_evlog.py <evlog_dir> <profiler_stdout_file>
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _iter_log_files(evdir: str):
    for root, _dirs, files in os.walk(evdir):
        for fn in sorted(files):
            if fn.startswith("events_") or fn.startswith("app-"):
                yield os.path.join(root, fn)


def load_events(evdir: str):
    for path in _iter_log_files(evdir):
        if path.endswith(".zstd"):
            # Spark event logs use streaming zstd frames of unknown
            # content size; shell out to the zstd CLI (no python module
            # in this env handles streaming frames)
            import io
            import subprocess

            p = subprocess.Popen(
                ["zstd", "-dc", path], stdout=subprocess.PIPE
            )
            f = io.TextIOWrapper(p.stdout, encoding="utf-8")
        else:
            f = open(path)
        with f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def load_windows(stdout_path: str):
    wins = []
    for line in open(stdout_path):
        parts = line.split()
        if parts and parts[0] in ("PASS", "WARM", "CTL"):
            wins.append(
                (parts[0], int(parts[1]), int(parts[2]), int(parts[3]))
            )
    return wins


def main() -> None:
    evdir, outpath = sys.argv[1], sys.argv[2]
    tasks = []  # (launch_ms, finish_ms, stage_id, metrics)
    stages = {}  # stage_id -> info
    for ev in load_events(evdir):
        k = ev.get("Event")
        if k == "SparkListenerTaskEnd":
            ti = ev.get("Task Info", {})
            tm = ev.get("Task Metrics") or {}
            tasks.append(
                (
                    ti.get("Launch Time", 0),
                    ti.get("Finish Time", 0),
                    ev.get("Stage ID"),
                    tm,
                )
            )
        elif k == "SparkListenerStageCompleted":
            si = ev.get("Stage Info", {})
            stages[si.get("Stage ID")] = {
                "name": (si.get("Stage Name") or "")[:60],
                "sub": si.get("Submission Time", 0),
                "done": si.get("Completion Time", 0),
                "n": si.get("Number of Tasks", 0),
            }
        elif k == "SparkListenerEnvironmentUpdate":
            sp = ev.get("Spark Properties", {})
            cores_master = sp.get("spark.master", "")
            print(f"master={cores_master} "
                  f"shuffle={sp.get('spark.sql.shuffle.partitions')}")

    wins = load_windows(outpath)
    # infer core count from master string in any env event (fallback argv)
    import re

    cores = None
    for ev in load_events(evdir):
        if ev.get("Event") == "SparkListenerEnvironmentUpdate":
            m = re.search(
                r"local-cluster\[(\d+),(\d+)",
                ev["Spark Properties"].get("spark.master", ""),
            )
            if m:
                cores = int(m.group(1)) * int(m.group(2))
            break
    if cores is None:
        cores = int(os.environ.get("PROFILE_CORES", "1"))

    for tag, idx, t0, t1, in [(w[0], w[1], w[2], w[3]) for w in wins]:
        wall_ms = t1 - t0
        in_win = [t for t in tasks if t[0] >= t0 and t[1] <= t1]
        if not in_win:
            continue
        # sweep the task timeline: concurrency level over time
        pts = []
        for lt, ft, _sid, _tm in in_win:
            pts.append((lt, 1))
            pts.append((ft, -1))
        pts.sort()
        dead_ms = tail_ms = 0.0
        cur = 0
        prev = t0
        for t, d in pts:
            span = t - prev
            if span > 0:
                if cur == 0:
                    dead_ms += span
                elif cur < cores:
                    tail_ms += span * (cores - cur) / cores
            cur += d
            prev = t
        dead_ms += max(0, t1 - prev)
        task_ms = sum(ft - lt for lt, ft, _s, _m in in_win)
        occ = task_ms / (wall_ms * cores)

        def s(key, scale=1.0):
            return sum((t[3].get(key) or 0) for t in in_win) * scale

        run = s("Executor Run Time")
        cpu = s("Executor CPU Time", 1e-6)  # ns -> ms
        gc = s("JVM GC Time")
        deser = s("Executor Deserialize Time") + s(
            "Result Serialization Time"
        )
        shw = sum(
            ((t[3].get("Shuffle Write Metrics") or {}).get(
                "Shuffle Write Time") or 0)
            for t in in_win
        ) * 1e-6
        shr = sum(
            ((t[3].get("Shuffle Read Metrics") or {}).get(
                "Fetch Wait Time") or 0)
            for t in in_win
        )
        print(
            f"\n== {tag} {idx}: wall={wall_ms/1000:.1f}s cores={cores} "
            f"tasks={len(in_win)}"
        )
        print(
            f"   occupancy={occ:.3f}  dead(all-idle)={dead_ms/1000:.1f}s "
            f"({dead_ms/wall_ms:.1%})  tail(partial-idle)="
            f"{tail_ms/1000:.1f}s-cores ({tail_ms/wall_ms:.1%})"
        )
        print(
            f"   sum task={task_ms/1000/cores:.1f}s/core  "
            f"run={run/1000:.1f}s  onCPU={cpu/1000:.1f}s "
            f"({cpu/max(run,1):.2f} of run)  gc={gc/1000:.1f}s  "
            f"(de)ser={deser/1000:.1f}s  shufW={shw/1000:.1f}s  "
            f"fetchWait={shr/1000:.1f}s"
        )
        # per-stage idle attribution inside the window
        by_stage = defaultdict(lambda: [0.0, 0, 0.0])
        for lt, ft, sid, _m in in_win:
            by_stage[sid][0] += ft - lt
            by_stage[sid][1] += 1
            by_stage[sid][2] = max(by_stage[sid][2], ft - lt)
        rows = []
        for sid, (tsum, n, tmax) in by_stage.items():
            st = stages.get(sid, {})
            swall = max(0, (st.get("done", 0) - st.get("sub", 0)))
            idle = swall * cores - tsum
            rows.append((idle, sid, st.get("name", "?"), n, tsum, tmax,
                         swall))
        rows.sort(reverse=True)
        for idle, sid, name, n, tsum, tmax, swall in rows[:8]:
            print(
                f"   stage {sid:>4} {name[:44]:44} n={n:<4} "
                f"wall={swall/1000:6.1f}s sum={tsum/1000:7.1f}s "
                f"max={tmax/1000:6.1f}s idle~{idle/1000:7.1f}s-core"
            )


if __name__ == "__main__":
    main()
