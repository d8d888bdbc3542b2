"""Exec-mode codec A/B at full scale: lz4/snappy (A) vs zstd (B).

Motivation (r5 event-log profiling): the executor-mode 1->4 scaling gap
decomposes as packing ~0.97 x per-task time inflation ~1.25 at 4-way
concurrency — memory-bus/LLC contention on this single-socket VM.  zstd
cuts staged-parquet + shuffle bytes ~30%, trading CPU (cheap on the
contended leg) for bus traffic (the binding resource).  The earlier
thread-mode A/B measured zstd winning under shared-bus load and losing
on a quiet bus — which is exactly hi-leg vs lo-leg regimes, so both
sides of the scaling ratio should move the right way.  This script
measures that directly with the bench's own children, sequential
ALTERNATING blocks per level (campaign-faithful bus load), all four
children resident on disjoint cpusets.

Usage:  python tools/ab_codec.py   (~45 min)
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("BENCH_EXEC", "1")

import bench  # noqa: E402

PATH = "/tmp/tapes_bench_200000x30_s42_0a34dd8a.parquet"
ZSTD = {
    "spark.io.compression.codec": "zstd",
    "spark.sql.parquet.compression.codec": "zstd",
}


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    mk = bench._BenchChild
    lc = bench._scale_master
    children = {}
    log("spawning 4 children (A=lz4/snappy, B=zstd; lo=1 exec, hi=4)")
    children["a_lo"] = mk(1, PATH, cpuset="0", master=lc(1), extra_conf={})
    children["a_hi"] = mk(4, PATH, cpuset="1-4", master=lc(4), extra_conf={})
    children["b_lo"] = mk(1, PATH, cpuset="5", master=lc(1), extra_conf=ZSTD)
    children["b_hi"] = mk(
        4, PATH, cpuset="6-9", master=lc(4), extra_conf=ZSTD
    )
    walls: dict[str, list[float]] = {k: [] for k in children}
    try:
        with ThreadPoolExecutor(4) as pool:
            list(pool.map(lambda c: c.wait_ready(), children.values()))
        log("subset warmups done; full warms (A||B concurrently per level)")
        with ThreadPoolExecutor(2) as pool:
            fa = pool.submit(children["a_hi"].run, "RUN 2")
            fb = pool.submit(children["b_hi"].run, "RUN 2")
            wa, wb = fa.result(), fb.result()
        log(f"hi warms A={wa['walls']} B={wb['walls']}")
        with ThreadPoolExecutor(2) as pool:
            fa = pool.submit(children["a_lo"].run, "RUN 1")
            fb = pool.submit(children["b_lo"].run, "RUN 1")
            wa, wb = fa.result(), fb.result()
        log(f"lo warms A={wa['walls']} B={wb['walls']}")

        # measured, SEQUENTIAL alternating blocks (campaign-faithful bus
        # load: only one child group busy at a time)
        for name, cmd in (
            ("a_hi", "RUN 2"), ("b_hi", "RUN 2"),
            ("a_hi", "RUN 2"), ("b_hi", "RUN 2"),
            ("a_lo", "RUN 1"), ("b_lo", "RUN 1"), ("a_lo", "RUN 1"),
        ):
            r = children[name].run(cmd)
            walls[name] += r["walls"]
            log(f"{name} {cmd} -> {[round(w,1) for w in r['walls']]}")
            print("PARTIAL " + json.dumps(walls), flush=True)
    finally:
        for c in children.values():
            c.close()
    print("AB_DONE " + json.dumps(walls))


if __name__ == "__main__":
    main()
