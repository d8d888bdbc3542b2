"""Interleaved A/B of the 1-core executor leg: round-start code vs the
working tree, same minutes, same protocol — the only comparison this
host's ±40% hourly drift can't fake (bench.py's own interleaving lesson).

Two persistent children (one per repo checkout), each a
local-cluster[1,1] session pinned to its own cpu, warmed on a subset,
then RUN commands interleaved A,B,A,B....  Reports per-pair walls and
the median ratio.

Usage:
    python tools/ab_lo_leg.py <repoA> <repoB> [n_pairs] [subset_mod]

subset_mod: keep convs with pmod(xxhash64(conv_id), subset_mod)=0
(default 4 — a quarter of the bench table; 0/1 = full table).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

TABLE = os.environ.get(
    "AB_TABLE", "/tmp/tapes_bench_200000x30_s42_0a34dd8a.parquet"
)

_CHILD = """
import sys, time, json, shutil, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_MASTER"] = "local-cluster[1,1,7168]"
from tapes_spark.session import get_spark
from tapes_spark.pipeline import run_pipeline, materialize_sinks
stage = "/dev/shm/ab_lo_{tag}_" + str(os.getpid())
spark = get_spark("ab-lo-{tag}", parallelism=1, shuffle_partitions=2,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.sql.files.openCostInBytes": "0",
                               "spark.executor.memory": "6g",
                               "spark.ui.showConsoleProgress": "false"}})
tx = spark.read.parquet({table!r})
mod = {mod}
if mod > 1:
    tx = tx.filter("pmod(xxhash64(conv_id), %d) = 0" % mod)
warm = run_pipeline(spark, tx.filter("pmod(xxhash64(conv_id), 8) = 1"),
                    stage_dir=stage + "_w")
materialize_sinks(warm)
shutil.rmtree(stage + "_w", ignore_errors=True)
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() == "EXIT":
        break
    shutil.rmtree(stage, ignore_errors=True)
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    t0 = time.time()
    res = run_pipeline(spark, tx, stage_dir=stage)
    counts = materialize_sinks(res)
    print("DONE " + json.dumps({{"wall": time.time() - t0,
                                 "counts": counts}}), flush=True)
shutil.rmtree(stage, ignore_errors=True)
"""


def child(repo: str, tag: str, cpu: str, mod: int):
    code = _CHILD.format(repo=repo, tag=tag, table=TABLE, mod=mod)
    err = tempfile.NamedTemporaryFile(
        mode="w+", prefix=f"ab_lo_{tag}_", suffix=".log", delete=False
    )
    p = subprocess.Popen(
        ["taskset", "-c", cpu, sys.executable, "-c", code],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=err,
        text=True, bufsize=1,
    )
    return p, err


def read_until(p, prefix):
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError("child died")
        if line.startswith(prefix):
            return line[len(prefix):].strip()


def main():
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    mod = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    pa, _ = child(repo_a, "A", "0", mod)
    pb, _ = child(repo_b, "B", "1", mod)
    read_until(pa, "READY")
    read_until(pb, "READY")
    pairs = []
    counts_seen = []
    for i in range(n_pairs + 1):  # pair 0 = discarded warm pair
        walls = {}
        for name, p in (("A", pa), ("B", pb)):
            p.stdin.write("RUN\n")
            p.stdin.flush()
            d = json.loads(read_until(p, "DONE "))
            walls[name] = d["wall"]
            counts_seen.append((name, tuple(sorted(d["counts"].items()))))
        tag = "warm" if i == 0 else f"pair{i}"
        print(f"{tag}: A={walls['A']:.1f}s B={walls['B']:.1f}s "
              f"B/A={walls['B']/walls['A']:.3f}", flush=True)
        if i > 0:
            pairs.append(walls["B"] / walls["A"])
    for p in (pa, pb):
        try:
            p.stdin.write("EXIT\n")
            p.stdin.flush()
            p.wait(timeout=60)
        except Exception:
            p.kill()
    pairs.sort()
    med = pairs[len(pairs) // 2] if len(pairs) % 2 else (
        pairs[len(pairs) // 2 - 1] + pairs[len(pairs) // 2]) / 2
    ca = {c for n, c in counts_seen if n == "A"}
    cb = {c for n, c in counts_seen if n == "B"}
    print(f"median B/A wall ratio: {med:.3f}  (B < 1.0 means B faster)")
    print(f"sink counts identical: {ca == cb}")


if __name__ == "__main__":
    main()
