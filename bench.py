"""Benchmark harness — one JSON line to stdout.

Times (a) the end-to-end transcripts pipeline (parse -> enrich -> route ->
aggregate, all sinks materialized) at two parallelism levels — N and N/4
cores, each in its OWN subprocess so JIT warmth can't leak between levels
— to evidence the BASELINE.json scaling-efficiency target in-sandbox, and
(b) the headline operator queries from __spark_entry__.py at
$SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     high parallelism level N (default 32)
  BENCH_CONVS          transcripts bench conversations (default 20000)
  BENCH_TURNS          median turns per conv (default 30)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_CONVS", "200000"))
MED_TURNS = int(os.environ.get("BENCH_TURNS", "30"))
LOW_CPUS = max(2, CPUS // 4)

_CHILD_SNIPPET = """
import sys, time, json, shutil
sys.path.insert(0, {repo!r})
from tapes_spark.session import get_spark
from tapes_spark.pipeline import run_pipeline, materialize_sinks
stage = "/dev/shm/tapes_bench_stage_{cores}"
shutil.rmtree(stage, ignore_errors=True)
spark = get_spark("tapes-bench-{cores}", parallelism={cores},
                  shuffle_partitions={cores},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.sql.files.openCostInBytes": "0"}})
tx = spark.read.parquet({path!r})
turns = tx.count()
# warmup pass (JIT + page cache), then min of two measured steady-state
# runs — this sandbox's effective CPU throughput fluctuates (shared host),
# so a single sample is unreliable; min is the least-noise estimator
warm = run_pipeline(spark, tx, stage_dir=stage + "_warm")
materialize_sinks(warm)
shutil.rmtree(stage + "_warm", ignore_errors=True)
walls = []
for i in range(2):
    shutil.rmtree(stage, ignore_errors=True)
    t0 = time.time()
    res = run_pipeline(spark, tx, stage_dir=stage)
    materialize_sinks(res)
    walls.append(time.time() - t0)
shutil.rmtree(stage, ignore_errors=True)
print("BENCH_RESULT " + json.dumps(
    {{"wall": min(walls), "walls": walls, "turns": turns}}))
"""


def _bench_table() -> str:
    from tapes_spark.fixtures import write_transcripts

    path = f"/tmp/tapes_bench_{N_CONVS}x{MED_TURNS}_s42.parquet"
    if not os.path.exists(path):
        write_transcripts(path, n_convs=N_CONVS, median_turns=MED_TURNS, seed=42)
    return path


def _run_pipeline_level(cores: int, path: str) -> tuple[float, int]:
    code = _CHILD_SNIPPET.format(repo=REPO, cores=cores, path=path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            d = json.loads(line[len("BENCH_RESULT "):])
            return d["wall"], d["turns"], d["walls"]
    raise RuntimeError(
        f"bench child ({cores} cores) failed:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def main() -> None:
    out: dict = {"unit": "sec", "sf": SF_DIR, "queries": {}}
    total = 0.0

    path = _bench_table()
    wall_lo, _, walls_lo = _run_pipeline_level(LOW_CPUS, path)
    wall_hi, turns, walls_hi = _run_pipeline_level(CPUS, path)
    tps_hi = turns / wall_hi
    tps_lo = turns / wall_lo
    scaling_eff = (tps_hi / tps_lo) / (CPUS / LOW_CPUS)
    out["pipeline"] = {
        "turns": turns,
        "cores_hi": CPUS,
        "cores_lo": LOW_CPUS,
        "wall_sec_hi": round(wall_hi, 3),
        "wall_sec_lo": round(wall_lo, 3),
        "walls_hi": [round(w, 1) for w in walls_hi],
        "walls_lo": [round(w, 1) for w in walls_lo],
        "turns_per_sec_hi": round(tps_hi, 1),
        "turns_per_sec_lo": round(tps_lo, 1),
        "scaling_efficiency": round(scaling_eff, 3),
    }
    out["queries"]["pipeline_e2e"] = round(wall_hi, 3)
    total += wall_hi

    import __spark_entry__ as entrymod
    from tapes_spark.session import get_spark, stop_spark

    spark = get_spark(
        "tapes-bench-queries", parallelism=CPUS, shuffle_partitions=CPUS
    )
    for name, fn in entrymod.queries().items():
        if name == "jaccard_pairs":
            # brute-force all-pairs is the sf0.01 ORACLE for the LSH path,
            # not a scale query — O(sum df^2) explodes at sf0.1; the LSH
            # variant below is the production operator
            continue
        t0 = time.time()
        fn(spark, SF_DIR).count()
        dt = time.time() - t0
        out["queries"][name] = round(dt, 3)
        total += dt

    from tapes_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    minhash_lsh_pairs(docs, threshold=0.8).count()
    dt = time.time() - t0
    out["queries"]["minhash_lsh_pairs"] = round(dt, 3)
    total += dt
    stop_spark()

    out["metric"] = "e2e_wall_sec_total"
    out["value"] = round(total, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
