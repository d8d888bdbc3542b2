"""Attribute one bench-pipeline pass to its phases and sinks.

Times, serially and with job labels: the enriched stage write, the
tool_tape stage write, then each sink's count() one at a time — so each
phase's wall is attributable (the bench's concurrent materialize_sinks
hides attribution).  Then one concurrent materialize pass for the honest
combined wall.  Use the same table bench.py uses.

Usage:
    python tools/profile_pipeline.py [cores] [n_convs]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 200000

import bench  # noqa: E402  (reuses its cached table path/generator)

path = bench._bench_table(n_convs)

from tapes_spark.session import get_spark  # noqa: E402
from tapes_spark.pipeline import run_pipeline  # noqa: E402

stage = f"/dev/shm/tapes_profile_stage_{cores}_{os.getpid()}"
shutil.rmtree(stage, ignore_errors=True)

spark = get_spark(
    f"tapes-profile-{cores}", parallelism=cores,
    shuffle_partitions=2 * cores,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "2m",
        "spark.sql.files.openCostInBytes": "0",
        "spark.ui.showConsoleProgress": "false",
    },
)
sc = spark.sparkContext
tx = spark.read.parquet(path)

n_passes = int(os.environ.get("PROFILE_PASSES", "2"))
for p in range(n_passes):
    shutil.rmtree(stage, ignore_errors=True)
    sc._jvm.System.gc()
    time.sleep(1.0)
    t_all0 = time.time()
    walls: dict[str, float] = {}

    # -- build_enriched + stage writes (run_pipeline with stage_dir does
    #    enriched write+read and tool_tape write+read eagerly)
    t0 = time.time()
    sc.setJobDescription("stage: enriched+tool_tape write")
    res = run_pipeline(spark, tx, stage_dir=stage)
    walls["stage_writes"] = time.time() - t0

    # -- each sink serially
    counts = {}
    for name, df in res.sinks.items():
        t0 = time.time()
        sc.setJobDescription(f"sink: {name}")
        counts[name] = df.count()
        walls[f"sink_{name}"] = time.time() - t0
    sc.setJobDescription(None)
    walls["TOTAL_serial"] = time.time() - t_all0

    print(f"== pass {p} (cores={cores}, convs={n_convs}) ==")
    for k, v in sorted(walls.items(), key=lambda kv: -kv[1]):
        print(f"  {k:32s} {v:8.2f}s")
    print("  counts:", counts, flush=True)

# one honest concurrent pass for the combined wall
from tapes_spark.pipeline import materialize_sinks  # noqa: E402

shutil.rmtree(stage, ignore_errors=True)
sc._jvm.System.gc()
time.sleep(1.0)
t0 = time.time()
res = run_pipeline(spark, tx, stage_dir=stage)
t_stage = time.time() - t0
materialize_sinks(res)
print(f"== concurrent pass: stage={t_stage:.2f}s total={time.time() - t0:.2f}s",
      flush=True)
shutil.rmtree(stage, ignore_errors=True)
