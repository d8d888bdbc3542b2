"""Profile ONE scaling leg of the bench pipeline with Spark event logs.

Mimics bench.py's child protocol (local-cluster executor mode, pinned
externally via taskset, 1/8-subset warmup, discarded full-size warm
passes) but records a Spark event log so tools/analyze_evlog.py can
attribute the 1->4 executor scaling gap: task occupancy vs wall, stage
straggler tails, scheduler gaps between jobs, GC, shuffle costs.

Usage (pin externally, disjoint cpusets, like the bench):
    taskset -c 0   python tools/profile_scaling.py 1 /tmp/evlog_1 2
    taskset -c 1-4 python tools/profile_scaling.py 4 /tmp/evlog_4 2

argv: cores evlog_dir n_measured [warm_full_passes]
Prints one line per pass:  PASS <idx> <t_start_ms> <t_end_ms> <wall_s>
(warm passes print WARM instead of PASS; the analyzer windows on these).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
evdir = sys.argv[2]
n_meas = int(sys.argv[3]) if len(sys.argv) > 3 else 1
warm_full = (
    int(sys.argv[4]) if len(sys.argv) > 4 else max(1, min(4, 4 // cores))
)

os.makedirs(evdir, exist_ok=True)
os.environ["SPARK_MASTER"] = f"local-cluster[{cores},1,7168]"

from tapes_spark.pipeline import materialize_sinks, run_pipeline  # noqa: E402
from tapes_spark.session import get_spark  # noqa: E402

PATH = os.environ.get(
    "PROFILE_TABLE", "/tmp/tapes_bench_200000x30_s42_0a34dd8a.parquet"
)
stage = f"/dev/shm/tapes_prof_stage_{cores}"
extra = {
    "spark.sql.files.maxPartitionBytes": "2m",
    "spark.sql.files.openCostInBytes": "0",
    "spark.executor.memory": "6g",
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": f"file://{evdir}",
    "spark.ui.showConsoleProgress": "false",
}
# optional overrides under test (analyzer compares protocols)
if os.environ.get("PROFILE_SHUFFLE_PARTS"):
    shuffle = int(os.environ["PROFILE_SHUFFLE_PARTS"])
else:
    shuffle = 2 * cores
spark = get_spark(
    f"tapes-prof-{cores}", parallelism=cores,
    shuffle_partitions=shuffle, extra_conf=extra,
)
tx = spark.read.parquet(PATH)
print(f"TURNS {tx.count()}", flush=True)

warm = run_pipeline(
    spark, tx.filter("pmod(xxhash64(conv_id), 8) = 0"),
    stage_dir=stage + "_warm",
)
materialize_sinks(warm)
shutil.rmtree(stage + "_warm", ignore_errors=True)


def one_pass(tag: str, idx: int) -> None:
    shutil.rmtree(stage, ignore_errors=True)
    t0 = time.time()
    res = run_pipeline(spark, tx, stage_dir=stage)
    materialize_sinks(res)
    t1 = time.time()
    print(
        f"{tag} {idx} {int(t0 * 1000)} {int(t1 * 1000)} "
        f"{round(t1 - t0, 1)}",
        flush=True,
    )


for i in range(warm_full):
    one_pass("WARM", i)
for i in range(n_meas):
    one_pass("PASS", i)

# control leg for the same analysis (plan-free scan->repartition->write)
for i in range(int(os.environ.get("PROFILE_CTL_PASSES", "1"))):
    shutil.rmtree(stage + "_ctl", ignore_errors=True)
    t0 = time.time()
    tx.repartition(cores, "conv_id").write.mode("overwrite").parquet(
        stage + "_ctl"
    )
    t1 = time.time()
    print(
        f"CTL {i} {int(t0 * 1000)} {int(t1 * 1000)} {round(t1 - t0, 1)}",
        flush=True,
    )

shutil.rmtree(stage, ignore_errors=True)
shutil.rmtree(stage + "_ctl", ignore_errors=True)
spark.stop()
print("PROFILE_DONE " + json.dumps({"cores": cores, "evdir": evdir}))
