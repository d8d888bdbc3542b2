"""SparkSession builder tuned for the log-pipeline workload.

Local testing runs single-JVM (``local[N]``); the same configuration
keys are what we would set on a 1000-executor cluster — AQE on (runtime
re-plan + skew-join splitting), shuffle partitions sized to 2x cores
(2-3 tasks per core is standard cluster guidance: one straggler task
per stage no longer idles the other cores for the whole stage tail —
measured 30-38%% off the 4-core pipeline wall vs 1 task/core), Arrow
enabled for the pandas-UDF normalization path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tapes-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``parallelism`` maps to ``local[N]`` locally; on a real cluster the
    master is taken from the environment / spark-submit and this arg is
    ignored.  ``shuffle_partitions`` defaults to 2x the core count —
    enough task granularity that a straggler partition doesn't idle the
    remaining cores through each stage tail (the dominant thread-scaling
    loss measured at 1 task/core), without 200-partition scheduling
    overhead on tiny local runs.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or 2 * cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        # Fall back from whole-stage codegen exactly where HotSpot's JIT
        # would refuse the generated method anyway: the JVM never JIT-
        # compiles methods over 8000 bytecodes (-XX:DontCompileHugeMethods),
        # so a 8KB-64KB generated stage runs as INTERPRETED bytecode —
        # measured 2x slower than Spark's non-codegen path on the wide
        # parse/classify projections (r6: enriched fragment 16.2s -> 8.5s
        # at 32 cores).  Spark's default (65535) only avoids the hard
        # JVM limit, not the JIT one.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds pandas-UDF memory per task; 10k rows of
        # transcript text ~ a few MB, safe at executor defaults.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship tapes_spark to executors (the local-mode equivalent of
    ``spark-submit --py-files tapes_spark.zip``) so pandas-UDF workers can
    unpickle functions defined in this package regardless of cwd."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "tapes_spark_pyfiles.zip")
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    ):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "tapes_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
