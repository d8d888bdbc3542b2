"""Noop-sink fragment ladder for the enriched stage (guide §1.4).

Times, at a given core count over a hash-subset of the bench table, the
incremental cost of each build_enriched fragment plus the staged writes,
so stage_writes wall is attributable operator by operator.

Usage:
    python tools/profile_fragments.py [cores] [subset_mod] [passes]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 1
subset_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 4
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2

import bench  # noqa: E402

path = bench._bench_table(int(os.environ.get("BENCH_CONVS", "200000")))

from pyspark.sql import functions as F  # noqa: E402

from tapes_spark.session import get_spark  # noqa: E402
from tapes_spark import pipeline as P  # noqa: E402
from tapes_spark.operators.classify import with_call_kind  # noqa: E402
from tapes_spark.operators.dropreason import with_drop_reason  # noqa: E402
from tapes_spark.operators.enrich import (  # noqa: E402
    enrich_pricing_static,
    enrich_role_static,
)
from tapes_spark.operators.parse import with_parsed_features  # noqa: E402
from tapes_spark.functions.normalize import (  # noqa: E402
    normalize_whitespace_col,
    normalized_and_preview_cols,
)

spark = get_spark(
    f"tapes-frag-{cores}", parallelism=cores,
    shuffle_partitions=2 * cores,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "2m",
        "spark.sql.files.openCostInBytes": "0",
        "spark.ui.showConsoleProgress": "false",
    },
)
sc = spark.sparkContext
tx_full = spark.read.parquet(path)
tx = (
    tx_full.filter(F.pmod(F.xxhash64("conv_id"), F.lit(subset_mod)) == 0)
    if subset_mod > 1
    else tx_full
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def frag_scan():
    noop(tx)


def frag_dropreason():
    noop(with_drop_reason(tx))


def _valid():
    flagged = with_drop_reason(tx)
    return flagged.filter(F.col("drop_reason").isNull()).drop("drop_reason")


def _tagged_branch():
    # mirrors build_enriched's CURRENT shape: the branches consume only
    # raw text (parse runs AFTER the union since r6 commit afa8f58 —
    # keeping this ladder in sync with pipeline.py matters, or it
    # profiles a plan the pipeline no longer runs)
    maybe_tagged = F.coalesce(F.col("text").contains("<"), F.lit(False))
    text_norm, text_preview = normalized_and_preview_cols(F.col("text"))
    n_slots = max(1, sc.defaultParallelism)
    return (
        _valid().filter(maybe_tagged)
        .coalesce(n_slots)
        .withColumn("text_norm", text_norm)
        .withColumn("text_preview", F.substring(text_preview, 1, 120))
    )


def _plain_branch():
    maybe_tagged = F.coalesce(F.col("text").contains("<"), F.lit(False))
    ws_only = normalize_whitespace_col(F.col("text"))
    return (
        _valid().filter(~maybe_tagged)
        .withColumn("text_norm", ws_only)
        .withColumn("text_preview", F.lit(None).cast("string"))
    )


def _normalized():
    return _tagged_branch().unionByName(_plain_branch())


def frag_normalize():
    noop(_normalized())


def frag_tagged_branch():
    noop(_tagged_branch())


def frag_plain_branch():
    noop(_plain_branch())


def frag_parse():
    noop(with_parsed_features(_normalized()))


def _enriched_pre_exchange():
    classified = with_call_kind(with_parsed_features(_normalized()))
    enriched = enrich_pricing_static(enrich_role_static(classified))
    keep_raw = (
        (F.col("role") == "tool")
        | ((F.col("role") == "assistant") & (F.col("tool") != ""))
        | ((F.col("role") == "user") & F.col("text").contains("<transcript>"))
        | F.col("call_kind").isin("check", "title")
    )
    return enriched.withColumn("text", F.when(keep_raw, F.col("text")))


def frag_classify_enrich():
    noop(_enriched_pre_exchange())


def frag_exchange_windows():
    from tapes_spark.operators import aggregate as agg
    from tapes_spark.operators.joins import (
        with_first_capture,
        with_resume_boundary,
    )

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    co = _enriched_pre_exchange().repartition(n_parts, "conv_id")
    noop(with_resume_boundary(agg.with_traces(with_first_capture(co))))


def frag_full_stage():
    stage = f"/dev/shm/tapes_frag_{cores}_{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    res = P.run_pipeline(spark, tx, stage_dir=stage)
    res.unpersist()
    shutil.rmtree(stage, ignore_errors=True)


FRAGS = [
    ("scan", frag_scan),
    ("dropreason", frag_dropreason),
    ("tagged_branch", frag_tagged_branch),
    ("plain_branch", frag_plain_branch),
    ("normalize_union", frag_normalize),
    ("parse", frag_parse),
    ("classify_enrich", frag_classify_enrich),
    ("exchange_windows", frag_exchange_windows),
    ("full_stage_writes", frag_full_stage),
]

only = os.environ.get("FRAGS")
if only:
    keep = set(only.split(","))
    FRAGS = [f for f in FRAGS if f[0] in keep]

for p in range(passes):
    print(f"== pass {p} (cores={cores}, subset=1/{subset_mod}) ==", flush=True)
    for name, fn in FRAGS:
        sc._jvm.System.gc()
        time.sleep(0.5)
        sc.setJobDescription(f"frag: {name}")
        t0 = time.time()
        fn()
        print(f"  {name:24s} {time.time() - t0:8.2f}s", flush=True)
    sc.setJobDescription(None)
