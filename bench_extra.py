"""Extra benchmarks (r6) — per-query isolation OUTSIDE the frozen bench.py.

Times each declared query exactly the way bench.py's query phase does
(same session shape, `fn(spark, SF_DIR).count()`), plus the two
production-config LSH queries, with N warm passes and a min/first
report; optionally dumps `.explain("formatted")` per query to a
directory (for plans/r06/).

Usage:
    python bench_extra.py [--passes N] [--plans DIR] [--only q1,q2,...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from tapes_spark.session import get_spark

    spark = get_spark(
        "tapes-bench-extra", parallelism=CPUS,
        shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "0",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    from tapes_spark.operators.dedup import minhash_lsh_pairs
    from tapes_spark.operators.similarity import cosine_dup_pairs_lsh

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.first()["embedding"])

    skip = {
        "jaccard_pairs", "cosine_dup_pairs", "minhash_lsh_pairs",
        "minhash_index_pairs", "simhash_index_pairs",
    }
    fns: dict = {
        name: (lambda fn=fn: fn(spark, SF_DIR))
        for name, fn in entrymod.queries().items()
        if name not in skip
    }
    fns["minhash_lsh_pairs"] = lambda: minhash_lsh_pairs(docs, threshold=0.8)
    fns["cosine_dup_pairs_lsh"] = lambda: cosine_dup_pairs_lsh(
        emb, dim, threshold=0.5
    )
    if args.only:
        only = set(args.only.split(","))
        fns = {k: v for k, v in fns.items() if k in only}

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name, build in fns.items():
            df = build()
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(txt)

    walls: dict[str, list[float]] = {k: [] for k in fns}
    for _p in range(args.passes):
        for name, build in fns.items():
            sc._jvm.System.gc()
            sc.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            build().count()
            walls[name].append(round(time.time() - t0, 3))
    out = {
        "sf": SF_DIR,
        "passes": args.passes,
        "first": {k: v[0] for k, v in walls.items()},
        "min": {k: min(v) for k, v in walls.items()},
        "all": walls,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
