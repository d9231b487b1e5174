"""spark-submit entry point for the KG construction pipeline.

Cluster usage (the north-rule deployment path — run the identical job
at N and 4N executors and compare triples/sec):

    scripts/build_pyfiles.sh          # -> dist/ner_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/ner_spark.zip \
        jobs/run_kg.py \
        --input  /data/files_parquet \
        --output /data/triples \
        --checkpoint-root /data/kg_checkpoints

Local smoke (what the sandbox test does):

    spark-submit --master 'local[8]' --py-files dist/ner_spark.zip \
        jobs/run_kg.py --synth 2000 --output /tmp/kg_out \
        --checkpoint-root /tmp/kg_ckpt

The job is resumable: re-submitting with the same --checkpoint-root
skips every completed stage (see ner_spark.plans.checkpoint).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="KG triple extraction job")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir with (repo,path,commit,lang,content)")
    src.add_argument("--synth", type=int, help="generate N synthetic files instead")
    p.add_argument("--output", required=True, help="output parquet dir for triples")
    p.add_argument("--checkpoint-root", required=True)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("ner_spark_kg")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ner_spark import synth
    from ner_spark.plans.checkpoint import run_kg_checkpointed

    if args.synth is not None:
        files_path = f"{args.checkpoint_root}/synth_files"
        synth.synth_files(spark, args.synth).write.mode("overwrite").parquet(files_path)
    else:
        files_path = args.input

    t0 = time.perf_counter()
    triples = run_kg_checkpointed(spark, files_path, args.checkpoint_root)
    triples.write.mode("overwrite").partitionBy("pred").parquet(args.output)
    elapsed = time.perf_counter() - t0
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "triples": n,
                "sec": round(elapsed, 3),
                "triples_per_sec": round(n / elapsed, 1),
                "output": args.output,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
