"""Incremental KG construction: Structured Streaming over the files table.

New repo snapshots land as parquet drops in a directory; the stream
extracts the same three triple families as the batch flagship
(plans/pipeline.extract_triples — one mapInPandas pass, reused
verbatim) and appends them per micro-batch. The source checkpoint
gives exactly-once *file* processing across restarts: a re-run after a
crash resumes from the unprocessed drops only.

Design choice — append + compaction, not streaming distinct: a global
``distinct()`` on a stream is a stateful aggregation whose state is
the full distinct-triple set, which grows with the corpus (unbounded,
no watermark can bound it because triples carry no event time). The
scale-safe shape is per-batch dedupe in ``foreachBatch`` + an
idempotent reader-side compaction (``consolidated_triples`` — the same
groupBy plan as the batch exact-dedup), which is how append-only lake
pipelines handle grow-forever key spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.plans.pipeline import extract_triples

# input_hint contract: the files table schema, exactly
FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def read_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over parquet drops of the files table.

    ``maxFilesPerTrigger`` bounds micro-batch size so one giant drop
    cannot force a single batch to hold the whole backlog in memory —
    the streaming analog of ``files.maxPartitionBytes``.
    """
    return (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_incremental(
    spark: SparkSession,
    files_path: str,
    out_dir: str,
    checkpoint_dir: str,
    gazetteer: list[tuple[str, str, str]] | None = None,
) -> None:
    """Drain all currently-available drops (availableNow) into triples.

    Each micro-batch runs the batch extraction plan (so streaming and
    batch can never diverge semantically) and appends its
    batch-distinct triples. Restart-safe: the checkpoint records which
    source files each committed batch consumed; foreachBatch output for
    a replayed batch_id overwrites nothing because triples are
    append-only and the compaction is idempotent under duplicates.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        extract_triples(batch_df, gazetteer).write.mode("append").parquet(out_dir)

    (
        read_file_stream(spark, files_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def consolidated_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    """Reader-side compaction: the globally-distinct triple set.

    One groupBy-shape exchange with map-side partials — identical cost
    profile to the batch pipeline's final distinct, amortized across
    however many appends accumulated.
    """
    return spark.read.parquet(out_dir).select("subj", "pred", "obj").distinct()
