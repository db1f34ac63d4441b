"""Structured Streaming ingestion: micro-batch scoring of incoming pages
into the hour-tier continuous aggregate.

The reference is batch-only; its incremental hook is ``measures_update``
(anti-join new ids, /root/reference/R/sentomeasures_measures_xyz.R:158-176).
Our streaming design keeps the reference's DETERMINISTIC-RECOMPUTE
semantics for late data instead of watermark-dropping:

  - every micro-batch scores its documents (same Arrow UDF as batch) and
    appends (bucket_ts, lexicon, feature, wsum, wden, n_docs...) PARTIAL
    rows to the hour-tier partials table;
  - partials are associative (doc-local weight numerators), so the
    finalized tier value is sum(wsum)/sum(wden) over all partial rows of a
    bucket — a late document just adds one more partial row, and the bucket
    is exact again at next read. No state store required, arbitrarily late
    data folds in, and a compaction pass (rollup on the partials) keeps the
    table small;
  - coarser tiers keep reading from the hour tier exactly as in batch.

This mirrors the batch tier engine bit-for-bit: reading the partials table
finalized equals base_tier() on the union of all micro-batch inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentometrics_spark.aggregate.doc_agg import MEASURE_KEYS
from sentometrics_spark.aggregate.tiers import base_tier
from sentometrics_spark.lexicons import Lexicons
from sentometrics_spark.scoring.udf_engine import compute_sentiment_udf


def read_pages_stream(
    spark: SparkSession, path: str, schema: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def stream_to_hour_tier(
    pages_stream: DataFrame,
    lexicons: Lexicons,
    partials_path: str,
    checkpoint_path: str,
    how_within: str = "proportional",
    how_docs: str = "proportional",
    do_ignore_zeros: bool = True,
    trigger_available_now: bool = True,
):
    """Start the micro-batch query appending hour-tier partials."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.rdd.isEmpty():
            return
        sent = compute_sentiment_udf(batch_df, lexicons, how_within, mode="unigram")
        partials = base_tier(sent, how=how_docs, do_ignore_zeros=do_ignore_zeros, by="hour")
        (
            partials.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(partials_path)
        )

    writer = (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_hour_tier(spark: SparkSession, partials_path: str) -> DataFrame:
    """Finalized hour tier from the streaming partials: re-associate the
    partial sums (late/duplicate-bucket rows fold in exactly)."""
    p = spark.read.parquet(partials_path)
    return (
        p.groupBy("bucket_ts", *MEASURE_KEYS)
        .agg(
            F.sum("wsum").alias("wsum"),
            F.sum("wden").alias("wden"),
            F.sum("n_docs_in").alias("n_docs_in"),
            F.sum("n_docs").alias("n_docs"),
        )
        .withColumn("value", F.coalesce(F.try_divide(F.col("wsum"), F.col("wden")), F.lit(0.0)))
    )


def compact_partials(spark: SparkSession, partials_path: str) -> None:
    """Compaction: rewrite the partials table as one row per bucket (keeps
    the append-only table bounded; on Iceberg this is a rewrite-data-files
    action)."""
    import os
    import shutil

    compacted = finalize_hour_tier(spark, partials_path).withColumn(
        "batch_id", F.lit(-1)
    ).select(
        "bucket_ts", *MEASURE_KEYS, "value", "wsum", "wden", "n_docs_in", "n_docs", "batch_id"
    )
    tmp = partials_path.rstrip("/") + "__compact"
    compacted.write.mode("overwrite").parquet(tmp)
    # local-fs swap; on Iceberg this is an atomic rewrite-data-files commit
    shutil.rmtree(partials_path)
    os.rename(tmp, partials_path)
