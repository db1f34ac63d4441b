"""Checkpoint/resume with per-partition lineage + throughput metrics
(north rule; generalizes the reference's incremental ``measures_update``
— score only not-yet-processed documents, /root/reference/R/sentomeasures_measures_xyz.R:158-176).

Design:
  - Work is partitioned by a deterministic partition key (default:
    (lang, day(warc_ts))) — the same key the engine shuffles on.
  - A manifest table rows: (partition_key, source_snapshot_id, rows_in,
    rows_out, bytes_out, wall_ms, status, finished_at_run).
  - ``pending_partitions`` = all partitions LEFT ANTI JOIN manifest(done) —
    resume processes only those, so resume-after-crash equals a cold run.
  - Results append per partition; a re-run of a 'done' partition is a no-op.

On a real cluster manifest+results live in Iceberg tables (atomic commits
per partition batch); here: parquet directories with the same semantics.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "partition_key string, source_snapshot_id string, rows_in long, "
    "rows_out long, wall_ms long, status string, run_id string"
)


def partition_key_col(lang_col: str = "lang", ts_col: str = "warc_ts"):
    return F.concat_ws("|", F.col(lang_col), F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd"))


class CheckpointedRun:
    """Drives a partition-wise computation with resume.

    process_fn: (DataFrame of one-or-more partitions) -> DataFrame result.
    The unit of checkpointing is the partition KEY GROUP (batched to avoid
    one Spark job per tiny partition)."""

    def __init__(self, spark: SparkSession, root: str, run_id: str = "run"):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        self.manifest_path = f"{root}/_manifest"
        self.results_path = f"{root}/results"

    # -- manifest ---------------------------------------------------------

    def manifest(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.manifest_path)
        except Exception:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def done_keys(self) -> DataFrame:
        return (
            self.manifest()
            .filter(F.col("status") == "done")
            .select("partition_key")
            .distinct()
        )

    def pending(self, source: DataFrame) -> DataFrame:
        """Source rows whose partition has no 'done' manifest entry
        (the left_anti resume join)."""
        keyed = source.withColumn("__pk", partition_key_col())
        return keyed.join(
            self.done_keys().withColumnRenamed("partition_key", "__pk"),
            "__pk",
            "left_anti",
        )

    def _append_manifest(self, rows: list[tuple]) -> None:
        df = self.spark.createDataFrame(rows, MANIFEST_SCHEMA)
        df.write.mode("append").parquet(self.manifest_path)

    # -- run --------------------------------------------------------------

    def run(
        self,
        source: DataFrame,
        process_fn,
        batch_partitions: int = 64,
        snapshot_id: str = "snap0",
    ) -> dict:
        """Process all pending partitions in key batches; returns metrics.
        Each batch: compute -> append results -> append manifest rows
        (results-before-manifest ordering makes a crash re-process, never
        lose, a batch)."""
        pending = self.pending(source).persist()
        keys = [r["__pk"] for r in pending.select("__pk").distinct().collect()]
        keys.sort()
        metrics = {"batches": 0, "partitions": 0, "rows_in": 0, "rows_out": 0, "wall_ms": 0}
        for i in range(0, len(keys), batch_partitions):
            batch_keys = keys[i : i + batch_partitions]
            t0 = time.time()
            batch_src = pending.filter(F.col("__pk").isin(batch_keys))
            rows_in_by_key = {
                r["__pk"]: r["n"]
                for r in batch_src.groupBy("__pk").agg(F.count("*").alias("n")).collect()
            }
            result = process_fn(batch_src.drop("__pk"))
            result = result.withColumn("__pk_batch", F.lit(i // batch_partitions))
            result.write.mode("append").parquet(self.results_path)
            n_out = self.spark.read.parquet(self.results_path).filter(
                F.col("__pk_batch") == i // batch_partitions
            ).count()
            wall_ms = int((time.time() - t0) * 1000)
            self._append_manifest(
                [
                    (
                        k,
                        snapshot_id,
                        int(rows_in_by_key.get(k, 0)),
                        int(n_out),
                        wall_ms,
                        "done",
                        self.run_id,
                    )
                    for k in batch_keys
                ]
            )
            metrics["batches"] += 1
            metrics["partitions"] += len(batch_keys)
            metrics["rows_in"] += sum(rows_in_by_key.values())
            metrics["rows_out"] += n_out
            metrics["wall_ms"] += wall_ms
        pending.unpersist()
        if metrics["wall_ms"]:
            metrics["rows_per_sec"] = round(metrics["rows_in"] / (metrics["wall_ms"] / 1000), 1)
        return metrics

    def results(self) -> DataFrame:
        return self.spark.read.parquet(self.results_path).drop("__pk_batch")
