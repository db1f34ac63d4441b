"""Checkpoint/resume with per-partition lineage + throughput metrics
(north rule; generalizes the reference's incremental ``measures_update``
— score only not-yet-processed documents, /root/reference/R/sentomeasures_measures_xyz.R:158-176).

Design:
  - Work is partitioned by a deterministic partition key (default:
    (lang, day(warc_ts))) — the same key the engine shuffles on.
  - A manifest table rows: (partition_key, source_snapshot_id, rows_in,
    rows_out, bytes_out, wall_ms, status, run_id, batch_id).
  - ``pending_partitions`` = all partitions LEFT ANTI JOIN manifest(done) —
    resume processes only those, so resume-after-crash equals a cold run.
  - Each key batch writes its results into its OWN directory
    ``results/__batch=<uuid>`` (Hive-style, so the base path reads back as
    one table with a ``__batch`` partition column). rows_out is counted from
    that directory's parquet footers — O(batch) metadata, never a rescan of
    the accumulated results (a full re-read per batch would be quadratic
    over a long run).
  - Crash between the results append and the manifest append leaves an
    orphan batch directory whose keys are still pending; ``run()`` deletes
    orphans (batch dirs absent from the 'done' manifest) before resuming,
    and ``results()`` additionally filters to manifest-done batches, so
    duplicates cannot surface either way.

On a real cluster manifest+results live in Iceberg tables (atomic commits
per partition batch); here: parquet directories with the same semantics.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "partition_key string, source_snapshot_id string, rows_in long, "
    "rows_out long, wall_ms long, status string, run_id string, batch_id string"
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

    def _done_batch_ids(self) -> set[str]:
        return {
            r["batch_id"]
            for r in self.manifest()
            .filter(F.col("status") == "done")
            .select("batch_id")
            .distinct()
            .collect()
        }

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

    # -- filesystem helpers (Hadoop FS so the same code runs on HDFS/S3A) --

    def _fs_and_path(self, path: str):
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, p

    def _cleanup_orphans(self) -> list[str]:
        """Delete result batch dirs not recorded 'done' in the manifest —
        leftovers of a crash between results append and manifest append.
        Their partition keys are still pending, so they will be recomputed."""
        fs, p = self._fs_and_path(self.results_path)
        if not fs.exists(p):
            return []
        done = self._done_batch_ids()
        removed = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("__batch="):
                bid = name.split("=", 1)[1]
                if bid not in done:
                    fs.delete(st.getPath(), True)
                    removed.append(bid)
        return removed

    # -- result schema (for empty-state reads) ------------------------------

    @property
    def _schema_path(self) -> str:
        return f"{self.root}/_schema"

    def _save_schema(self, result: DataFrame) -> None:
        """Pin the result schema once (a zero-row parquet) so results()
        stays readable when no batch has committed yet."""
        fs, p = self._fs_and_path(self._schema_path)
        if not fs.exists(p):
            result.limit(0).write.mode("overwrite").parquet(self._schema_path)

    # -- run --------------------------------------------------------------

    def run(
        self,
        source: DataFrame,
        process_fn,
        batch_partitions: int = 64,
        snapshot_id: str = "snap0",
    ) -> dict:
        """Process all pending partitions in key batches; returns metrics.
        Each batch: compute -> write results to its own batch dir -> append
        manifest rows (results-before-manifest ordering makes a crash
        re-process, never lose, a batch; orphan dirs are swept on entry)."""
        orphans = self._cleanup_orphans()
        pending = self.pending(source).persist()
        keys = [r["__pk"] for r in pending.select("__pk").distinct().collect()]
        keys.sort()
        metrics = {
            "batches": 0,
            "partitions": 0,
            "rows_in": 0,
            "rows_out": 0,
            "wall_ms": 0,
            "orphans_removed": len(orphans),
        }
        for i in range(0, len(keys), batch_partitions):
            batch_keys = keys[i : i + batch_partitions]
            batch_id = uuid.uuid4().hex[:12]
            t0 = time.time()
            batch_src = pending.filter(F.col("__pk").isin(batch_keys))
            rows_in_by_key = {
                r["__pk"]: r["n"]
                for r in batch_src.groupBy("__pk").agg(F.count("*").alias("n")).collect()
            }
            result = process_fn(batch_src.drop("__pk"))
            self._save_schema(result)
            batch_dir = f"{self.results_path}/__batch={batch_id}"
            result.write.mode("overwrite").parquet(batch_dir)
            # O(batch) metadata read: parquet count() comes from footers of
            # this batch's files only, not a rescan of accumulated results
            n_out = self.spark.read.parquet(batch_dir).count()
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
                        batch_id,
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
        """All committed results: batches recorded 'done' in the manifest.
        __batch is a Hive partition column, so the isin filter prunes
        directories at scan time."""
        done = sorted(self._done_batch_ids())
        if not done:
            # nothing committed yet (fresh run, or crash-recovery swept the
            # only orphaned batch): an empty frame in the pinned result
            # schema, not a read error on a missing/empty parquet path
            fs, p = self._fs_and_path(self._schema_path)
            if fs.exists(p):
                return self.spark.read.parquet(self._schema_path)
            raise RuntimeError(
                "no committed results and no pinned schema yet: call run() first"
            )
        df = self.spark.read.parquet(self.results_path)
        return df.filter(F.col("__batch").isin(done)).drop("__batch")
