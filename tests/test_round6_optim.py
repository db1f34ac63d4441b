"""Round-6 optimization equivalence tests: every rewrite in the
optimization round keeps operator outputs identical (same rows, same
values) while changing only the physical plan / kernel. Each test pins a
rewritten operator against its slow-but-simple formulation or its
alternate hash path on REAL sf0.001 data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_repeated_spans_arrow_kernel_matches_md5_path(spark):
    """The production gram-hash Arrow kernel (pd.util.hash_array token mix)
    and the md5 expression path hash gram CONTENT differently but must
    flag identical spans — span output is hash-independent modulo 64-bit
    collisions."""
    from sentometrics_spark.textops.dedup import repeated_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    cols = ["doc_id", "span_start", "span_end"]
    fast = _rows(repeated_spans(docs, n=8, min_repeats=2, hash_fn="xxhash64"), cols)
    slow = _rows(repeated_spans(docs, n=8, min_repeats=2, hash_fn="md5"), cols)
    assert fast == slow
    assert len(fast) > 0  # the real corpus carries repeated boilerplate


def test_duplicated_spans_window_form_matches_join_form(spark):
    """duplicated_spans' window-count rewrite == the original
    groupBy + left_semi formulation, rebuilt inline here."""
    from pyspark.sql.window import Window

    from sentometrics_spark.textops.dedup import _gram_positions, duplicated_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    cols = ["doc_id", "start_pos", "end_pos"]
    new = _rows(duplicated_spans(docs, min_len=8), cols)

    g = _gram_positions(docs, "doc_id", "text", 8, "xxhash64").withColumnRenamed(
        "g", "h"
    )
    dup_h = g.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") > 1).select("h")
    flagged = g.join(dup_h, "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > 8, F.lit(1)).otherwise(F.lit(0))
    islands = flagged.withColumn(
        "grp",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    old = _rows(
        islands.groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("start_pos"), (F.max("pos") + 8).alias("end_pos"))
        .drop("grp"),
        cols,
    )
    assert new == old
    assert len(new) > 0


def test_gram_arrow_kernel_null_and_short_docs(spark):
    """Kernel edge cases: NULL text contributes no gram rows (module NULL
    convention), docs shorter than n contribute none, and a doc of
    exactly n tokens contributes one gram at pos 0."""
    from sentometrics_spark.textops.dedup import _gram_positions

    df = spark.createDataFrame(
        [
            (1, None),
            (2, "a b"),
            (3, "a b c"),
            (4, "x y z w"),
        ],
        "doc_id long, text string",
    )
    rows = _rows(
        _gram_positions(df, "doc_id", "text", 3, "xxhash64").select("doc_id", "pos"),
        ["doc_id", "pos"],
    )
    assert rows == [(3, 0), (4, 0), (4, 1)]
