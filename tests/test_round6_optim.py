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


def test_simhash_lean_kernel_matches_bit_loop(spark):
    """The round-6 simhash kernel (uint64-lean per-bit reduceat loop)
    must produce bit-identical signatures to the original per-bit
    shift/mask vote loop, reimplemented here as the reference."""
    import numpy as np
    import pandas as pd

    from sentometrics_spark.textops.dedup import simhash

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id").collect()}

    pdf = docs.toPandas()
    pdf = pdf[pdf["text"].notna()]
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(pdf["text"].astype(str))
    toks = pc.split_pattern(pc.utf8_lower(arr), " ")
    flat = pc.list_flatten(toks)
    lens = np.asarray(pc.list_value_length(toks).to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    dic = flat.dictionary_encode()
    idx = np.asarray(dic.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    th = pd.util.hash_array(vocab).astype(np.uint64)[idx]
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sig = np.zeros(len(pdf), dtype=np.uint64)
    for b in range(64):
        contrib = ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
        votes = np.add.reduceat(contrib, offs)
        sig |= (votes > 0).astype(np.uint64) << np.uint64(b)
    want = dict(zip(pdf["doc_id"].to_numpy(), sig.astype(np.int64)))
    # the distributed kernel batches differently but per-doc hashes are
    # batch-independent
    assert got == want


def test_span_cleaning_reaches_fixpoint_on_real_corpus(spark):
    """End-to-end span-cleaning invariant (VERDICT r5 item 3): applying
    remove_repeated_spans to the real corpus leaves NO repeated 8-gram
    span behind — repeated_spans of the cleaned corpus is empty. (Every
    occurrence of a repeated gram is flagged, so removal takes the count
    of each flagged gram to zero; token juxtaposition at span boundaries
    could in principle mint new repeats, which this pins as absent on
    the real corpus.)"""
    from sentometrics_spark.textops.dedup import remove_repeated_spans, repeated_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    spans = repeated_spans(docs, n=8, min_repeats=2)
    assert spans.count() > 0
    cleaned = remove_repeated_spans(docs, spans).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    assert repeated_spans(cleaned, n=8, min_repeats=2).count() == 0


def test_interval_join_left_survives_shuffled_points(spark):
    """ADVICE r5 (medium): interval_join(how='left') joins a surrogate
    row id back across two plan branches. With a shuffle upstream of the
    points input the id must still be consistent (it is pinned with a
    lazy localCheckpoint) — every point survives exactly once."""
    from sentometrics_spark.aggregate.timeseries import interval_join

    pts = (
        spark.range(0, 2000)
        .selectExpr(
            "cast(id % 37 as string) AS k",
            "timestamp_seconds(1704067200 + id * 60) AS ts",
            "cast(id as double) AS v",
        )
        # force a shuffle whose intra-partition order is not a stable
        # function of the scan (groupBy output order is an artifact of
        # hash-table iteration)
        .groupBy("k", "ts")
        .agg(F.sum("v").alias("v"))
    )
    iv = spark.createDataFrame(
        [("0", "2024-01-01 00:00:00", "2024-01-01 23:00:00", "w1")],
        "k string, s string, e string, tag string",
    ).select("k", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"), "tag")
    out = interval_join(pts, iv, on="ts", by=["k"], start="s", end="e", how="left")
    assert out.count() == 2000  # no silent drops / duplications
    assert out.filter(F.col("tag").isNotNull()).count() > 0


def test_doc_weights_exponential_null_bucket_survives(spark):
    """ADVICE r5 (low): the exponential/inverseExponential branch of
    with_doc_weights must keep NULL-bucket rows (null-safe doc_wc join),
    matching the null-safe denominator join contract."""
    from sentometrics_spark.aggregate.doc_agg import with_doc_weights

    s = spark.createDataFrame(
        [
            ("u1", None, 10, "L", "f", 0.5),
            ("u2", None, 30, "L", "f", -0.2),
            ("u3", "2024-01-01 00:00:00", 20, "L", "f", 0.1),
        ],
        "url string, bucket_ts string, word_count int, lexicon string, "
        "feature string, score double",
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    for how in ("exponential", "inverseExponential"):
        out = with_doc_weights(s, how=how).collect()
        assert len(out) == 3, (how, out)
        null_rows = [r for r in out if r["bucket_ts"] is None]
        assert len(null_rows) == 2
        # weights normalize within the NULL-bucket group
        tot = sum(r["weight"] for r in null_rows)
        assert abs(tot - 1.0) < 1e-9


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
