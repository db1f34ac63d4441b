"""Gorilla codec: exact round-trip, compression ratio, Spark packing job."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sentometrics_spark.storage.gorilla import (
    compress_series_df,
    decode,
    decompress_blob_rows,
    encode,
)


def test_roundtrip_regular_series():
    ts = np.arange(0, 3600 * 100, 3600, dtype=np.int64) + 1_700_000_000
    vals = np.sin(np.arange(100) / 7.0) * 0.25
    blob = encode(ts, vals)
    ts2, vals2 = decode(blob)
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(vals, vals2)  # bit-exact


def test_roundtrip_irregular_and_extremes():
    ts = np.array([0, 1, 100, 101, 10**10, 10**10 + 1], dtype=np.int64)
    vals = np.array([0.0, -0.0, 1e-300, 1e300, -1.5, 0.1])
    ts2, vals2 = decode(encode(ts, vals))
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(vals.view(np.uint64), vals2.view(np.uint64))


def test_empty_and_single():
    ts2, vals2 = decode(encode(np.array([], dtype=np.int64), np.array([])))
    assert len(ts2) == 0
    ts2, vals2 = decode(encode(np.array([5], dtype=np.int64), np.array([1.25])))
    assert ts2.tolist() == [5] and vals2.tolist() == [1.25]


def test_compression_ratio_on_smooth_series():
    """Regular timestamps + slowly-varying values must beat raw 16 B/point
    comfortably (the Gorilla paper's motivating case)."""
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 3600
    vals = np.round(np.cumsum(np.random.RandomState(42).choice([0.0, 0.01, -0.01], n)), 2)
    raw = 16 * n
    ratio = raw / len(encode(ts, vals))
    assert ratio > 2.5, f"random-walk ratio only {ratio:.1f}x"
    # sparse/repetitive series (the common case for zero-filled sentiment
    # measures) compresses dramatically
    sparse = np.where(np.arange(n) % 50 == 0, 0.125, 0.0)
    ratio2 = raw / len(encode(ts, sparse))
    assert ratio2 > 15, f"sparse ratio only {ratio2:.1f}x"


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_roundtrip_property(pairs):
    pairs.sort()
    ts = np.array([p[0] for p in pairs], dtype=np.int64)
    vals = np.array([p[1] for p in pairs])
    ts2, vals2 = decode(encode(ts, vals))
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(vals.view(np.uint64), vals2.view(np.uint64))


def test_spark_pack_unpack(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rows = []
    for lx in ("LEXA", "LEXB"):
        for d in range(50):
            rows.append((f"2024-01-01 {d % 24:02d}:00:00", lx, "f1", "eq", d * 0.01))
    df = spark.createDataFrame(
        rows, "bucket_ts string, lexicon string, feature string, timeweight string, value double"
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    packed = compress_series_df(df).collect()
    assert len(packed) == 2
    assert all(r["n_points"] == 50 for r in packed)
    back = decompress_blob_rows(packed)
    assert len(back) == 100
    src = df.toPandas()
    for lx in ("LEXA", "LEXB"):
        a = src[src.lexicon == lx].sort_values("bucket_ts")["value"].to_numpy()
        b = back[back.lexicon == lx].sort_values("bucket_ts")["value"].to_numpy()
        np.testing.assert_array_equal(np.sort(a), np.sort(b))
