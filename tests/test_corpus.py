"""Corpus construction (S1-S7): schema, the byte-identical text-extraction
invariant, feature bounds, summarize."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sentometrics_spark.corpus import (
    add_features,
    build_pages,
    corpus_summarize,
    extract_text,
    feature_columns,
    validate_corpus,
)


def test_pages_schema(pages):
    types = dict(pages.dtypes)
    assert types["url"] == "string"
    assert types["warc_ts"] == "timestamp"
    assert types["html"] == "binary"
    assert types["text"] == "string"
    assert types["lang"] == "string"
    for f in feature_columns(pages):
        assert types[f] == "double"


def test_url_unique(pages):
    n = pages.count()
    assert pages.select("url").distinct().count() == n


def test_extract_text_byte_identical(pages):
    """North-rule per-row invariant: engine-extracted text from html must be
    byte-identical to the stored text column, per url."""
    chk = pages.select(
        (extract_text(F.col("html")) == F.col("text")).alias("ok"),
        (F.length(extract_text(F.col("html")).cast("binary")) == F.length(F.col("text").cast("binary"))).alias("len_ok"),
    )
    agg = chk.agg(F.count("*").alias("n"), F.sum(F.col("ok").cast("int")).alias("n_ok"),
                  F.sum(F.col("len_ok").cast("int")).alias("n_len_ok")).collect()[0]
    assert agg["n"] > 0
    assert agg["n_ok"] == agg["n"]
    assert agg["n_len_ok"] == agg["n"]


def test_features_in_unit_interval(pages):
    feats = feature_columns(pages)
    aggs = []
    for f in feats:
        aggs += [F.min(f).alias(f"mn_{f}"), F.max(f).alias(f"mx_{f}")]
    r = pages.agg(*aggs).collect()[0]
    for f in feats:
        assert r[f"mn_{f}"] >= 0.0
        assert r[f"mx_{f}"] <= 1.0


def test_add_features_keyword_and_bounds(pages):
    out = add_features(pages, keywords={"kwquery": "query"})
    assert "feat_kwquery" in out.columns
    mn, mx = out.agg(F.min("feat_kwquery"), F.max("feat_kwquery")).collect()[0]
    assert mn >= 0.0 and mx <= 1.0
    counts = add_features(pages, keywords={"kwc": "query"}, do_binary=False)
    mn, mx = counts.agg(F.min("feat_kwc"), F.max("feat_kwc")).collect()[0]
    assert mn >= 0.0 and mx <= 1.0
    with pytest.raises(ValueError):
        add_features(pages, keywords={"bad-name": "x"})


def test_validate_corpus_rescales(spark):
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "t", "en", 5.0), ("u2", "2024-01-02 00:00:00", "t", "en", -5.0)],
        "url string, warc_ts string, text string, lang string, feat_x double",
    )
    out = validate_corpus(df).toPandas()
    assert out["feat_x"].min() == 0.0
    assert out["feat_x"].max() == 1.0


def test_validate_corpus_dummy_feature(spark):
    df = spark.createDataFrame(
        [("u1", "2024-01-01", "t", "en")], "url string, warc_ts string, text string, lang string"
    )
    out = validate_corpus(df)
    assert "feat_dummy" in out.columns


def test_corpus_summarize_vs_duckdb(pages, sf_dir):
    import duckdb

    got = corpus_summarize(pages, by="day").toPandas()
    exp = duckdb.sql(
        f"""
        SELECT date_trunc('day', TIMESTAMP '2024-01-01 00:00:00'
                 + (doc_id % 90) * INTERVAL 1 DAY
                 + ((doc_id * 37) % 1440) * INTERVAL 1 MINUTE) AS bucket_ts,
               count(*) AS documents,
               sum(len(string_split(text, ' '))) AS totalTokens
        FROM '{sf_dir}/documents.parquet'
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert len(got) == len(exp)
    got = got.sort_values("bucket_ts").reset_index(drop=True)
    assert (got["documents"].to_numpy() == exp["documents"].to_numpy()).all()
    assert (got["totalTokens"].to_numpy() == exp["totalTokens"].to_numpy()).all()


def test_summarize_rejects_hour(pages):
    with pytest.raises(ValueError):
        corpus_summarize(pages, by="minute")
