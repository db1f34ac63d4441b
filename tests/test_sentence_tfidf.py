"""Sentence-level TFIDF: frequency maps over sentences, not documents."""

import math

import pytest
from pyspark.sql import functions as F

from sentometrics_spark.lexicons import Lexicons
from sentometrics_spark.scoring.sentences import (
    compute_sentiment_sentences_udf,
    sentence_tfidf_stats,
)


def test_sentence_tfidf_hand_computed(spark):
    lex = Lexicons(lex={"en": {"L": {"fast": 1.0, "slow": -2.0}}})
    pages = spark.createDataFrame(
        [
            ("u0", "2024-01-01 00:00:00", "Fast cars. Slow fast roads.", "en", 1.0),
            ("u1", "2024-01-01 01:00:00", "slow day here.", "en", 1.0),
        ],
        "url string, warc_ts string, text string, lang string, feat_all double",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    stats = sentence_tfidf_stats(pages, lex)
    n, df = stats["en"]
    assert n == 3.0  # three sentences total
    assert df == {"fast": 2.0, "slow": 2.0}

    out = compute_sentiment_sentences_udf(pages, lex, "TFIDF").toPandas()
    w = math.log10(3.0 / (1 + 2.0))
    u0 = out[out.url == "u0"].sort_values("sentence_id")
    assert u0[u0.sentence_id == 1]["score"].iloc[0] == pytest.approx(1.0 * w)
    assert u0[u0.sentence_id == 2]["score"].iloc[0] == pytest.approx((-2.0 + 1.0) * w)
    u1 = out[out.url == "u1"]
    assert u1["score"].iloc[0] == pytest.approx(-2.0 * w)


def test_tokens_passthrough(spark):
    """T3: caller-supplied tokenization overrides the internal tokenizer."""
    from pyspark.sql import functions as F
    from sentometrics_spark.scoring.udf_engine import compute_sentiment_udf

    lex = Lexicons(lex={"en": {"L": {"fast": 1.0}}})
    pages = spark.createDataFrame(
        [("u0", "2024-01-01 00:00:00", "FAST!!! fast", "en", 1.0)],
        "url string, warc_ts string, text string, lang string, feat_all double",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn(
        "my_tokens", F.array(F.lit("fast"))
    )
    default = compute_sentiment_udf(pages, lex, "counts", mode="unigram").toPandas()
    override = compute_sentiment_udf(
        pages, lex, "counts", mode="unigram", tokens_col="my_tokens"
    ).toPandas()
    assert default["score"].iloc[0] == pytest.approx(2.0)
    assert default["word_count"].iloc[0] == 2
    assert override["score"].iloc[0] == pytest.approx(1.0)
    assert override["word_count"].iloc[0] == 1
