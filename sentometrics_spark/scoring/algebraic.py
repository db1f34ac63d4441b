"""Algebraic (pure-Catalyst) sentiment scoring: explode -> broadcast lexicon
join -> aggregate. No Python executes in this path — every stage is JVM-side
whole-stage-codegen'd, so it is the preferred formulation for the within-doc
schemes whose math is a per-token product of (polarity x position/frequency
weight):

    counts, proportional, proportionalSquareRoot, proportionalPol,
    UShaped, inverseUShaped, exponential, inverseExponential, TFIDF

(Semantics: C++ kernels /root/reference/src/SentimentScorerOnegrams.h:32-77 +
update_token_weights//update_token_scores /root/reference/src/utils.h:86-175.)

The valence (bigram/cluster) and sentence engines need sequential per-doc
state and live in the Arrow-UDF engine (udf_engine.py); the bigram engine
has an algebraic cross-check here via a lag() window.

Output is the long-format sentiment table:

    (url, warc_ts, lang, word_count, lexicon, feature, score)

with one row per (document x lexicon x feature) — zero scores materialized
(NA => 0 convention, /root/reference/R/sentiment_engines.R:103-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentometrics_spark.corpus import check_language_coverage, feature_columns
from sentometrics_spark.lexicons import Lexicons

ALGEBRAIC_HOWS = (
    "counts",
    "proportional",
    "proportionalSquareRoot",
    "proportionalPol",
    "UShaped",
    "inverseUShaped",
    "exponential",
    "inverseExponential",
    "TFIDF",
)


def lexicon_df(spark: SparkSession, lexicons: Lexicons) -> DataFrame:
    return spark.createDataFrame(lexicons.rows(), "lang string, lexicon string, word string, y double")


def valence_df(spark: SparkSession, lexicons: Lexicons) -> DataFrame:
    """Full valence table, lexicon overlaps INCLUDED: the reference keeps a
    word that is both a lexicon and a valence entry (sento_lexicons only
    drops multiword/duplicate rows, /root/reference/R/sentolexicons.R:96-111)
    and the bigram scorer looks the preceding token up in valenceMap
    unconditionally (/root/reference/src/SentimentScorerBigrams.h:68-71),
    so an overlap word both scores and shifts."""
    return spark.createDataFrame(
        lexicons.valence_rows(), "lang string, word string, vy double, vt int"
    )


def _tokens(col=None):
    """JVM-side UAX-29 word tokenization: the SAME pass pipeline as the
    Arrow engine (scoring/tokenize.py), expressed as a regexp_replace chain
    (Java regex accepts the RE2 patterns; only backreference syntax
    differs). A per-row CASE short-circuits pure-[a-z ] rows to a plain
    space split, so clean corpora never pay the replace chain."""
    from sentometrics_spark.scoring.tokenize import (
        _NOT_SIMPLE,
        _PASSES,
        ENDS_NUMBER,
        HAS_LETTER,
        SPLIT_PATTERN,
    )

    c = col if col is not None else F.col("text")
    low = F.lower(c)
    full = low
    for pat, rep in _PASSES:
        full = F.regexp_replace(full, pat, rep.replace("\\1", "$1").replace("\\2", "$2"))
    toks = F.when(low.rlike(_NOT_SIMPLE), F.split(full, SPLIT_PATTERN)).otherwise(
        F.split(low, " ")
    )
    # skip_word_none + skip_word_number (+ empty strings from space runs);
    # trailing-digit tokens are ICU status-NUMBER — see tokenize.ENDS_NUMBER
    return F.filter(toks, lambda t: t.rlike(HAS_LETTER) & ~t.rlike(ENDS_NUMBER))


def _position_weight_expr(how: str):
    """Per-token positional weight f(pos, n) and its per-doc normalizer
    (sum over ALL token positions — unigram-engine convention,
    /root/reference/src/SentimentScorerOnegrams.h:63-66)."""
    n = F.col("word_count").cast("double")
    x = (F.col("pos") + 1).cast("double")  # 1-based position
    if how == "UShaped":
        w = (x - (n + 1) / 2) ** 2
        norm = F.expr(
            "aggregate(sequence(1, word_count), cast(0.0 as double), "
            "(acc, i) -> acc + pow(i - (word_count + 1) / 2.0, 2))"
        )
    elif how == "inverseUShaped":
        w = F.lit(0.25) - ((x - (n + 1) / 2) ** 2) / (n**2)
        norm = F.expr(
            "aggregate(sequence(1, word_count), cast(0.0 as double), "
            "(acc, i) -> acc + 0.25 - pow(i - (word_count + 1) / 2.0, 2) / pow(word_count, 2))"
        )
    elif how == "exponential":
        w = F.exp(F.lit(5.0) * (x / n - 1))
        norm = F.expr(
            "aggregate(sequence(1, word_count), cast(0.0 as double), "
            "(acc, i) -> acc + exp(5.0 * (i / cast(word_count as double) - 1)))"
        )
    elif how == "inverseExponential":
        w = F.exp(F.lit(5.0) * (1 - x / n))
        norm = F.expr(
            "aggregate(sequence(1, word_count), cast(0.0 as double), "
            "(acc, i) -> acc + exp(5.0 * (1 - i / cast(word_count as double))))"
        )
    else:
        raise ValueError(how)
    return w / norm


def compute_sentiment_algebraic(
    pages: DataFrame,
    lexicons: Lexicons,
    how: str = "counts",
    use_valence_bigram: bool = False,
    validate_langs: str = "fail",
) -> DataFrame:
    """Unigram (or bigram-valence) scoring as a Catalyst plan."""
    if how not in ALGEBRAIC_HOWS:
        raise ValueError(f"how={how} is not algebraically expressible; use the UDF engine")
    if lexicons.pretokenized_langs:
        raise ValueError(
            "the algebraic engine has no tokens_col= passthrough and cannot "
            "score pretokenized_langs lexicons — use compute_sentiment_udf "
            "with segment_corpus + tokens_col."
        )
    if use_valence_bigram and how in ("UShaped", "inverseUShaped", "exponential", "inverseExponential"):
        # the bigram engine normalizes positional weights over HIT tokens only
        # (/root/reference/src/SentimentScorerBigrams.h:55-60), which this
        # all-token formulation does not reproduce — use the UDF engine.
        raise ValueError(f"how={how} with valence requires the UDF engine")
    spark = pages.sparkSession
    lexdf = lexicon_df(spark, lexicons)

    # fail fast on languages without a lexicon — otherwise the inner join
    # below would silently drop those documents.
    check_language_coverage(pages, set(lexicons.lex), validate_langs)

    feats = feature_columns(pages)
    docs = pages.select(
        "url",
        "warc_ts",
        "lang",
        *feats,
        _tokens().alias("tokens"),
    ).withColumn("word_count", F.size("tokens"))

    tok = docs.select(
        "url", "lang", "word_count", F.posexplode("tokens").alias("pos", "token")
    )

    hits = tok.join(
        F.broadcast(lexdf),
        (tok["lang"] == lexdf["lang"]) & (tok["token"] == lexdf["word"]),
        "inner",
    ).select(tok["url"], tok["lang"], "word_count", "pos", "token", "lexicon", "y")

    if use_valence_bigram:
        # bigram valence: multiply a hit by the shifter value of the token
        # immediately before it (/root/reference/src/SentimentScorerBigrams.h:62-66).
        from pyspark.sql.window import Window

        vdf = valence_df(spark, lexicons).select(
            F.col("lang").alias("vlang"), F.col("word").alias("vword"), "vy"
        )
        # k = max(0, j - 1): at document position 0 the C++ clamps the
        # lookup index to the token ITSELF
        # (/root/reference/src/SentimentScorerBigrams.h:68-69)
        w = Window.partitionBy("url").orderBy("pos")
        tok_prev = tok.withColumn(
            "prev_token", F.coalesce(F.lag("token").over(w), F.col("token"))
        )
        hits = (
            tok_prev.join(
                F.broadcast(lexdf),
                (tok_prev["lang"] == lexdf["lang"]) & (tok_prev["token"] == lexdf["word"]),
                "inner",
            )
            .select(tok_prev["url"], tok_prev["lang"], "word_count", "pos", "token", "prev_token", "lexicon", "y")
            .join(
                F.broadcast(vdf),
                (F.col("lang") == F.col("vlang")) & (F.col("prev_token") == F.col("vword")),
                "left",
            )
            .withColumn("y", F.col("y") * F.coalesce(F.col("vy"), F.lit(1.0)))
        )

    if how == "counts":
        contrib = F.col("y")
    elif how == "proportional":
        contrib = F.col("y") / F.col("word_count")
    elif how == "proportionalSquareRoot":
        contrib = F.col("y") / F.sqrt(F.col("word_count"))
    elif how == "proportionalPol":
        contrib = F.col("y")  # divided by nPolarized after the aggregate
    elif how == "TFIDF":
        # corpus-level doc frequency, pinned per input snapshot
        # (/root/reference/src/utils.h:193-210; weight log10(N/(1+df)),
        # /root/reference/src/utils.h:121-122, unnormalized).
        # N and df are per-language: the reference scores each language
        # subcorpus independently (/root/reference/R/sentiment_engines.R:68-93).
        n_docs = docs.groupBy("lang").agg(F.count("*").cast("double").alias("n_docs"))
        # df only for LEXICON words (the only ones whose weight is ever
        # read): semi-joining the token stream against the broadcast
        # lexicon dim BEFORE the distinct/groupBy keeps both the
        # aggregation and the subsequent broadcast O(lexicon), not
        # O(corpus vocabulary) — broadcasting a full web-corpus vocabulary
        # df table would OOM the driver
        lex_words = lexdf.select("lang", F.col("word").alias("token")).distinct()
        df_tok = (
            tok.select("url", "lang", "token")
            .join(F.broadcast(lex_words), ["lang", "token"], "left_semi")
            .distinct()
            .groupBy("lang", "token")
            .agg(F.count("*").alias("df"))
        )
        hits = hits.join(F.broadcast(df_tok), ["lang", "token"], "left").join(
            F.broadcast(n_docs), "lang"
        )
        contrib = F.col("y") * F.log10(F.col("n_docs") / (1 + F.coalesce(F.col("df"), F.lit(0.0))))
    else:
        contrib = F.col("y") * _position_weight_expr(how)

    if how == "proportionalPol":
        scores = hits.groupBy("url", "lexicon").agg(
            (F.sum(contrib) / F.count("*")).alias("lex_score")
        )
    else:
        scores = hits.groupBy("url", "lexicon").agg(F.sum(contrib).alias("lex_score"))

    # doc x lexicon spine so zero-hit documents keep explicit 0 rows
    lex_names = lexdf.select("lang", "lexicon").distinct()
    spine = docs.join(F.broadcast(lex_names), "lang")
    out = spine.join(scores, ["url", "lexicon"], "left").withColumn(
        "lex_score", F.coalesce("lex_score", F.lit(0.0))
    )

    # feature spreading (C7): lexicon score x feature weight
    # (/root/reference/R/sentiment_engines.R:2-9)
    stack_expr = ", ".join(f"'{f}', {f}" for f in feats)
    out = out.select(
        "url",
        "warc_ts",
        "lang",
        "word_count",
        "lexicon",
        F.expr(f"stack({len(feats)}, {stack_expr}) AS (feature, fval)"),
        "lex_score",
    ).select(
        "url",
        "warc_ts",
        "lang",
        "word_count",
        "lexicon",
        "feature",
        (F.col("lex_score") * F.col("fval")).alias("score"),
    )
    return out
