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

    # fail fast on languages without a lexicon — otherwise the lexicon
    # spine filter below would silently drop those documents.
    check_language_coverage(pages, set(lexicons.lex), validate_langs)

    feats = feature_columns(pages)
    # NULL-lang docs can never match a (lang, lexicon) pair, so they
    # produce no output under either formulation; filtering here keeps
    # the IsNotNull(lang) predicate pushed down to the parquet scan (the
    # old inner spine join used to infer it)
    docs = pages.filter(F.col("lang").isNotNull()).select(
        "url",
        "warc_ts",
        "lang",
        *feats,
        _tokens().alias("tokens"),
    ).withColumn("word_count", F.size("tokens"))

    # SINGLE-AGGREGATION plan (round 6): document metadata rides the token
    # stream through posexplode_outer (a zero-token doc still emits one
    # null-token row, so it keeps its explicit 0 scores), the lexicon
    # lookup is a broadcast LEFT join, and ONE groupBy(url) folds
    # per-lexicon conditional sums into wide columns. The previous
    # formulation aggregated hits per (url, lexicon) and SortMergeJoined
    # the scores back onto a doc spine — two extra doc-sized Exchanges +
    # sorts that dominated the scoring plan (measured: 4.1 -> ~2.0 s noop
    # on the 200k-doc suite corpus; guide §2.4). ``url`` is the document
    # key (unique per corpus contract S1), so groupBy(url) is exactly the
    # old doc spine.
    tok = docs.select(
        "url", "warc_ts", "lang", "word_count", *feats,
        F.posexplode_outer("tokens").alias("pos", "token"),
    )

    if use_valence_bigram:
        # bigram valence: multiply a hit by the shifter value of the token
        # immediately before it (/root/reference/src/SentimentScorerBigrams.h:62-66).
        # k = max(0, j - 1): at document position 0 the C++ clamps the
        # lookup index to the token ITSELF
        # (/root/reference/src/SentimentScorerBigrams.h:68-69)
        from pyspark.sql.window import Window

        w = Window.partitionBy("url").orderBy("pos")
        tok = tok.withColumn(
            "prev_token", F.coalesce(F.lag("token").over(w), F.col("token"))
        )

    lx = lexdf.select(
        F.col("lang").alias("__llang"),
        F.col("word").alias("__lword"),
        "lexicon",
        "y",
    )
    hits = tok.join(
        F.broadcast(lx),
        (tok["lang"] == F.col("__llang")) & (tok["token"] == F.col("__lword")),
        "left",
    ).drop("__llang", "__lword")

    if use_valence_bigram:
        vdf = valence_df(spark, lexicons).select(
            F.col("lang").alias("vlang"), F.col("word").alias("vword"), "vy"
        )
        hits = hits.join(
            F.broadcast(vdf),
            (F.col("lang") == F.col("vlang")) & (F.col("prev_token") == F.col("vword")),
            "left",
        ).withColumn("y", F.col("y") * F.coalesce(F.col("vy"), F.lit(1.0)))

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

    # one wide aggregation per document: per-lexicon conditional sums
    # (null lexicon = non-hit token -> the when() skips it); a zero-hit
    # (url, lexicon) sums to NULL and coalesces to the explicit 0 row the
    # old left-join spine produced
    lex_names = lexicons.lexicon_names()
    aggs = [F.first(c).alias(c) for c in ("warc_ts", "lang", "word_count", *feats)]
    for i, name in enumerate(lex_names):
        is_lx = F.col("lexicon") == name
        if how == "proportionalPol":
            s = F.sum(F.when(is_lx, contrib)) / F.count(F.when(is_lx, F.lit(1)))
        else:
            s = F.sum(F.when(is_lx, contrib))
        aggs.append(F.coalesce(s, F.lit(0.0)).alias(f"__lex_{i}"))
    wide = hits.groupBy("url").agg(*aggs)

    # feature spreading (C7): lexicon score x feature weight
    # (/root/reference/R/sentiment_engines.R:2-9) — one stack over the
    # (lexicon x feature) grid
    entries = ", ".join(
        f"'{name}', '{f}', (`__lex_{i}` * `{f}`)"
        for i, name in enumerate(lex_names)
        for f in feats
    )
    out = wide.select(
        "url",
        "warc_ts",
        "lang",
        "word_count",
        F.expr(
            f"stack({len(lex_names) * len(feats)}, {entries}) AS (lexicon, feature, score)"
        ),
    )
    # a document only carries the lexicons of its language (the old
    # docs x lex_names inner spine): broadcast semi-join on the tiny
    # (lang, lexicon) dim
    valid = lexdf.select("lang", "lexicon").distinct()
    return out.join(F.broadcast(valid), ["lang", "lexicon"], "left_semi").select(
        "url", "warc_ts", "lang", "word_count", "lexicon", "feature", "score"
    )
