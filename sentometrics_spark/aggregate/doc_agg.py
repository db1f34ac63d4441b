"""Across-document aggregation per time bucket (A1-A4).

Semantics ported from aggregate_docs + weights_across
(/root/reference/R/sentomeasures_main.R:355-404, :518-580):

  value(bucket, lexicon, feature) = sum_d w_d * s_d
  w_d = num_d / sum_{d in D} num_d

where the numerator depends on the scheme:

  equal_weight          num = 1
  proportional          num = wc_d
  inverseProportional   num = 1 / wc_d
  exponential           num = 10*alpha*(wc_d / WC_bucket - 1)   [linear despite name]
  inverseExponential    num = 10*alpha*(1 - wc_d / WC_bucket)

WC_bucket = sum of word counts over ALL docs in the bucket (one count per
document, not per long-format row). With do.ignoreZeros = TRUE
(/root/reference/R/sentomeasures_main.R:379-384), exact-zero scores become
NULL first, and the weight-normalizing set D is the per-(bucket, lexicon,
feature) NON-NULL set — denominators differ per measure column, the #1
source of subtle mismatches.

Output keeps the partial-sum pair (wsum = sum num*s, wden = sum num) so
higher tiers compose exactly for the doc-local schemes; ``value`` is the
finalized ratio with the reference's sum(na.rm=TRUE)-over-empty => 0 edge
(coalesce to 0.0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKET_FNS = {"hour", "day", "week", "month", "year"}

MEASURE_KEYS = ["lexicon", "feature"]

# do.ignoreZeros zero detection: the reference compares doubles to exact 0
# (/root/reference/R/sentomeasures_main.R:379-384); we use a tolerance so
# that "zero by cancellation" is engine-independent (floating-point sum
# order would otherwise flip documents in/out of the weight denominators).
ZERO_EPS = 1e-12


def _ignore_zeros(score: Column) -> Column:
    return F.when(F.abs(score) < ZERO_EPS, F.lit(None)).otherwise(score)


def bucket_col(ts: Column, by: str) -> Column:
    """A1: date bucketing. Spark date_trunc('week') is ISO Monday-start,
    matching ISOweek2date (/root/reference/R/sentomeasures_main.R:371-373)."""
    if by not in BUCKET_FNS:
        raise ValueError(f"unknown bucket: {by}")
    return F.date_trunc(by, ts)


def _weight_numerator(how: str, alpha: float) -> Column:
    wc = F.col("word_count").cast("double")
    if how == "equal_weight":
        return F.lit(1.0)
    if how == "proportional":
        return wc
    if how == "inverseProportional":
        # null for zero-token docs: double division is non-ANSI here and
        # 1/0 = Infinity would poison the bucket's wsum/wden when
        # do_ignore_zeros=False; a null weight drops the doc cleanly.
        return F.when(wc > 0, F.lit(1.0) / wc)
    if how == "exponential":
        return 10.0 * alpha * (wc / F.col("__bucket_wc") - 1.0)
    if how == "inverseExponential":
        return 10.0 * alpha * (1.0 - wc / F.col("__bucket_wc"))
    raise ValueError(f"unknown docs how: {how}")


def aggregate_docs(
    sentiment: DataFrame,
    by: str = "day",
    how: str = "equal_weight",
    do_ignore_zeros: bool = True,
    alpha: float = 0.1,
    keep_partials: bool = True,
) -> DataFrame:
    """sentiment: long table (url, warc_ts, [lang,] word_count, lexicon,
    feature, score) -> measures (bucket_ts, lexicon, feature, value
    [, wsum, wden])."""
    s = sentiment.withColumn("bucket_ts", bucket_col(F.col("warc_ts"), by))

    needs_bucket_wc = how in ("exponential", "inverseExponential")
    if needs_bucket_wc:
        # per-bucket total word count over distinct documents
        doc_wc = (
            s.select("url", "bucket_ts", "word_count")
            .distinct()
            .groupBy("bucket_ts")
            .agg(F.sum("word_count").cast("double").alias("__bucket_wc"))
        )
        s = s.join(doc_wc, "bucket_ts")

    score = _ignore_zeros(F.col("score")) if do_ignore_zeros else F.col("score")
    num = _weight_numerator(how, alpha)
    num_eff = F.when(score.isNotNull(), num)  # weight only docs in the non-null set

    agg = s.groupBy("bucket_ts", *MEASURE_KEYS).agg(
        F.sum(num_eff * score).alias("wsum"),
        F.sum(num_eff).alias("wden"),
        F.count(F.when(score.isNotNull(), 1)).alias("n_docs_in"),
        F.count("*").alias("n_docs"),
    )
    agg = agg.withColumn(
        "value", F.coalesce(F.try_divide(F.col("wsum"), F.col("wden")), F.lit(0.0))
    )
    cols = ["bucket_ts", *MEASURE_KEYS, "value"]
    if keep_partials:
        cols += ["wsum", "wden", "n_docs_in", "n_docs"]
    return agg.select(*cols)


def aggregate_docs_salted(
    sentiment: DataFrame,
    by: str = "day",
    how: str = "equal_weight",
    do_ignore_zeros: bool = True,
    alpha: float = 0.1,
    n_salts: int = 16,
    keep_partials: bool = True,
) -> DataFrame:
    """Skew-safe A4 (north rule): hot buckets (a viral domain/hour at
    Common-Crawl scale) overload single reducers in the plain
    groupBy(bucket, lexicon, feature). Classic two-phase aggregation:

      phase 1: groupBy(bucket, lexicon, feature, salt) partial sums,
               salt = pmod(xxhash64(url), n_salts) — deterministic, so a
               retried task lands in the same salt bucket;
      phase 2: de-salt with a second (tiny) aggregation of the partials.

    Exactness: identical to aggregate_docs because the weight numerators are
    doc-local or depend only on bucket totals computed separately — partial
    sums re-associate. Not available for the bucket-relative exponential
    schemes' denominators? They are: __bucket_wc is computed with its own
    salted two-phase sum below."""
    if how not in ("equal_weight", "proportional", "inverseProportional",
                   "exponential", "inverseExponential"):
        raise ValueError(f"unknown docs how: {how}")
    s = sentiment.withColumn("bucket_ts", bucket_col(F.col("warc_ts"), by))
    salt = F.pmod(F.xxhash64("url"), F.lit(n_salts)).alias("__salt")

    if how in ("exponential", "inverseExponential"):
        doc_wc = (
            s.select("url", "bucket_ts", "word_count")
            .distinct()
            .withColumn("__salt", salt)
            .groupBy("bucket_ts", "__salt")
            .agg(F.sum("word_count").cast("double").alias("__wc_part"))
            .groupBy("bucket_ts")
            .agg(F.sum("__wc_part").alias("__bucket_wc"))
        )
        s = s.join(doc_wc, "bucket_ts")

    score = _ignore_zeros(F.col("score")) if do_ignore_zeros else F.col("score")
    num = _weight_numerator(how, alpha)
    num_eff = F.when(score.isNotNull(), num)

    phase1 = s.withColumn("__salt", salt).groupBy(
        "bucket_ts", *MEASURE_KEYS, "__salt"
    ).agg(
        F.sum(num_eff * score).alias("wsum"),
        F.sum(num_eff).alias("wden"),
        F.count(F.when(score.isNotNull(), 1)).alias("n_docs_in"),
        F.count("*").alias("n_docs"),
    )
    agg = (
        phase1.groupBy("bucket_ts", *MEASURE_KEYS)
        .agg(
            F.sum("wsum").alias("wsum"),
            F.sum("wden").alias("wden"),
            F.sum("n_docs_in").alias("n_docs_in"),
            F.sum("n_docs").alias("n_docs"),
        )
        .withColumn("value", F.coalesce(F.try_divide(F.col("wsum"), F.col("wden")), F.lit(0.0)))
    )
    cols = ["bucket_ts", *MEASURE_KEYS, "value"]
    if keep_partials:
        cols += ["wsum", "wden", "n_docs_in", "n_docs"]
    return agg.select(*cols)


def aggregate_sentences(
    sentiment: DataFrame,
    how: str = "equal_weight",
    do_ignore_zeros: bool = True,
    alpha: float = 0.1,
) -> DataFrame:
    """O4: sentence -> document roll-up (aggregate_sentences,
    /root/reference/R/sentomeasures_main.R:336-353): per-document weights
    from the same weights_across schemes with by=id; value = sum(w*s) over
    the document's sentences; word_count = sum of sentence word counts.

    With do.ignoreZeros, zero-score sentences drop out of the weights via
    the reference's (x*num)/x NaN trick — here an explicit null-out."""
    s = sentiment
    score = _ignore_zeros(F.col("score")) if do_ignore_zeros else F.col("score")

    if how in ("exponential", "inverseExponential"):
        doc_wc = (
            s.select("url", "sentence_id", "word_count")
            .distinct()
            .groupBy("url")
            .agg(F.sum("word_count").cast("double").alias("__bucket_wc"))
        )
        s = s.join(doc_wc, "url")
    num = _weight_numerator(how, alpha)
    num_eff = F.when(score.isNotNull(), num)

    # distinct per-doc sentence word counts for the summed word_count
    wc = (
        s.select("url", "sentence_id", "word_count")
        .distinct()
        .groupBy("url")
        .agg(F.sum("word_count").alias("word_count"))
    )
    agg = s.groupBy("url", *MEASURE_KEYS).agg(
        F.first("warc_ts").alias("warc_ts"),
        F.first("lang").alias("lang"),
        F.coalesce(F.try_divide(F.sum(num_eff * score), F.sum(num_eff)), F.lit(0.0)).alias("score"),
    )
    return agg.join(wc, "url").select(
        "url", "warc_ts", "lang", "word_count", *MEASURE_KEYS, "score"
    )


def doc_weights(
    sentiment: DataFrame,
    by: str = "day",
    how: str = "equal_weight",
    do_ignore_zeros: bool = True,
    alpha: float = 0.1,
) -> DataFrame:
    """attribWeights$W analogue: the realized per-document weight for each
    (bucket, lexicon, feature) measure (/root/reference/R/sentomeasures_main.R:393-395).
    Window-normalized: w = num / sum(num) over the bucket's non-null set."""
    s = sentiment.withColumn("bucket_ts", bucket_col(F.col("warc_ts"), by))
    return with_doc_weights(s, how, do_ignore_zeros, alpha).select(
        "url", "bucket_ts", *MEASURE_KEYS, "weight"
    )


def with_doc_weights(
    sentiment_bucketed: DataFrame,
    how: str = "equal_weight",
    do_ignore_zeros: bool = True,
    alpha: float = 0.1,
) -> DataFrame:
    """The doc_weights values APPENDED to a (already bucket_ts-stamped)
    sentiment frame — same weights, but the score column stays on the
    row, so a consumer that needs weight x score (attribution) does not
    re-join two doc-sized tables on (url, bucket_ts, measure keys).

    The per-(bucket, measure) weight-sum denominator is PANEL-sized, so
    it is computed as a map-side partial aggregation and broadcast back —
    no doc-wide shuffle at all (a window over (bucket_ts, measure keys)
    would sort every sentiment row; same panel-altitude broadcast
    assumption as measures_fill's grid spine)."""
    s = sentiment_bucketed
    if how in ("exponential", "inverseExponential"):
        doc_wc = (
            s.select("url", "bucket_ts", "word_count")
            .distinct()
            .groupBy("bucket_ts")
            .agg(F.sum("word_count").cast("double").alias("__bucket_wc"))
            .withColumnRenamed("bucket_ts", "__wc_bucket_ts")
        )
        # null-SAFE equi-join (ADVICE r5): groupBy keeps the NULL-bucket
        # group, and <=> lets those rows pick their denominator up — a
        # plain equi-join dropped NULL-bucket rows here before the
        # null-safe weight-denominator join below ever saw them
        s = s.join(
            F.broadcast(doc_wc),
            F.col("bucket_ts").eqNullSafe(F.col("__wc_bucket_ts")),
        ).drop("__wc_bucket_ts")
    score = _ignore_zeros(F.col("score")) if do_ignore_zeros else F.col("score")
    num = F.when(score.isNotNull(), _weight_numerator(how, alpha))
    keys = ["bucket_ts", *MEASURE_KEYS]
    # groupBy keeps NULL-key groups and the join back is NULL-SAFE, so a
    # row with a NULL bucket or measure key still normalizes within its
    # own (NULL, ...) group — exactly the Window.partitionBy semantics
    # this formulation replaced (a plain equi-join would silently drop
    # those rows: NULL never equi-matches)
    den = (
        s.groupBy(*keys)
        .agg(F.sum(num).alias("__den"))
        .select(*[F.col(k).alias(f"__k_{i}") for i, k in enumerate(keys)], "__den")
    )
    cond = None
    for i, k in enumerate(keys):
        c = F.col(k).eqNullSafe(F.col(f"__k_{i}"))
        cond = c if cond is None else cond & c
    out = (
        s.join(F.broadcast(den), cond)
        .withColumn("weight", F.try_divide(num, F.col("__den")))
        .drop("__den", *[f"__k_{i}" for i in range(len(keys))])
    )
    return out.drop("__bucket_wc") if "__bucket_wc" in out.columns else out
