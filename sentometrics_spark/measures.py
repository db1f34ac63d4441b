"""Measures-panel operators (M1-M11) and peak extraction (O2, M7).

Long format makes most of the reference's name-mangling machinery
(`lexicon--feature--timeweight` columns) collapse into plain column
predicates and group-bys:

  - subset rows / select / delete  /root/reference/R/sentomeasures_methods.R:372-457
  - aggregate dimension members    /root/reference/R/sentomeasures_methods.R:545-623
  - global indices                 /root/reference/R/sentomeasures_methods.R:625-653
  - scale (z-score)                /root/reference/R/sentomeasures_methods.R:193-212
  - diff                           /root/reference/R/sentomeasures_methods.R:97-104
  - peakdocs / peakdates           /root/reference/R/sentiment_engines.R:494-514,
                                   /root/reference/R/sentomeasures_main.R:496-516
  - wide <-> long                  /root/reference/R/utils.R:401-416
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MEASURE_DIMS = ["lexicon", "feature", "timeweight"]


def subset_measures(
    measures: DataFrame,
    expr: str | None = None,
    select: dict[str, list[str]] | None = None,
    delete: dict[str, list[str]] | None = None,
) -> DataFrame:
    """M1/M2: row filter by SQL expression and/or dimension-member
    keep/drop. select/delete: {dim: [members]} with dim in lexicon/feature/
    timeweight."""
    out = measures
    if expr:
        out = out.filter(expr)
    for dim, members in (select or {}).items():
        if dim not in MEASURE_DIMS:
            raise ValueError(f"unknown dimension: {dim}")
        out = out.filter(F.col(dim).isin(members))
    for dim, members in (delete or {}).items():
        if dim not in MEASURE_DIMS:
            raise ValueError(f"unknown dimension: {dim}")
        out = out.filter(~F.col(dim).isin(members))
    return out


def aggregate_dimension(
    measures: DataFrame,
    dim: str,
    merges: dict[str, list[str]],
    keep_originals: bool = False,
) -> DataFrame:
    """M3: merge dimension members by MEAN (e.g. {'LEXAB': ['LEXA','LEXB']})
    (/root/reference/R/sentomeasures_methods.R:545-623). Members not named
    in any merge pass through unchanged."""
    if dim not in MEASURE_DIMS:
        raise ValueError(f"unknown dimension: {dim}")
    mapping = {m: new for new, olds in merges.items() for m in olds}
    merged_members = list(mapping)
    map_col = F.col(dim)
    for old, new in mapping.items():
        map_col = F.when(F.col(dim) == old, F.lit(new)).otherwise(map_col)
    other = [d for d in MEASURE_DIMS if d != dim]
    merged = (
        measures.withColumn(dim, map_col)
        .groupBy("bucket_ts", *MEASURE_DIMS)
        .agg(F.avg("value").alias("value"))
        .select("bucket_ts", *MEASURE_DIMS, "value")
    )
    if keep_originals:
        originals = measures.filter(F.col(dim).isin(merged_members)).select(
            "bucket_ts", *MEASURE_DIMS, "value"
        )
        merged = merged.unionByName(originals)
    return merged


def global_indices(
    measures: DataFrame,
    lexicon_weights: dict[str, float] | None = None,
    feature_weights: dict[str, float] | None = None,
    time_weights: dict[str, float] | None = None,
) -> DataFrame:
    """M4: per-bucket weighted global indices
    (agg_global, /root/reference/R/sentomeasures_methods.R:625-653):
    global_<dim> = mean over measures of value * w_<dim>(member); 'global'
    is the mean of the three. Default weights: 1/|dim|."""

    def wmap(col: str, weights: dict[str, float] | None) -> F.Column:
        if not weights:
            return F.lit(None).cast("double")
        expr = F.lit(None).cast("double")
        for k, v in weights.items():
            expr = F.when(F.col(col) == k, F.lit(float(v))).otherwise(expr)
        return expr

    dims = measures.select(*MEASURE_DIMS).distinct().collect()
    n_lex = len({r["lexicon"] for r in dims})
    n_feat = len({r["feature"] for r in dims})
    n_time = len({r["timeweight"] for r in dims})
    w_lex = F.coalesce(wmap("lexicon", lexicon_weights), F.lit(1.0 / n_lex))
    w_feat = F.coalesce(wmap("feature", feature_weights), F.lit(1.0 / n_feat))
    w_time = F.coalesce(wmap("timeweight", time_weights), F.lit(1.0 / n_time))
    agg = measures.groupBy("bucket_ts").agg(
        F.avg(F.col("value") * w_lex).alias("global_lexicons"),
        F.avg(F.col("value") * w_feat).alias("global_features"),
        F.avg(F.col("value") * w_time).alias("global_time"),
    )
    return agg.withColumn(
        "global",
        (F.col("global_lexicons") + F.col("global_features") + F.col("global_time")) / 3.0,
    )


def scale_measures(measures: DataFrame, center: bool = True, scale: bool = True) -> DataFrame:
    """M5: z-score per measure series (sd uses the n-1 sample convention,
    matching R's scale())."""
    w = Window.partitionBy(*MEASURE_DIMS)
    v = F.col("value")
    if center:
        v = v - F.avg("value").over(w)
    if scale:
        # try_divide: constant series (sd = 0) scale to null (R's scale()
        # yields NaN there), not an ANSI DIVIDE_BY_ZERO abort
        v = F.try_divide(v, F.stddev_samp("value").over(w))
    return measures.withColumn("value", v)


def diff_measures(measures: DataFrame, lag: int = 1, differences: int = 1) -> DataFrame:
    """M6: lag-differencing per series, iterated ``differences`` times;
    first lag*differences rows per series drop (as in base R diff)."""
    out = measures
    for _ in range(differences):
        w = Window.partitionBy(*MEASURE_DIMS).orderBy("bucket_ts")
        out = (
            out.withColumn("__prev", F.lag("value", lag).over(w))
            .filter(F.col("__prev").isNotNull())
            .withColumn("value", F.col("value") - F.col("__prev"))
            .drop("__prev")
        )
    return out


def as_sentiment(df: DataFrame) -> DataFrame:
    """O3: validate/coerce an external table into the long sentiment shape
    (as.sentiment, /root/reference/R/sentiment_engines.R:568-608). Requires
    url/warc_ts/word_count/lexicon/score; a missing feature column gets the
    dummy (names without '--' get '--dummyFeature' in the reference)."""
    required = ("url", "warc_ts", "word_count", "lexicon", "score")
    for c in required:
        if c not in df.columns:
            raise ValueError(f"sentiment table missing column: {c}")
    out = df
    if "feature" not in out.columns:
        out = out.withColumn("feature", F.lit("dummyFeature"))
    if dict(out.dtypes)["score"] not in ("double", "float"):
        out = out.withColumn("score", F.col("score").cast("double"))
    return out


def peakdocs(
    sentiment: DataFrame,
    n: float,
    type: str = "both",
    measure: tuple[str, str] | None = None,
    do_average: bool = False,
) -> DataFrame:
    """O2: top-n documents by extreme sentiment. type: pos|neg|both(abs).

    do_average=False (the reference default) ranks each document by its
    MOST EXTREME single measure value; do_average=True by the row-mean
    across measures (peakdocs, /root/reference/R/sentiment_engines.R:494-514).
    measure: restrict to one (lexicon, feature) pair instead.
    n < 1 means a fraction: exactly floor(n * ndocs) documents come back,
    as the reference (n <- floor(n * nMax), :500-501). Deterministic
    tiebreak by url (the reference relies on column-major order())."""
    s = sentiment
    if measure is not None:
        s = s.filter((F.col("lexicon") == measure[0]) & (F.col("feature") == measure[1]))
        scored = s.groupBy("url").agg(F.first("score").alias("m"))
    elif do_average:
        scored = s.groupBy("url").agg(F.avg("score").alias("m"))
    elif type == "both":
        scored = s.groupBy("url").agg(F.max(F.abs("score")).alias("m"))
    elif type == "pos":
        scored = s.groupBy("url").agg(F.max("score").alias("m"))
    elif type == "neg":
        scored = s.groupBy("url").agg(F.min("score").alias("m"))
    else:
        raise ValueError(type)
    if type == "both":
        metric = F.abs(F.col("m"))
    elif type == "pos":
        metric = F.col("m")
    elif type == "neg":
        metric = -F.col("m")
    else:
        raise ValueError(type)
    scored = scored.withColumn("__metric", metric)
    if 0 < n < 1:
        # bounded count: scored has one row per document
        n = int(n * scored.count())
    return scored.orderBy(F.col("__metric").desc(), F.col("url")).limit(int(n)).drop("__metric")


def peakdates(
    measures: DataFrame,
    n: float,
    type: str = "both",
    do_average: bool = False,
) -> DataFrame:
    """M7: top-n bucket dates with most extreme measure values
    (/root/reference/R/sentomeasures_main.R:496-516).

    do_average=False (the reference default) collapses each date to its
    MOST EXTREME measure value before ranking — the reference orders all
    (date, measure) values, takes the top m*n, then dedups dates, so a
    date ranks by its most extreme value and exactly n distinct dates come
    back. n < 1 means a fraction: floor(n * nobs) dates. Deterministic
    tiebreak by bucket_ts."""
    if type not in ("both", "pos", "neg"):
        raise ValueError(type)
    if do_average:
        scored = measures.groupBy("bucket_ts").agg(F.avg("value").alias("m"))
    else:
        per_date = measures.select("bucket_ts", F.col("value").alias("m"))
        if type == "both":
            # deterministic even when two measures tie on |value| with
            # opposite signs: the metric is the max |value| itself
            scored = per_date.groupBy("bucket_ts").agg(F.max(F.abs("m")).alias("m"))
        elif type == "pos":
            scored = per_date.groupBy("bucket_ts").agg(F.max("m").alias("m"))
        else:
            scored = per_date.groupBy("bucket_ts").agg(F.min("m").alias("m"))
    if type == "both":
        key = F.abs(F.col("m")).desc()
    elif type == "pos":
        key = F.col("m").desc()
    else:
        key = F.col("m").asc()
    if 0 < n < 1:
        # bounded count: scored has one row per bucket date
        n = int(n * scored.count())
    return scored.orderBy(key, F.col("bucket_ts")).limit(int(n)).select("bucket_ts", "m")


def to_wide(measures: DataFrame) -> DataFrame:
    """M9: long -> wide pivot with the reference's ``--``-mangled column
    names (golden-output comparison only; the long form is primary)."""
    name = F.concat_ws("--", *MEASURE_DIMS)
    return (
        measures.withColumn("__m", name)
        .groupBy("bucket_ts")
        .pivot("__m")
        .agg(F.first("value"))
    )


def to_long(wide: DataFrame) -> DataFrame:
    """M9 inverse: wide (bucket_ts, lex--feat--time ...) -> long."""
    cols = [c for c in wide.columns if c != "bucket_ts"]
    stack = ", ".join(f"'{c}', `{c}`" for c in cols)
    out = wide.select(
        "bucket_ts", F.expr(f"stack({len(cols)}, {stack}) AS (__m, value)")
    )
    parts = F.split("__m", "--")
    return out.select(
        "bucket_ts",
        parts.getItem(0).alias("lexicon"),
        parts.getItem(1).alias("feature"),
        parts.getItem(2).alias("timeweight"),
        "value",
    )


def merge_sentiment(*tables: DataFrame) -> DataFrame:
    """O1: n-ary merge of long sentiment tables. The reference chains
    full-outer joins keyed on ALL shared columns — identical rows collapse,
    rows differing in any value stay separate, and values missing on one
    side become 0 (merge.sentiment, /root/reference/R/sentiment_engines.R:432-447).
    In long form that is a union + NA->0 + distinct."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t, allowMissingColumns=True)
    return out.fillna(0.0, subset=["score"]).dropDuplicates()
