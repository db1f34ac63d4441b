"""sentometrics_spark — a from-scratch PySpark-native textual-sentiment
time-series engine with the query/data-processing capabilities of the
R package ``sentometrics`` (SentometricsResearch/sentometrics), re-expressed
Spark-first.

Pipeline (reference: /root/reference/R/sentomeasures_main.R):

    corpus (url, warc_ts, html, text, lang, feat_*)
      -> compute_sentiment            (lexicon + valence scoring, within-doc hows)
      -> aggregate_docs               (per time-bucket weighted doc aggregation)
      -> measures_fill                (date-spine gap fill: zero / latest / none)
      -> aggregate_time               (rolling weighted kernels: almon/beta/exp/...)
      -> tier rollups                 (hour -> day -> week -> month continuous aggs)

Everything is long-format: measures live as rows keyed by
(bucket_ts, lexicon, feature, timeweight) instead of the reference's
name-mangled ``lexicon--feature--timeweight`` wide columns.
"""

from sentometrics_spark.config import AggSpec, TimeKernelSpec, get_hows
from sentometrics_spark.lexicons import Lexicons, fixture_lexicons
from sentometrics_spark.corpus import (
    add_features,
    build_pages,
    corpus_summarize,
    drop_features,
    extract_text,
    read_corpus,
    validate_corpus,
)
from sentometrics_spark.pipeline import compute_sentiment, measures_update, sento_measures
from sentometrics_spark.scoring.segment import longest_match_segmenter, segment_corpus
from sentometrics_spark.aggregate.time_agg import measures_fill
from sentometrics_spark.aggregate.timeseries import (
    asof_join,
    bucket_percentiles,
    acf,
    bucket_histogram,
    bucket_trend,
    burn_rate,
    ccf,
    cohort_retention,
    funnel_stages,
    holt_forecast,
    holt_winters,
    kll_quantile_rollup,
    mad_outliers,
    kll_quantile_tier,
    seasonal_decompose,
    counter_rate,
    cusum_changepoints,
    detect_gaps,
    ewma_time_decay,
    hll_distinct_rollup,
    hll_distinct_tier,
    interval_join,
    lttb_downsample,
    ohlc,
    rolling_zscore,
    state_durations,
    time_bucket,
    time_weighted_avg,
    topk_per_bucket,
    topk_summary_rollup,
    topk_summary_tier,
)
from sentometrics_spark.textops.sampling import (
    cap_per_group,
    pack_documents,
    sample_by_source_temperature,
    split_train_val_test,
    vocab_top,
)
from sentometrics_spark.measures import (
    as_sentiment,
    merge_sentiment,
    peakdates,
    peakdocs,
)
from sentometrics_spark.model.elasticnet import ModelCtr, get_loss_data, sento_model
from sentometrics_spark.model.attribution import (
    attributions_dims,
    attributions_docs,
    attributions_lags,
)

__all__ = [
    "AggSpec",
    "TimeKernelSpec",
    "get_hows",
    "Lexicons",
    "fixture_lexicons",
    "add_features",
    "build_pages",
    "drop_features",
    "extract_text",
    "read_corpus",
    "validate_corpus",
    "corpus_summarize",
    "sento_measures",
    "compute_sentiment",
    "measures_update",
    "measures_fill",
    "as_sentiment",
    "merge_sentiment",
    "peakdates",
    "peakdocs",
    "ModelCtr",
    "get_loss_data",
    "sento_model",
    "attributions_dims",
    "attributions_docs",
    "attributions_lags",
    "segment_corpus",
    "longest_match_segmenter",
    # irregular-timeseries operators
    "asof_join",
    "bucket_percentiles",
    "acf",
    "bucket_histogram",
    "bucket_trend",
    "burn_rate",
    "ccf",
    "cohort_retention",
    "funnel_stages",
    "holt_forecast",
    "holt_winters",
    "kll_quantile_rollup",
    "mad_outliers",
    "kll_quantile_tier",
    "seasonal_decompose",
    "counter_rate",
    "cusum_changepoints",
    "detect_gaps",
    "ewma_time_decay",
    "hll_distinct_rollup",
    "hll_distinct_tier",
    "interval_join",
    "lttb_downsample",
    "ohlc",
    "rolling_zscore",
    "state_durations",
    "time_bucket",
    "time_weighted_avg",
    "topk_per_bucket",
    "topk_summary_rollup",
    "topk_summary_tier",
    # training-data composition
    "cap_per_group",
    "pack_documents",
    "sample_by_source_temperature",
    "split_train_val_test",
    "vocab_top",
]
