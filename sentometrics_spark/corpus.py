"""Corpus construction & manipulation (S1-S7).

The engine's corpus is the north-rule input shape: an Iceberg/parquet table

    (url string, warc_ts timestamp, html binary, text string, lang string,
     feat_* double in [0,1] ...)

This module builds that table deterministically from the driver-provided
``documents`` parquet (doc_id, text, lang, source, n_chars) — every derived
column is a pure SQL expression of ``doc_id``/``source``/``text`` so the
DuckDB oracle can reproduce it exactly.

Reference analogues:
  - sento_corpus constructor & validation  /root/reference/R/sentocorpus.R:74-148
  - clean_texts (HTML strip)               /root/reference/R/sentocorpus.R:150-155
  - add_features (keyword/regex features)  /root/reference/R/sentocorpus.R:220-279
  - corpus_summarize                       /root/reference/R/sentocorpus.R:337-404
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Deterministic timestamp derivation: spread docs over a 90-day range at
# minute granularity starting 2024-01-01 (a Monday, so ISO-week bucketing is
# aligned). Same formula is used in the oracle SQL (see __spark_entry__).
TS_BASE = "2024-01-01 00:00:00"
TS_DAYS_MOD = 90
TS_MIN_MULT = 37
TS_MIN_MOD = 1440

WARC_TS_SQL_SPARK = (
    f"timestamp'{TS_BASE}' + make_interval(0, 0, 0, "
    f"CAST(doc_id % {TS_DAYS_MOD} AS INT), 0, "
    f"CAST((doc_id * {TS_MIN_MULT}) % {TS_MIN_MOD} AS INT), 0)"
)

WARC_TS_SQL_DUCKDB = (
    f"TIMESTAMP '{TS_BASE}' + (doc_id % {TS_DAYS_MOD}) * INTERVAL 1 DAY "
    f"+ ((doc_id * {TS_MIN_MULT}) % {TS_MIN_MOD}) * INTERVAL 1 MINUTE"
)

URL_SQL = "concat('https://', source, '.example.com/', CAST(doc_id AS STRING))"
URL_SQL_DUCKDB = "concat('https://', source, '.example.com/', CAST(doc_id AS VARCHAR))"

HTML_PREFIX = "<html><head><title></title></head><body><p>"
HTML_SUFFIX = "</p></body></html>"

# Feature definitions (values in [0,1] per the corpus contract,
# /root/reference/R/sentocorpus.R:129-139). Binary keyword features like the
# reference's add_features(keywords=) path (/root/reference/R/sentocorpus.R:220-279).
FEATURE_SQL: dict[str, str] = {
    "feat_spark": "CAST(text LIKE '%spark%' AS DOUBLE)",
    "feat_nonspark": "CAST(NOT text LIKE '%spark%' AS DOUBLE)",
    "feat_srca": "CAST(CAST(substr(source, 4) AS INT) % 2 = 0 AS DOUBLE)",
}

REQUIRED_COLS = ("url", "warc_ts", "html", "text", "lang")


def build_pages(spark: SparkSession, sf_dir: str, with_html: bool = True) -> DataFrame:
    """Load documents parquet and derive the Common-Crawl-style pages table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = [
        F.expr(URL_SQL).alias("url"),
        F.expr(WARC_TS_SQL_SPARK).alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
    ]
    if with_html:
        cols.insert(
            2,
            F.encode(
                F.concat(F.lit(HTML_PREFIX), F.col("text"), F.lit(HTML_SUFFIX)), "UTF-8"
            ).alias("html"),
        )
    cols += [F.expr(sql).alias(name) for name, sql in FEATURE_SQL.items()]
    return docs.select(*cols)


def extract_text(html: Column) -> Column:
    """HTML -> text extraction (clean_texts analogue). Strips tags; must be
    byte-identical to the stored ``text`` per url (north-rule invariant)."""
    return F.regexp_replace(F.decode(html, "UTF-8"), r"<[^>]*>", "")


def validate_corpus(df: DataFrame) -> DataFrame:
    """Schema + domain validation (sento_corpus checks,
    /root/reference/R/sentocorpus.R:82-139). Raises on missing required
    columns; returns df with feature columns min-max rescaled into [0,1]
    when out of range (join with a global min/max aggregate)."""
    for c in REQUIRED_COLS:
        if c not in df.columns and not (c == "html"):
            raise ValueError(f"corpus missing required column: {c}")
    feats = feature_columns(df)
    if not feats:
        # dummyFeature injection (/root/reference/R/sentocorpus.R:103-105)
        return df.withColumn("feat_dummy", F.lit(1.0))
    aggs = []
    for f in feats:
        aggs += [F.min(f).alias(f"__mn_{f}"), F.max(f).alias(f"__mx_{f}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for f in feats:
        mn, mx = F.col(f"__mn_{f}"), F.col(f"__mx_{f}")
        rescaled = F.when(
            (mn < 0) | (mx > 1),
            F.when(mx != mn, (F.col(f) - mn) / (mx - mn)).otherwise(F.lit(0.0)),
        ).otherwise(F.col(f))
        out = out.withColumn(f, rescaled)
    return out.drop(*[c for c in out.columns if c.startswith("__mn_") or c.startswith("__mx_")])


def feature_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c.startswith("feat_")]


def check_language_coverage(pages: DataFrame, known: set, validate: str = "fail") -> None:
    """Fail fast, driver-side, on corpus languages without a lexicon
    (/root/reference/R/sentiment_engines.R:79-81). The check is one extra
    full-column scan job before every scoring pass; at 100 TB that doubles
    scan cost for a validation, so production pipelines pass
    validate='skip' once per snapshot after validating it up front."""
    if validate == "skip":
        return
    if validate != "fail":
        raise ValueError(f"validate_langs must be 'fail' or 'skip', got: {validate}")
    missing = [
        r["lang"] for r in pages.select("lang").distinct().collect() if r["lang"] not in known
    ]
    if missing:
        raise ValueError(f"no lexicon found for language(s): {sorted(missing)}")


def add_features(
    df: DataFrame,
    keywords: dict[str, str] | None = None,
    do_binary: bool = True,
    do_regex: bool = False,
) -> DataFrame:
    """add_features analogue: binary presence or normalized counts of
    keywords/regexes over texts (/root/reference/R/sentocorpus.R:220-279)."""
    out = df
    for name, kw in (keywords or {}).items():
        if "-" in name:
            raise ValueError(f"'-' not allowed in feature name: {name}")
        pat = kw if do_regex else rf"\b{kw}\b"
        if do_binary:
            col = F.col("text").rlike(pat).cast("double")
        else:
            cnt = F.regexp_count(F.col("text"), F.lit(pat)).cast("double")
            col = cnt / F.greatest(
                F.size(F.split(F.col("text"), " ")).cast("double"), F.lit(1.0)
            )
        out = out.withColumn(f"feat_{name}", col)
    return out


def drop_features(df: DataFrame, names: list[str]) -> DataFrame:
    """S4: feature deletion with the reference's guards — core columns are
    undeletable; if the last feature is dropped the dummy feature re-enters
    (docvars<- replacement, /root/reference/R/sentocorpus.R:283-300)."""
    for n in names:
        if n in REQUIRED_COLS:
            raise ValueError(f"cannot delete required column: {n}")
        if not n.startswith("feat_"):
            raise ValueError(f"not a feature column: {n}")
    out = df.drop(*names)
    if not feature_columns(out):
        out = out.withColumn("feat_dummy", F.lit(1.0))
    return out


def read_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S5: ingest from other storage formats (the as.sento_corpus analogue,
    /root/reference/R/sentocorpus.R:407-459) and validate."""
    readers = {
        "parquet": lambda: spark.read.parquet(path),
        "json": lambda: spark.read.json(path),
        "csv": lambda: spark.read.option("header", True).csv(path),
        "iceberg": lambda: spark.read.format("iceberg").load(path),
    }
    if fmt not in readers:
        raise ValueError(f"unsupported corpus format: {fmt}")
    df = readers[fmt]()
    if "warc_ts" in df.columns and dict(df.dtypes).get("warc_ts") == "string":
        df = df.withColumn("warc_ts", F.to_timestamp("warc_ts"))
    return validate_corpus(df)


def corpus_summarize(df: DataFrame, by: str = "day") -> DataFrame:
    """Per-bucket corpus stats: #docs, token stats, per-feature active-doc
    counts (corpus_summarize, /root/reference/R/sentocorpus.R:337-404)."""
    if by not in ("day", "week", "month", "year"):
        raise ValueError(f"unsupported summarize bucket: {by}")
    wc = F.size(F.split(F.col("text"), " ")).cast("double")
    feats = feature_columns(df)
    aggs = [
        F.count("*").alias("documents"),
        F.sum(wc).alias("totalTokens"),
        F.avg(wc).alias("meanTokens"),
        F.min(wc).alias("minTokens"),
        F.max(wc).alias("maxTokens"),
    ] + [F.sum((F.col(f) > 0).cast("long")).alias(f) for f in feats]
    return (
        df.groupBy(F.date_trunc(by, F.col("warc_ts")).alias("bucket_ts"))
        .agg(*aggs)
        .orderBy("bucket_ts")
    )
