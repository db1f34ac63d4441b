"""Multi-tier continuous aggregates: hour -> day -> week -> month rollups
with retention (north rule; no reference equivalent — the reference
aggregates once per requested ``by``).

Exactness contract: the document-aggregation value is a weighted mean
value = sum(num_d * s_d) / sum(num_d). For the doc-LOCAL weighting schemes
(equal_weight, proportional, inverseProportional) the numerator num_d
depends only on the document, so partial-sum pairs (wsum, wden) compose
exactly across tiers:

    day.wsum = sum(hour.wsum),  day.wden = sum(hour.wden)
    day.value = day.wsum / day.wden  == direct day aggregation (bit-for-bit
    up to float associativity)

The bucket-RELATIVE schemes (exponential, inverseExponential — num depends
on the bucket's total word count) are NOT composable from (wsum, wden)
alone; ``rollup`` refuses them. They ARE composable from a richer partial
set because num_d = 10a*(wc_d/W - 1) is AFFINE in wc_d: retaining per
(bucket, lexicon, feature) the sums (s_sum = sum s_d, wcs_sum = sum wc_d*s_d,
wc_in = sum wc_d, n_in) over the non-null set, plus the bucket total word
count W, any coarser bucket B' with W' = sum W recombines exactly:

    sum num*s = (c/W')*wcs_sum - c*s_sum
    sum num   = (c/W')*wc_in   - c*n_in        (c = 10*alpha)

— see base_tier_exponential / rollup_exponential.

Tier storage layout (TierStore): one partitioned parquet/Iceberg table per
tier, partitioned by bucket_date for partition-pruned reads and
partition-level retention expiry.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentometrics_spark.aggregate.doc_agg import MEASURE_KEYS, aggregate_docs

TIER_ORDER = ["hour", "day", "week", "month"]

COMPOSABLE_DOC_HOWS = ("equal_weight", "proportional", "inverseProportional")

PARTIAL_COLS = ["wsum", "wden", "n_docs_in", "n_docs"]


def base_tier(
    sentiment: DataFrame,
    how: str = "proportional",
    do_ignore_zeros: bool = True,
    by: str = "hour",
) -> DataFrame:
    """Finest tier straight from doc-level sentiment, carrying partials."""
    if how not in COMPOSABLE_DOC_HOWS:
        raise ValueError(
            f"doc weighting '{how}' is bucket-relative and not tier-composable; "
            f"use one of {COMPOSABLE_DOC_HOWS} or aggregate each tier directly"
        )
    return aggregate_docs(
        sentiment, by=by, how=how, do_ignore_zeros=do_ignore_zeros, keep_partials=True
    )


def rollup(lower_tier: DataFrame, to: str) -> DataFrame:
    """Compose the next tier from a finer tier's partial sums. A pure
    re-aggregation — no rescan of documents."""
    if to not in TIER_ORDER:
        raise ValueError(f"unknown tier: {to}")
    agg = (
        lower_tier.groupBy(
            F.date_trunc(to, F.col("bucket_ts")).alias("bucket_ts"), *MEASURE_KEYS
        )
        .agg(
            F.sum("wsum").alias("wsum"),
            F.sum("wden").alias("wden"),
            F.sum("n_docs_in").alias("n_docs_in"),
            F.sum("n_docs").alias("n_docs"),
        )
        .withColumn("value", F.coalesce(F.try_divide(F.col("wsum"), F.col("wden")), F.lit(0.0)))
    )
    return agg.select("bucket_ts", *MEASURE_KEYS, "value", *PARTIAL_COLS)


EXP_PARTIAL_COLS = ["s_sum", "wcs_sum", "wc_in", "n_docs_in", "n_docs", "bucket_wc"]


def _exp_value(c: float):
    """value = ((c/W)*wcs_sum - c*s_sum) / ((c/W)*wc_in - c*n_in), the
    weighted mean under num_d = c*(wc_d/W - 1) re-expanded from partials.
    (inverseExponential negates every num_d, which cancels in the ratio —
    the reference's two schemes produce identical weighted means; formulas
    /root/reference/R/sentomeasures_main.R:553-576.)"""
    # guard bucket_wc = 0 (a bucket whose docs all tokenized to zero
    # words): c/0 = Inf and Inf*0 = NaN, which try_divide/coalesce would
    # pass through — such a bucket has no weighable docs, so value = 0.0
    w = F.col("bucket_wc")
    cw = F.when(w > 0, F.lit(c) / w)
    num = cw * F.col("wcs_sum") - F.lit(c) * F.col("s_sum")
    den = cw * F.col("wc_in") - F.lit(c) * F.col("n_docs_in")
    return F.coalesce(F.try_divide(num, den), F.lit(0.0))


def base_tier_exponential(
    sentiment: DataFrame,
    by: str = "hour",
    alpha: float = 0.1,
    do_ignore_zeros: bool = True,
) -> DataFrame:
    """Finest tier for the bucket-relative exponential/inverseExponential
    doc weighting, carrying the affine partials that make coarser tiers
    exact (see module docstring)."""
    from sentometrics_spark.aggregate.doc_agg import ZERO_EPS, bucket_col

    s = sentiment.withColumn("bucket_ts", bucket_col(F.col("warc_ts"), by))
    doc_wc = (
        s.select("url", "bucket_ts", "word_count")
        .distinct()
        .groupBy("bucket_ts")
        .agg(F.sum("word_count").cast("double").alias("bucket_wc"))
    )
    score = (
        F.when(F.abs(F.col("score")) < ZERO_EPS, F.lit(None)).otherwise(F.col("score"))
        if do_ignore_zeros
        else F.col("score")
    )
    wc = F.col("word_count").cast("double")
    agg = (
        s.withColumn("__s", score)
        .groupBy("bucket_ts", *MEASURE_KEYS)
        .agg(
            F.sum("__s").alias("s_sum"),
            F.sum(wc * F.col("__s")).alias("wcs_sum"),
            F.sum(F.when(F.col("__s").isNotNull(), wc)).alias("wc_in"),
            F.count(F.when(F.col("__s").isNotNull(), 1)).alias("n_docs_in"),
            F.count("*").alias("n_docs"),
        )
        .join(doc_wc, "bucket_ts")
        .na.fill(0.0, ["s_sum", "wcs_sum", "wc_in"])
    )
    c = 10.0 * alpha
    return agg.withColumn("value", _exp_value(c)).select(
        "bucket_ts", *MEASURE_KEYS, "value", *EXP_PARTIAL_COLS
    )


def rollup_exponential(lower_tier: DataFrame, to: str, alpha: float = 0.1) -> DataFrame:
    """Compose the next tier for exponential doc weighting from the affine
    partials — no rescan of documents; exactly equals direct aggregation at
    the coarser bucket."""
    if to not in TIER_ORDER:
        raise ValueError(f"unknown tier: {to}")
    agg = lower_tier.groupBy(
        F.date_trunc(to, F.col("bucket_ts")).alias("bucket_ts"), *MEASURE_KEYS
    ).agg(*[F.sum(col).alias(col) for col in EXP_PARTIAL_COLS])
    c = 10.0 * alpha
    return agg.withColumn("value", _exp_value(c)).select(
        "bucket_ts", *MEASURE_KEYS, "value", *EXP_PARTIAL_COLS
    )


def build_all_tiers(
    sentiment: DataFrame,
    how: str = "proportional",
    do_ignore_zeros: bool = True,
) -> dict[str, DataFrame]:
    """Rollup lattice: hour from documents; day from hour; week and month
    BOTH from day (ISO weeks straddle month boundaries, so week and month
    are siblings, not a chain)."""
    tiers: dict[str, DataFrame] = {}
    tiers["hour"] = base_tier(sentiment, how, do_ignore_zeros, by="hour")
    tiers["day"] = rollup(tiers["hour"], "day")
    tiers["week"] = rollup(tiers["day"], "week")
    tiers["month"] = rollup(tiers["day"], "month")
    return tiers


def refresh_continuous(
    store: "TierStore",
    new_hour_partials: DataFrame,
    exponential: bool = False,
    alpha: float = 0.1,
    pre_hour: DataFrame | None = None,
) -> dict[str, int]:
    """Incrementally fold a batch of NEW hour-tier partial rows (from
    base_tier / base_tier_exponential on newly ingested documents — a
    disjoint document set from what the store already holds) into the
    stored hour/day/week/month continuous aggregates, re-materializing ONLY
    the partitions the batch touches.

    This is the TimescaleDB-style continuous-aggregate refresh re-expressed
    for Spark: the dirty set is derived from the batch's bucket dates (a
    bounded collect of DATES, never data rows); each tier reads just the
    dirty partitions of the finer tier (partition-pruned scan) and
    dynamic-partition-overwrites its own dirty partitions. Cost is
    O(touched buckets), independent of total corpus/history size.

    Returns {tier: number of dirty bucket_date partitions rewritten}.
    """
    import datetime as dt

    pcols = EXP_PARTIAL_COLS if exponential else PARTIAL_COLS
    norm = lambda df: df.select("bucket_ts", *MEASURE_KEYS, *pcols)
    roll = (
        (lambda df, to: rollup_exponential(norm(df), to, alpha))
        if exponential
        else (lambda df, to: rollup(norm(df), to))
    )

    dirty_dates = sorted(
        r["d"]
        for r in new_hour_partials.select(
            F.to_date("bucket_ts").alias("d")
        ).distinct().collect()
    )
    if not dirty_dates:
        return {t: 0 for t in TIER_ORDER}

    # hour: merge the batch into the existing dirty-date rows (same-bucket
    # partials sum because the batch's documents are new) and re-finalize.
    # pre_hour overrides the live read with a FROZEN pre-batch snapshot
    # (streaming exactly-once path): the hour overwrite then becomes a pure
    # function of staged inputs, so a crashed apply can be retried without
    # double-counting (streaming.apply_refresh_exactly_once).
    if pre_hour is not None:
        merged = roll(norm(pre_hour).unionByName(norm(new_hour_partials)), "hour")
    elif store.exists("hour"):
        existing = store.read_dates("hour", dirty_dates)
        merged = roll(norm(existing).unionByName(norm(new_hour_partials)), "hour")
    else:
        merged = roll(new_hour_partials, "hour")
    store.upsert_partitions("hour", merged)

    # day: rebuild exactly the dirty day buckets from the dirty hour
    # partitions (day partitions are keyed by the same dates)
    store.upsert_partitions("day", roll(store.read_dates("hour", dirty_dates), "day"))

    # week / month: rebuild the straddled coarse buckets from ALL day rows
    # inside them (partition-pruned by the literal date lists)
    week_starts = sorted({d - dt.timedelta(days=d.weekday()) for d in dirty_dates})
    week_days = [ws + dt.timedelta(days=i) for ws in week_starts for i in range(7)]
    store.upsert_partitions("week", roll(store.read_dates("day", week_days), "week"))

    month_starts = sorted({d.replace(day=1) for d in dirty_dates})
    month_days = []
    for ms in month_starts:
        nxt = (ms.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
        month_days.extend(
            ms + dt.timedelta(days=i) for i in range((nxt - ms).days)
        )
    store.upsert_partitions("month", roll(store.read_dates("day", month_days), "month"))

    return {
        "hour": len(dirty_dates),
        "day": len(dirty_dates),
        "week": len(week_starts),
        "month": len(month_starts),
    }


@dataclass(frozen=True)
class RetentionPolicy:
    """Per-tier retention horizon, in that tier's buckets. None = keep all.
    Applied as partition-level deletes (bucket_date partitioning)."""

    hour: int | None = 7 * 24
    day: int | None = 365
    week: int | None = None
    month: int | None = None

    def horizon(self, tier: str) -> int | None:
        return getattr(self, tier)


class TierStore:
    """Partitioned parquet store for tier tables (stand-in for Iceberg in
    this sandbox: same layout and partition-level retention semantics; on a
    real cluster the writes become `MERGE INTO` / partition-expiry on an
    Iceberg catalog table)."""

    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt

    def path(self, tier: str) -> str:
        return f"{self.root}/tier={tier}"

    def write(self, tier: str, df: DataFrame, mode: str = "overwrite") -> None:
        (
            df.withColumn("bucket_date", F.to_date("bucket_ts"))
            .repartition("bucket_date")
            .write.format(self.fmt)
            .mode(mode)
            .partitionBy("bucket_date")
            .save(self.path(tier))
        )

    def read(self, tier: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(tier)).drop("bucket_date")

    def exists(self, tier: str) -> bool:
        import os

        return os.path.isdir(self.path(tier))

    def read_dates(self, tier: str, dates) -> DataFrame:
        """Partition-pruned read of the given bucket_date partitions only
        (the filter hits the partition column BEFORE it is dropped, so the
        scan lists just those directories)."""
        return (
            self.spark.read.format(self.fmt)
            .load(self.path(tier))
            .filter(F.col("bucket_date").isin([str(d) for d in dates]))
            .drop("bucket_date")
        )

    def upsert_partitions(self, tier: str, df: DataFrame) -> None:
        """Replace ONLY the bucket_date partitions present in ``df``
        (dynamic partition overwrite) — the parquet stand-in for Iceberg's
        overwritePartitions / MERGE INTO; untouched partitions keep their
        files."""
        if not self.exists(tier):
            self.write(tier, df)
            return
        (
            df.withColumn("bucket_date", F.to_date("bucket_ts"))
            .repartition("bucket_date")
            .write.format(self.fmt)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_date")
            .save(self.path(tier))
        )

    def apply_retention(self, tier: str, policy: RetentionPolicy) -> int:
        """Drop buckets older than (max_bucket - horizon). Returns number of
        rows retained. Implemented as a filtered rewrite here; on Iceberg
        this is a metadata-only partition drop."""
        horizon = policy.horizon(tier)
        if horizon is None:
            return -1
        df = self.read(tier)
        step = {"hour": "hours", "day": "days", "week": "weeks", "month": "months"}[tier]
        mx = df.agg(F.max("bucket_ts").alias("mx"))
        kwargs = {"hours": 0, "days": 0, "weeks": 0, "months": 0}
        kwargs[step] = horizon
        cutoff = F.expr(
            f"mx - make_interval(0, {kwargs['months']}, {kwargs['weeks']}, "
            f"{kwargs['days']}, {kwargs['hours']}, 0, 0)"
        )
        kept = df.crossJoin(F.broadcast(mx.select(cutoff.alias("cutoff")))).filter(
            F.col("bucket_ts") > F.col("cutoff")
        ).drop("cutoff")
        # write to a sibling temp dir, then swap: kept is LAZY over the
        # path being replaced, and cache() is only best-effort (an evicted
        # partition would recompute from a half-deleted source mid-write).
        # On Iceberg this whole method is a metadata-only partition drop.
        import shutil
        import uuid

        tmp = f"{self.path(tier)}__retention_{uuid.uuid4().hex[:8]}"
        (
            kept.withColumn("bucket_date", F.to_date("bucket_ts"))
            .repartition("bucket_date")
            .write.format(self.fmt)
            .mode("overwrite")
            .partitionBy("bucket_date")
            .save(tmp)
        )
        n = self.spark.read.format(self.fmt).load(tmp).count()
        shutil.rmtree(self.path(tier))
        import os

        os.rename(tmp, self.path(tier))
        return n
