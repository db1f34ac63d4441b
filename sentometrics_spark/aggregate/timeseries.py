"""Irregular-timeseries operators the reference's fixed-bucket pipeline
lacks but any timeseries engine at this tier needs: as-of join,
time-weighted average, and OHLC rollups over irregular event streams.

The reference (sentometrics) only ever aggregates on calendar buckets
(/root/reference/R/sentomeasures_main.R:406-453); joining a measure
series onto an irregular event stream "as of" each event, or averaging a
signal whose observations arrive irregularly, has no analogue there —
these fill that gap Spark-first.

Scale shapes
------------
- ``asof_join`` is NOT a join: both sides are unioned and resolved by ONE
  window pass (single hash Exchange on the ``by`` keys + sort). The
  classic broadcast/range-bucket as-of formulations either need a small
  side or quadratic bucket overlap; the union-window form is one shuffle
  of |left| + |right| rows regardless of time distribution, and the
  window state is O(1) per row (a running "last right payload"). Skewed
  ``by`` keys concentrate a window partition — as-of semantics need the
  full per-key history in order, so pre-split hot keys upstream (e.g.
  sessionize) rather than salting here.
- ``time_weighted_avg`` / ``ohlc`` are one window / one groupBy on
  (series, bucket) — bounded-key shuffles, map-side partials for ohlc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "asof_join",
    "time_weighted_avg",
    "ohlc",
    "counter_rate",
    "lttb_downsample",
    "interval_join",
    "bucket_percentiles",
    "rolling_zscore",
    "ewma_time_decay",
    "state_durations",
    "detect_gaps",
    "topk_per_bucket",
    "topk_summary_tier",
    "topk_summary_rollup",
    "cusum_changepoints",
    "hll_distinct_tier",
    "hll_distinct_rollup",
    "time_bucket",
    "cohort_retention",
    "funnel_stages",
    "funnel_overflow",
    "bucket_trend",
    "acf",
    "seasonal_decompose",
    "kll_quantile_tier",
    "kll_quantile_rollup",
    "bucket_histogram",
    "holt_forecast",
    "holt_winters",
    "ccf",
    "mad_outliers",
    "burn_rate",
]


def _us(c: Column) -> Column:
    """Microseconds since epoch; tolerates TIMESTAMP_NTZ inputs (session
    timezone is pinned to UTC throughout this engine)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    payload: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    allow_exact: bool = True,
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """As-of join: attach to each left row the right row with the nearest
    timestamp at-or-before it (``backward``), at-or-after (``forward``),
    or closest either way, ties to backward (``nearest``), matching on the
    equi-keys ``by``. Pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics, including ``allow_exact`` (backward default: a right row AT
    the left timestamp matches).

    Implementation: union both sides with a tag, one window partitioned by
    ``by`` ordered by (ts, tag): ``last(payload_struct, ignorenulls=True)``
    over the unbounded-preceding frame is exactly "most recent right row
    so far". The payload rides in ONE struct so a legitimately-NULL right
    value column is not skipped by ignorenulls (the struct itself is the
    non-null marker). ``forward`` is the same pass ordered descending;
    ``nearest`` evaluates both frames in the same partitioning (Catalyst
    reuses the Exchange; two sorts) and picks the closer side.

    ``tolerance_seconds`` drops matches farther than the given horizon
    (fractional seconds honoured at microsecond precision). Unmatched left
    rows keep NULL payload — the join is left-outer by construction.

    If several right rows share (by, ts), the winner is the last within
    the window sort (nondeterministic among exact ties, as in DuckDB);
    pre-aggregate the right side to one row per (by, ts) when exact
    determinism is required.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward|forward|nearest")
    by = list(by or [])
    if not by:
        raise ValueError(
            "asof_join requires at least one 'by' key: a keyless as-of is a "
            "single global window partition (one task holds every row) — "
            "range-bucket the timestamp into a key first if you need it"
        )
    payload = list(
        payload
        if payload is not None
        else [c for c in right.columns if c not in by + [on]]
    )
    clash = [c for c in payload if c in left.columns] + (
        [matched_ts_col] if matched_ts_col in left.columns else []
    )
    if clash:
        raise ValueError(f"payload/matched columns collide with left: {clash}")

    lcols = left.columns
    pstruct = F.struct(
        F.col(on).alias("__ts"), *[F.col(c) for c in payload]
    )
    r_side = right.select(
        *[F.col(k) for k in by],
        F.col(on).alias(on),
        F.lit(0).alias("__tag"),
        pstruct.alias("__p"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in by and c != on
        ],
    )
    l_side = left.select(
        *lcols,
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r_side.schema["__p"].dataType).alias("__p"),
    )
    u = l_side.unionByName(r_side)

    # at equal ts: right (tag 0) sorts before left iff exact matches count
    tag_ord = F.col("__tag").asc() if allow_exact else F.col("__tag").desc()

    def _resolved(asc: bool) -> Column:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc() if asc else F.col(on).desc(), tag_ord)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__p", ignorenulls=True).over(w)

    def _within(p: Column, back: bool) -> Column:
        if tolerance_seconds is None:
            return p
        us = int(round(tolerance_seconds * 1_000_000))
        gap = (
            _us(F.col(on)) - _us(p["__ts"])
            if back
            else _us(p["__ts"]) - _us(F.col(on))
        )
        return F.when(gap <= F.lit(us), p)

    if direction == "backward":
        u = u.withColumn("__m", _within(_resolved(asc=True), back=True))
    elif direction == "forward":
        u = u.withColumn("__m", _within(_resolved(asc=False), back=False))
    else:  # nearest: closer of the two, ties to backward
        pb = _within(_resolved(asc=True), back=True)
        pf = _within(_resolved(asc=False), back=False)
        gb = _us(F.col(on)) - _us(pb["__ts"])
        gf = _us(pf["__ts"]) - _us(F.col(on))
        u = u.withColumn(
            "__m",
            F.when(pb.isNull(), pf)
            .when(pf.isNull(), pb)
            .when(gb <= gf, pb)
            .otherwise(pf),
        )

    out = u.filter(F.col("__tag") == 1).select(
        *lcols,
        F.col("__m")["__ts"].alias(matched_ts_col),
        *[F.col("__m")[c].alias(c) for c in payload],
    )
    return out


def time_weighted_avg(
    df: DataFrame,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Time-weighted average per (series, calendar bucket) over an
    irregular observation stream — the TimescaleDB ``time_weight('locf')``
    shape: each observation holds its value from its own timestamp until
    the next observation in the same bucket (or the bucket's end), and the
    bucket average weights values by those holding durations.

    twa = Σ v_i · w_i / Σ w_i with w_i in microseconds (integer-derived,
    so the weights are exact; only the final ratio is floating). A plain
    AVG over-counts burst periods; the time weighting is invariant to
    sampling density — the property that matters when hot domains emit
    1000× the events of cold ones.

    One window (lead within bucket) + one groupBy, both keyed on the
    bounded (series, bucket) key set.
    """
    keys = list(series_keys or [])
    # NULL-value observations are dropped up front (as-if-absent): the
    # previous value then holds through their timestamps, instead of a
    # null segment whose duration would silently deflate the denominator.
    # bucket_ts is materialized BEFORE the window so it partitions on an
    # attribute, not an expression — the downstream groupBy on the same
    # attributes then reuses the window's hash partitioning (one Exchange
    # total instead of two; plan-asserted in tests)
    base = df.filter(F.col(value).isNotNull()).withColumn(
        "bucket_ts", F.date_trunc(by, F.col(on))
    )
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys, "bucket_ts").orderBy(*order)
    bucket_end_us = _us(F.col("bucket_ts") + F.expr(f"interval 1 {by}"))
    next_us = F.coalesce(F.lead(_us(F.col(on))).over(w), bucket_end_us)
    wt = (next_us - _us(F.col(on))).cast("double")
    seg = base.select(
        *keys,
        "bucket_ts",
        (F.col(value) * wt).alias("__vw"),
        wt.alias("__w"),
    )
    return seg.groupBy(*keys, "bucket_ts").agg(
        (F.sum("__vw") / F.sum("__w")).alias("twa"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def ohlc(
    df: DataFrame,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Open/high/low/close rollup per (series, calendar bucket): the
    canonical downsample for irregular numeric streams (candlesticks).
    Pure groupBy with min_by/max_by on the (ts [, tiebreak]) ordering key —
    map-side partials, one bounded-key shuffle, whole-stage codegen.
    ``tiebreak`` makes open/close deterministic when timestamps collide
    within a bucket. NULL-value observations are dropped (as-if-absent)
    so open/close can never be NULL while high/low skip the same row."""
    keys = list(series_keys or [])
    df = df.filter(F.col(value).isNotNull())
    ord_key = (
        F.struct(F.col(on), F.col(tiebreak)) if tiebreak else F.col(on)
    )
    return df.groupBy(
        *keys, F.date_trunc(by, F.col(on)).alias("bucket_ts")
    ).agg(
        F.min_by(F.col(value), ord_key).alias("open"),
        F.max(F.col(value)).alias("high"),
        F.min(F.col(value)).alias("low"),
        F.max_by(F.col(value), ord_key).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def counter_rate(
    df: DataFrame,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Monotone-counter increase/rate per (series, calendar bucket) with
    reset handling — the Prometheus ``increase()``/``rate()`` shape over
    cumulative counters (bytes ingested, docs scored, requests served):
    per series ordered by time, each observation contributes its delta
    from the previous one; a NEGATIVE delta means the counter reset (
    process restart) and the post-reset absolute value is the increase —
    exactly Prometheus's reset correction. A series' first-ever
    observation has no predecessor and contributes nothing.

    Output per (series, bucket): ``increase`` (Σ corrected deltas of the
    observations in the bucket), ``rate`` = increase / bucket seconds,
    ``n_resets``, ``n_obs``. One lag window over the series ordering +
    one bounded-key groupBy — the same two-Exchange shape as
    time_weighted_avg. (Deliberately simpler than PromQL's lookahead
    extrapolation: increases are attributed to the bucket of the LATER
    endpoint, making buckets exactly additive — Σ bucket increases ==
    whole-series increase, which the tests pin.) NULL counter samples
    are dropped up front (as-if-absent) so the delta chain bridges them
    instead of losing two deltas per NULL."""
    keys = list(series_keys or [])
    df = df.filter(F.col(value).isNotNull())
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(value)).over(w)
    delta = F.col(value) - prev
    inc = F.when(prev.isNull(), F.lit(None).cast("double")).when(
        delta < 0, F.col(value)
    ).otherwise(delta)
    is_reset = F.when(prev.isNotNull() & (delta < 0), 1).otherwise(0)
    bucket_secs = (
        _us(F.date_trunc(by, F.col(on)) + F.expr(f"interval 1 {by}"))
        - _us(F.date_trunc(by, F.col(on)))
    ).cast("double") / F.lit(1_000_000.0)
    seg = df.select(
        *keys,
        F.date_trunc(by, F.col(on)).alias("bucket_ts"),
        inc.alias("__inc"),
        is_reset.alias("__reset"),
        bucket_secs.alias("__secs"),
    )
    return seg.groupBy(*keys, "bucket_ts").agg(
        F.coalesce(F.sum("__inc"), F.lit(0.0)).alias("increase"),
        (F.coalesce(F.sum("__inc"), F.lit(0.0)) / F.first("__secs")).alias("rate"),
        F.sum("__reset").cast("long").alias("n_resets"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def lttb_downsample(
    df: DataFrame,
    n_out: int,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) per
    series: keep first and last points; split the interior into n_out - 2
    equal-count buckets; walking left to right, keep from each bucket the
    point forming the largest triangle with the PREVIOUSLY KEPT point and
    the NEXT bucket's centroid. The visually-faithful downsample for
    plotting rolled-up sentiment tiers at dashboard resolution.

    The selection is inherently sequential (each choice conditions the
    next triangle), so this is a per-series ``applyInPandas`` numpy
    kernel — the right altitude here: LTTB's input is an already
    rolled-up tier (bounded points per series by construction of the
    retention engine), so one task per series holds its series trivially
    even at 10^12 source documents; parallelism comes from the series
    dimension. NOT for raw event streams — roll up first.

    Ties (equal areas) keep the earliest point; a series with <= n_out
    points passes through unchanged.
    """
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first + last + one interior)")
    keys = list(series_keys or [])
    if not keys:
        raise ValueError("lttb_downsample requires series_keys (per-series kernel)")
    import numpy as np
    import pandas as pd

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keys, on, value).schema.fields
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(on, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[keys + [on, value]]
        x = pdf[on].astype("int64").to_numpy().astype(np.float64)  # ns epoch
        y = pdf[value].to_numpy(dtype=np.float64)
        # equal-count interior buckets over points 1..n-2
        edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        sel = [0]
        prev = 0
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]          # this bucket: [lo, hi)
            nlo, nhi = (edges[b + 1], edges[b + 2]) if b < n_out - 3 else (n - 1, n)
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            ax, ay = x[prev], y[prev]
            # 2x triangle area; argmax keeps the earliest on exact ties
            area = np.abs(
                (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
            )
            prev = lo + int(np.argmax(area))
            sel.append(prev)
        sel.append(n - 1)
        return pdf.iloc[sel][keys + [on, value]]

    return (
        df.select(*keys, on, value)
        .groupBy(*keys)
        .applyInPandas(_kernel, schema=out_fields)
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    by: list[str] | None = None,
    payload: list[str] | None = None,
    bucket: str = "hour",
    max_buckets: int = 10_000,
    how: str = "inner",
) -> DataFrame:
    """Range join: match each point to every interval containing it
    (``start <= ts <= end``, endpoints inclusive), equi-matching on ``by``.

    The naive formulation is a pure inequality join — Catalyst can only
    plan that as a (broadcast) nested loop, O(|points| · |intervals|),
    which is the canonical scale-killer. This operator bucketizes instead:
    each interval is exploded into the calendar ``bucket``s it covers
    (``sequence()`` — bounded by ``max_buckets``, enforced executor-side
    via ``assert_true`` so a runaway interval fails fast instead of
    exploding), points join on the equi-key (by…, bucket) — a plain hash
    join — and the exact containment predicate filters the bucket-level
    candidates. Cost: O(|points| + Σ interval spans) through one hash
    shuffle; a point only ever meets the intervals overlapping its own
    bucket. Pick ``bucket`` near the typical interval length: too fine
    inflates the explode, too coarse inflates candidates per bucket.

    ``how='left'`` keeps unmatched points with NULL payload (dedup-free:
    the left join is against the matched set, not the exploded buckets).
    The join-back key is a surrogate row id, NOT the point columns — an
    equi-join on every points column would drop any point carrying a NULL
    attribute (NULL != NULL never matches its own matched copy) and
    cross-multiply duplicate point rows. The surrogate id is
    ``monotonically_increasing_id`` pinned with a lazy ``localCheckpoint``
    before the plan branches, so both join sides read the SAME stored id
    values even when the points input carries an upstream shuffle whose
    intra-partition order is not reproducible across evaluations (a lost
    checkpoint block fails the job loudly rather than recomputing
    different ids).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")
    by = list(by or [])
    payload = list(
        payload
        if payload is not None
        else [c for c in intervals.columns if c not in by + [start, end]]
    )
    clash = [c for c in payload + [start, end] if c in points.columns]
    if clash:
        raise ValueError(f"interval columns collide with points: {clash}")

    seq = F.sequence(
        F.date_trunc(bucket, F.col(start)),
        F.date_trunc(bucket, F.col(end)),
        F.expr(f"interval 1 {bucket}"),
    )
    guarded = F.when(
        F.assert_true(
            F.size(seq) <= F.lit(max_buckets),
            f"interval spans more than max_buckets={max_buckets} {bucket} buckets",
        ).isNull(),
        seq,
    )
    iv = intervals.select(
        *by, F.col(start), F.col(end), *[F.col(c) for c in payload]
    ).withColumn("__bucket", F.explode(guarded))
    pts0 = points
    if how == "left":
        # the surrogate id is joined back across TWO plan branches; if the
        # points input carries an upstream shuffle, intra-partition row
        # order (hence monotonically_increasing_id) is not reproducible
        # across the branches' independent evaluations and rows would be
        # silently dropped or mis-matched. localCheckpoint pins the id
        # column once (lineage truncated: a lost block fails the job
        # loudly instead of recomputing different ids) — ADVICE r5 fix.
        pts0 = points.withColumn(
            "__pid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
    pts = pts0.withColumn("__bucket", F.date_trunc(bucket, F.col(on)))
    matched = pts.join(iv, on=by + ["__bucket"], how="inner").filter(
        (F.col(on) >= F.col(start)) & (F.col(on) <= F.col(end))
    ).drop("__bucket")
    if how == "inner":
        return matched
    return pts0.join(
        matched.select("__pid", start, end, *payload),
        on="__pid",
        how="left",
    ).drop("__pid")


def bucket_percentiles(
    df: DataFrame,
    qs: list[float] = (0.5, 0.95, 0.99),
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "hour",
    mode: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-(series, calendar bucket) percentile rollup — the latency-SLO
    shape (p50/p95/p99 per hour) applied to any numeric stream.

    mode='exact': Spark's ``percentile`` (linear interpolation, identical
    to SQL ``quantile_cont``) — collects each group's values at the
    aggregator, right for bounded buckets and for oracle checks.
    mode='approx': ``approx_percentile`` (Greenwald-Khanna sketch) — the
    scale path: O(accuracy) state per group regardless of bucket size,
    mergeable map-side partials, bounded rank error 1/accuracy. At 10^12
    rows exact percentile state is the bucket itself; the sketch is the
    same rollup at fixed memory (tested within rank-error tolerance of
    exact)."""
    if mode not in ("exact", "approx"):
        raise ValueError("mode must be exact|approx")
    keys = list(series_keys or [])
    qarr = "array(" + ", ".join(repr(float(q)) for q in qs) + ")"
    if mode == "exact":
        agg = F.expr(f"percentile({value}, {qarr})")
    else:
        agg = F.expr(f"approx_percentile({value}, {qarr}, {accuracy})")
    # n_obs counts the observations the percentile actually used
    # (percentile/approx_percentile skip NULL values)
    out = df.groupBy(*keys, F.date_trunc(by, F.col(on)).alias("bucket_ts")).agg(
        agg.alias("__qs"), F.count(F.col(value)).alias("n_obs")
    )
    cols = [
        F.col("__qs")[i].alias(f"p{str(q).replace('0.', '').ljust(2, '0')}")
        for i, q in enumerate(qs)
    ]
    return out.select(*keys, "bucket_ts", *cols, "n_obs")


def rolling_zscore(
    df: DataFrame,
    window: int = 24,
    min_periods: int = 6,
    threshold: float = 3.0,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Trailing z-score anomaly flags per series: each observation is
    scored against the mean/stddev of the PREVIOUS ``window`` observations
    (current point excluded — a spike must not mask itself), flagged when
    |z| > threshold. The standard monitoring primitive over rolled-up
    sentiment/measure series (burst and collapse detection).

    One window pass per series (rows frame [-window, -1]); rows with
    fewer than ``min_periods`` trailing points, or zero trailing variance,
    get NULL z and flag=false. Same shuffle shape as the K6 rolling
    kernels — one sort per series partition."""
    if window < 2 or min_periods < 2:
        raise ValueError("window and min_periods must be >= 2")
    keys = list(series_keys or [])
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-window, -1)
    )
    mu = F.avg(F.col(value)).over(w)
    sd = F.stddev_samp(F.col(value)).over(w)
    n = F.count(F.col(value)).over(w)
    z = F.when(
        (n >= min_periods) & sd.isNotNull() & (sd > 0),
        (F.col(value) - mu) / sd,
    )
    return df.withColumn("trailing_n", n).withColumn("z", z).withColumn(
        "is_anomaly", F.coalesce(F.abs(z) > threshold, F.lit(False))
    )


def ewma_time_decay(
    df: DataFrame,
    halflife_seconds: float,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    tiebreak: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Time-decayed exponentially weighted moving average over an
    IRREGULAR sample stream: at each observation i,

        ewma_i = Σ_{j<=i} v_j · 0.5^((t_i - t_j)/halflife)
               / Σ_{j<=i}       0.5^((t_i - t_j)/halflife)

    i.e. pandas ``ewm(halflife=Δ, times=ts, adjust=True).mean()`` — the
    smoothing primitive whose effective memory is measured in TIME, not
    samples, so hot series (1000× the event rate) and cold series decay
    identically. The reference's kernels (K1–K4) only weight across
    fixed calendar lags (/root/reference/R/sentomeasures_main.R:406-453);
    this is the irregular-stream analogue.

    Implementation — pure JVM, no recurrence: the e^{-t_i λ} factor
    cancels in the ratio, so both sums are running prefix sums of
    v·e^{t λ} / e^{t λ} over one ordered window per series (ONE hash
    Exchange + sort, same shape as counter_rate). t is rebased to the
    per-series minimum (computed in the same partitioning — no extra
    Exchange) so exponents start at 0.

    Numerical horizon: e^{t λ} overflows once a series spans more than
    ~1022 halflives (exp > 709); beyond that the weights being summed are
    < 2^-1022 of the newest — numerically zero — so at production scale
    evaluate per retention segment (e.g. per tier partition) rather than
    over an unbounded series. The function leaves exponent management to
    the caller deliberately: a silent internal re-segmentation would
    change results at segment seams.
    """
    import math

    if halflife_seconds <= 0:
        raise ValueError("halflife_seconds must be positive")
    lam = math.log(2.0) / float(halflife_seconds)
    keys = list(series_keys or [])
    if not keys:
        raise ValueError(
            "ewma_time_decay requires series_keys: a keyless EWMA is one "
            "global window partition (a single task holds every row)"
        )
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w_all = Window.partitionBy(*keys)
    w_run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t_us = _us(F.col(on))
    delta_s = (t_us - F.min(t_us).over(w_all)).cast("double") / F.lit(1e6)
    wexp = F.exp(delta_s * F.lit(lam))
    # NULL-value rows contribute NO weight (pandas ewm skip-NaN
    # semantics: as if the observation were absent) but still receive
    # the smoothed value of the history before them; a series head of
    # only NULLs yields NULL.
    num = F.sum(F.col(value) * wexp).over(w_run)
    den = F.sum(F.when(F.col(value).isNotNull(), wexp)).over(w_run)
    return df.withColumn(out_col, num / den)


def state_durations(
    df: DataFrame,
    on: str = "ts",
    state: str = "state",
    series_keys: list[str] | None = None,
    tiebreak: str | None = None,
    end_ts: str | None = None,
) -> DataFrame:
    """Total time each series spent in each state — the TimescaleDB
    ``state_agg``/``duration_in`` shape over an event stream where each
    row declares the state entered at its timestamp (holding until the
    next event of the same series).

    Output per (series, state): ``duration_us`` (exact integer
    microseconds — bit-stable, no float), ``n_periods`` (how many visits),
    ``first_entered`` / ``last_exited``. Each series' LAST event has no
    successor: with ``end_ts`` (an ISO timestamp string pinning the
    observation horizon) it holds until that horizon; without, it is
    excluded from duration (but still counts a visit). Durations are
    additive: Σ duration_us over states == series span, which tests pin.

    One lead() window per series + one bounded-key groupBy on
    (series, state) — same two-Exchange shape as time_weighted_avg.
    """
    keys = list(series_keys or [])
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(_us(F.col(on))).over(w)
    if end_ts is not None:
        nxt = F.coalesce(nxt, _us(F.lit(end_ts).cast("timestamp")))
    dur = nxt - _us(F.col(on))
    seg = df.select(
        *keys,
        F.col(state).alias("state"),
        F.col(on).alias("__t"),
        dur.alias("__dur"),
        nxt.alias("__next_us"),
    )
    return seg.groupBy(*keys, "state").agg(
        F.coalesce(F.sum("__dur"), F.lit(0)).cast("long").alias("duration_us"),
        F.count(F.lit(1)).alias("n_periods"),
        F.min("__t").alias("first_entered"),
        F.timestamp_micros(F.max("__next_us")).alias("last_exited"),
    )


def detect_gaps(
    df: DataFrame,
    min_gap_seconds: float,
    on: str = "ts",
    series_keys: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Heartbeat-gap detection: one row per (series, silence interval)
    where consecutive observations are more than ``min_gap_seconds``
    apart — the uptime/downtime primitive over ingest heartbeats, and the
    audit that decides WHERE the K5 gap-fill policies (zero/LOCF/linear)
    will actually fire on a measure series.

    Output: series keys, ``gap_start`` (last ts seen), ``gap_end`` (next
    ts), ``gap_secs`` (exact integer-microsecond-derived). Open-ended
    silence at the end of a series is NOT a gap (no successor to bound
    it) — pair with state_durations(end_ts=...) for horizon-bounded
    accounting. One lead() window per series, filter — a single hash
    Exchange, no groupBy at all."""
    if min_gap_seconds <= 0:
        raise ValueError("min_gap_seconds must be positive")
    keys = list(series_keys or [])
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt_us = F.lead(_us(F.col(on))).over(w)
    gap_us = nxt_us - _us(F.col(on))
    return (
        df.select(
            *keys,
            F.col(on).alias("gap_start"),
            F.timestamp_micros(nxt_us).alias("gap_end"),
            (gap_us.cast("double") / F.lit(1e6)).alias("gap_secs"),
        )
        .filter(F.col("gap_secs") > F.lit(float(min_gap_seconds)))
    )


def topk_per_bucket(
    df: DataFrame,
    k: int,
    key: str,
    on: str = "ts",
    by: str = "day",
    weight: str | None = None,
    series_keys: list[str] | None = None,
    prefilter_groups: int = 0,
) -> DataFrame:
    """Exact top-k heavy hitters per calendar bucket — "top domains per
    hour", "top users per day" — the leaderboard rollup every webtext
    ingest dashboard needs and the reference's fixed-measure pipeline has
    no analogue for (its peakdocs, /root/reference/R/sentiment_measures.R,
    ranks documents globally, never keys within time buckets).

    Weight per (bucket, key) is COUNT(*) or SUM(weight); ranking is
    row_number over (weight DESC, key ASC) — a total order, so results
    are deterministic and bit-reproducible across engines (rank/ties
    would admit >k rows and partition-order dependence).

    Scale shape: stage 1 is a groupBy on (series, bucket, key) — map-side
    partials absorb the raw row count, the shuffle carries only distinct
    combinations. Stage 2 ranks WITHIN the aggregated table. With
    ``prefilter_groups = m > 0`` the rank runs in two exact phases:
    row_number within (bucket, hash(key) % m) keeps m·k candidates per
    bucket, then the global row_number ranks only those. Since the salt
    groups partition the key space and per-key weights are already final
    after stage 1, every global top-k member is in its salt group's local
    top-k — the two-phase result is EXACT, and no single task ever holds
    a full bucket's distinct-key set (the 10^8-domains-per-day case).
    With m = 0 a single rank window per bucket is used (right when
    distinct keys per bucket are bounded)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = list(series_keys or [])
    wcol = F.count(F.lit(1)) if weight is None else F.sum(F.col(weight))
    agg = df.groupBy(
        *keys, F.date_trunc(by, F.col(on)).alias("bucket_ts"), F.col(key).alias("key")
    ).agg(wcol.alias("weight"))
    order = [F.col("weight").desc(), F.col("key").asc()]
    if prefilter_groups > 0:
        w_local = Window.partitionBy(
            *keys,
            "bucket_ts",
            F.pmod(F.xxhash64(F.col("key")), F.lit(prefilter_groups)),
        ).orderBy(*order)
        agg = agg.withColumn("__lrn", F.row_number().over(w_local)).filter(
            F.col("__lrn") <= k
        ).drop("__lrn")
    w_glob = Window.partitionBy(*keys, "bucket_ts").orderBy(*order)
    return (
        agg.withColumn("rank", F.row_number().over(w_glob))
        .filter(F.col("rank") <= k)
    )


def cusum_changepoints(
    df: DataFrame,
    threshold_sigmas: float = 5.0,
    drift_sigmas: float = 0.0,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Page's CUSUM level-shift detector over a (rolled-up) measure
    series, in the prefix-sum formulation that needs NO sequential
    recurrence: with d_i = x_i − μ (per-series mean) and running sum
    S_i = Σ_{j<=i} d_j,

        G_i = S_i − min(0, min_{j<=i} S_j)    (upward-shift statistic)
        H_i = max(0, max_{j<=i} S_j) − S_i    (downward-shift statistic)

    which equals the classic clamped recurrence
    g_i = max(0, g_{i-1} + d_i) EXACTLY (the running min of the prefix
    sum, with the virtual S_0 = 0 included, is the last clamp point —
    the equivalence the tests pin against a plain-loop recurrence). Drift subtracts ``drift_sigmas``·σ from
    each deviation before summing (the standard slack that ignores slow
    wander); a shift is flagged when the statistic exceeds
    ``threshold_sigmas``·σ.

    Everything is one window pass per series: prefix sum, running
    min/max, plus whole-partition n/Σx/Σx² picked off the LAST prefix
    value (``last_value`` over the full frame) — so every float both
    engines compare is built from the SAME linearly-ordered prefix sums
    (the ewma_time_decay determinism doctrine), never from a
    tree-aggregated mean whose summation order differs. Flags compare
    r6-rounded statistic vs r6-rounded threshold, so an ulp at the cliff
    cannot flip engines apart. One hash Exchange + sort; O(1) state."""
    if threshold_sigmas <= 0:
        raise ValueError("threshold_sigmas must be positive")
    if drift_sigmas < 0:
        raise ValueError("drift_sigmas must be >= 0")
    keys = list(series_keys or [])
    if not keys:
        raise ValueError(
            "cusum_changepoints requires series_keys: a keyless CUSUM is "
            "one global window partition (a single task holds every row)"
        )
    # NULL-value rows are dropped before fitting (the holt/mad drop-
    # then-fit doctrine): a NULL has no deviation, and keeping the row
    # would let row_number() advance while the prefix sum stands still,
    # silently corrupting every later statistic.
    df = df.filter(F.col(value).isNotNull())
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w_run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    x = F.col(value).cast("double")
    cum_x = F.sum(x).over(w_run)
    cum_x2 = F.sum(x * x).over(w_run)
    n = F.count(F.lit(1)).over(w_all).cast("double")
    tot_x = F.last(cum_x).over(w_all)
    tot_x2 = F.last(cum_x2).over(w_all)
    mu = tot_x / n
    # try_divide: an n=1 series has divisor (n-1) = 0 — under ANSI mode a
    # plain division THROWS (killing the whole job on one degenerate
    # series); NULL here flows into the n>=2 gate below instead
    sigma = F.sqrt(
        F.greatest(
            F.lit(0.0),
            F.try_divide(tot_x2 - tot_x * tot_x / n, n - F.lit(1.0)),
        )
    )
    # prefix sum of deviations: Σx_j − i·(μ + drift·σ) — one running sum
    # (cum_x) reused, the per-row index comes from the same sort
    i = F.row_number().over(Window.partitionBy(*keys).orderBy(*order)).cast("double")
    s_up = cum_x - i * (mu + F.lit(float(drift_sigmas)) * sigma)
    s_dn = cum_x - i * (mu - F.lit(float(drift_sigmas)) * sigma)
    g = s_up - F.least(F.lit(0.0), F.min(s_up).over(w_run))
    h = F.greatest(F.lit(0.0), F.max(s_dn).over(w_run)) - s_dn
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5) + F.lit(1e-9)) / F.lit(1e6)
    thr = r6(F.lit(float(threshold_sigmas)) * sigma)
    # a 1-observation series has no variance estimate: (n-1) = 0 makes
    # sigma sqrt(0/0) = NaN (Spark orders NaN greatest, so the statistics
    # would silently read NaN, not NULL). Gate on n >= 2: NULL statistics,
    # explicitly-false flags.
    ok = n >= F.lit(2.0)
    return (
        df.withColumn("cusum_up", F.when(ok, r6(g)))
        .withColumn("cusum_down", F.when(ok, r6(h)))
        .withColumn("shift_up", F.when(ok, r6(g) > thr).otherwise(F.lit(False)))
        .withColumn("shift_down", F.when(ok, r6(h) > thr).otherwise(F.lit(False)))
    )


def hll_distinct_tier(
    df: DataFrame,
    key: str,
    on: str = "ts",
    series_keys: list[str] | None = None,
    by: str = "hour",
    lgk: int = 12,
) -> DataFrame:
    """Finest-tier distinct-count sketches: one Datasketches HLL sketch of
    ``key`` per (series, calendar bucket) — the ONLY distinct-count shape
    that survives the tier engine, because exact COUNT(DISTINCT) does not
    re-aggregate (distinct users per hour cannot be summed into distinct
    users per day; the sketches union losslessly instead).

    Output: series keys, ``bucket_ts``, ``hll`` (binary sketch,
    2^lgk registers), ``estimate`` (bigint), ``n_rows``. One groupBy on
    bounded (series, bucket) keys with mergeable map-side partials — the
    shuffle carries O(2^lgk)-byte sketches, never raw keys. Register
    content is order-invariant, so re-running the same plan on the same
    data reproduces estimates exactly (tested). DataSketches subtlety:
    the library reports the HIP estimator while a sketch has only ever
    absorbed raw/coupon updates and the composite estimator after dense
    merges, so estimates are decomposition-SENSITIVE within the error
    bound — do not assert bit-equality between differently-built
    sketches of the same set; the hard invariants are the error bound
    and exact n_rows additivity (see hll_distinct_rollup)."""
    keys = list(series_keys or [])
    return df.groupBy(
        *keys, F.date_trunc(by, F.col(on)).alias("bucket_ts")
    ).agg(
        F.hll_sketch_agg(F.col(key), F.lit(int(lgk))).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    ).withColumn("estimate", F.hll_sketch_estimate(F.col("hll")))


def hll_distinct_rollup(
    tier: DataFrame,
    to: str = "day",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Roll a finer distinct-count tier to a coarser one by UNIONING the
    stored sketches — no raw data touched, the continuous-aggregate
    property the north star demands (hour→day→week→month each reads only
    the tier below). HLL union takes the per-register maximum, which is
    associative and commutative, so the merged estimate is IDENTICAL to
    the sketch built directly from the raw rows (an exact equality the
    tests pin, not an approximation bound).

    Input is ``hll_distinct_tier`` output (or a previous rollup — the
    operation composes). One groupBy over coarser bucket keys; n_rows
    stays additive.

    Accuracy contract (tested): register merge is associative, so ANY
    decomposition of the rows into input sketches (hour sketches,
    per-shard sketches, hour→day→month vs hour→month) yields an estimate
    within the standard HLL bound of the exact distinct count
    (~1.04/√2^lgk relative error, ≈1.6% at lgk=12) — but NOT bit-equal
    across decompositions: DataSketches reports the tighter HIP
    estimator for never-merged sketches and the composite estimator
    after merges, an estimator choice, not lost information. n_rows is
    exactly additive, and re-running the same plan is deterministic."""
    keys = list(series_keys or [])
    return tier.groupBy(
        *keys, F.date_trunc(to, F.col("bucket_ts")).alias("bucket_ts")
    ).agg(
        F.hll_union_agg(F.col("hll")).alias("hll"),
        F.sum("n_rows").alias("n_rows"),
    ).withColumn("estimate", F.hll_sketch_estimate(F.col("hll")))


def time_bucket(
    col: Column,
    width_seconds: float,
    origin: str = "2000-01-03 00:00:00",
) -> Column:
    """TimescaleDB-style arbitrary-width time bucket: the largest
    ``origin + n·width`` not after ``col`` — generalizing the engine's
    calendar buckets (A1 hour/day/ISO-week/month/year,
    /root/reference/R/sentomeasures_main.R:406-453) to ANY fixed width
    (15 min, 6 h, 2 d) with explicit alignment. The default origin is
    TimescaleDB's (2000-01-03, a Monday, so week-multiples align to ISO
    weeks).

    Pure integer microsecond arithmetic (``pmod`` keeps pre-origin
    timestamps correct — floor, not truncate-toward-zero), so it stays
    inside whole-stage codegen and is bit-identical to DuckDB/TimescaleDB
    ``time_bucket`` (oracle-checked against DuckDB's native function).
    Calendar-variable widths (months) are what the A1 buckets are for —
    this is the fixed-width complement, not a replacement."""
    w_us = int(round(width_seconds * 1_000_000))
    if w_us <= 0:
        raise ValueError("width_seconds must be positive")
    us = _us(col)
    o = _us(F.lit(origin).cast("timestamp"))
    return F.timestamp_micros(us - F.pmod(us - o, F.lit(w_us)))


def cohort_retention(
    df: DataFrame,
    on: str = "ts",
    user: str = "user_id",
    by: str = "week",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Cohort retention matrix over an activity stream: users are
    cohorted by the calendar bucket of their FIRST event, and each later
    bucket they are active in increments (cohort, age) — the
    week-0/week-1/… retention triangle every engagement dashboard draws,
    plus per-bucket new-vs-returning splits via the same output
    (age 0 rows are exactly the new users of their bucket).

    Output per (series, cohort_ts, age): ``n_users`` (distinct users of
    that cohort active ``age`` buckets after their first), exact — no
    sketches, the (user, bucket) distinct pairs are materialized once.

    Scale shape: one distinct on (series, user, bucket) — the shuffle is
    bounded by active (user, bucket) pairs, far below raw events after
    map-side partial dedup; one window min over user (second Exchange)
    pins each user's cohort; the final groupBy is on the tiny
    (cohort, age) key space. ``by`` must be a fixed-stride unit
    (hour/day/week) so age = integer bucket difference; month retention
    needs months_between semantics — use A1 buckets + a custom age for
    that."""
    strides = {"hour": 3_600, "day": 86_400, "week": 7 * 86_400}
    if by not in strides:
        raise ValueError(f"by must be one of {sorted(strides)} (fixed stride)")
    keys = list(series_keys or [])
    # date_trunc('week') is ISO (Monday) in both Spark and DuckDB
    b = F.date_trunc(by, F.col(on)).alias("__b")
    active = df.select(*keys, F.col(user).alias("__u"), b).distinct()
    w = Window.partitionBy(*keys, "__u")
    cohort = F.min("__b").over(w)
    stride_us = strides[by] * 1_000_000
    aged = active.select(
        *keys,
        cohort.alias("cohort_ts"),
        ((_us(F.col("__b")) - _us(cohort)) / F.lit(stride_us))
        .cast("long")
        .alias("age"),
        "__u",
    )
    return aged.groupBy(*keys, "cohort_ts", "age").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def funnel_stages(
    df: DataFrame,
    steps: list[str],
    within_seconds: float | None = None,
    on: str = "ts",
    user: str = "user_id",
    step_col: str = "event_type",
    series_keys: list[str] | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis (the ClickHouse ``windowFunnel`` shape):
    how far each user progressed through ``steps`` in order, optionally
    requiring the whole path to fit inside ``within_seconds`` of the
    first step.

    Semantics — the EARLIEST-ANCHOR CASCADE, chosen because it is
    deterministic and exactly SQL-replicable: t₁ = the user's earliest
    step-1 event; t_k = the earliest step-k event at-or-after t_{k-1};
    ``stage`` = the largest k with t_k defined and t_k − t₁ ≤ within.
    (Cascade times are monotone, so the window cut never leaves gaps.)
    This is NOT the sliding-anchor maximal variant: a user who would
    only convert measured from a LATER first step is not counted —
    documented, and the right trade for an auditable metric.

    Output per user: ``stage`` (0..len(steps)), ``first_ts`` (t₁),
    ``reached_ts`` (t_stage). Only users with at least one step event
    appear (filter others upstream or count them as stage 0 via the
    user dimension table).

    Scale shape: filter to the step vocabulary (pushed to the scan),
    then ONE groupBy(user) building the per-user event list — bounded by
    per-user funnel events, the same contract as sessionization — and a
    single JVM ``aggregate`` fold walks the cascade; no window function,
    no join, no Python. Events are folded in (ts, step-index) order so
    equal-timestamp cascades resolve exactly like the SQL ``>=``.

    ``max_events_per_user`` is the defensive valve on that contract: the
    per-user ``collect_list`` row is the one thing here that scales with a
    single key, and at crawl scale one pathological bot key can OOM its
    task. Users whose step-event count exceeds the cap are DROPPED from
    the output (not truncated — a truncated cascade would emit a
    plausible-but-wrong stage) and are auditable via
    :func:`funnel_overflow`. It is OPT-IN (default None) because an exact
    guard is not free — both implementations were measured on the
    200M-event / 3M-user scaling corpus at local[8]: a count window on the
    aggregation's own Exchange adds a per-partition sort of every event
    (+~60-80%, 12.0 s -> 19.2 s); a count-agg + broadcast anti-join avoids
    the sort but pays a second scan-and-count pass (+~130%, 27.9 s). The
    window form (the cheaper one) is what ``max_events_per_user`` enables;
    run the funnel uncapped on curated streams, capped on untrusted ones,
    and use :func:`funnel_overflow` (one cheap count pass) as the
    pre-flight bot audit either way."""
    k = len(steps)
    if k < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != k:
        raise ValueError("steps must be distinct")
    if within_seconds is not None and within_seconds < 0:
        raise ValueError("within_seconds must be >= 0")
    keys = list(series_keys or [])
    idx = F.lit(None).cast("int")
    for j in range(k - 1, -1, -1):
        idx = F.when(F.col(step_col) == steps[j], F.lit(j)).otherwise(idx)
    ev = df.filter(F.col(step_col).isin(list(steps))).select(
        *keys,
        F.col(user).alias("__u"),
        F.struct(_us(F.col(on)).alias("us"), idx.alias("idx")).alias("__e"),
    )
    if max_events_per_user is not None:
        if max_events_per_user < 1:
            raise ValueError("max_events_per_user must be >= 1 (or None)")
        wc = Window.partitionBy(*keys, "__u")
        ev = (
            ev.withColumn("__n", F.count(F.lit(1)).over(wc))
            .filter(F.col("__n") <= max_events_per_user)
            .drop("__n")
        )
    lst = F.sort_array(F.collect_list("__e"))

    def _upd(acc, e):
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.coalesce(
                F.element_at(acc, j + 1),
                F.when(
                    (e["idx"] == j)
                    & F.when(j == F.lit(0), F.lit(True)).otherwise(
                        F.element_at(acc, j).isNotNull()
                        & (e["us"] >= F.element_at(acc, j))
                    ),
                    e["us"],
                ),
            ),
        )

    acc = F.aggregate(
        lst, F.expr(f"array_repeat(cast(null as bigint), {k})"), _upd
    )
    agg = ev.groupBy(*keys, "__u").agg(acc.alias("__acc"))
    t1 = F.element_at("__acc", 1)
    if within_seconds is None:
        ok = F.transform("__acc", lambda t: t.isNotNull())
    else:
        w_us = int(round(within_seconds * 1_000_000))
        ok = F.transform(
            "__acc", lambda t: t.isNotNull() & ((t - t1) <= F.lit(w_us))
        )
    stage = F.size(F.filter(ok, lambda b: b))
    return agg.select(
        *keys,
        F.col("__u").alias(user),
        stage.cast("long").alias("stage"),
        F.timestamp_micros(t1).alias("first_ts"),
        F.timestamp_micros(
            F.when(stage > 0, F.element_at("__acc", stage))
        ).alias("reached_ts"),
    )


def funnel_overflow(
    df: DataFrame,
    steps: list[str],
    max_events_per_user: int = 10_000_000,
    on: str = "ts",
    user: str = "user_id",
    step_col: str = "event_type",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """The audit counter for :func:`funnel_stages`'s defensive cap: the
    users whose step-event count exceeds ``max_events_per_user`` (and were
    therefore dropped from the funnel), with their counts. Run it with the
    same arguments as the funnel; a non-empty result is the drop-and-log
    signal — at web scale these keys are bots/monitors to exclude
    upstream. Plain groupBy-count (map-side partial combine), no list
    materialization, so it is safe to run on exactly the keys the funnel
    cannot hold."""
    keys = list(series_keys or [])
    return (
        df.filter(F.col(step_col).isin(list(steps)))
        .groupBy(*keys, F.col(user).alias(user))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") > max_events_per_user)
    )


def bucket_trend(
    df: DataFrame,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "hour",
) -> DataFrame:
    """Per-(series, calendar bucket) OLS trend: slope (value units per
    second), intercept (fitted value at the bucket start) and r² of the
    regression of ``value`` on elapsed-seconds-within-bucket. The
    "is this metric rising inside each window" primitive — the rollup
    analogue of PromQL's ``deriv()``.

    x is rebased to seconds since the bucket start BEFORE squaring
    (epoch-microsecond x² is ~1e33 and eats all double precision; bucket-
    relative x² is ≤ 7.5e9 for a day bucket). All five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²(, Σy²)) come from ONE groupBy with
    map-side partials (NULL values are dropped first so n counts only
    fitted points) — no window sort, no second pass; slope/intercept/r²
    are ratios of those sums, computed at value magnitude where the r6
    oracle rounding is stable (the TWA round-ratios rule). Degenerate
    buckets (n < 2 or zero x-variance, e.g. all rows at one timestamp)
    return NULL slope/intercept/r²; zero y-variance returns r²=NULL
    (0/0) with a valid flat slope."""
    keys = list(series_keys or [])
    b = F.date_trunc(by, F.col(on))
    x = (_us(F.col(on)) - _us(b)).cast("double") / F.lit(1e6)
    y = F.col(value).cast("double")
    pre = df.filter(y.isNotNull()).select(
        *keys,
        b.alias("bucket_ts"),
        x.alias("__x"),
        y.alias("__y"),
    )
    agg = pre.groupBy(*keys, "bucket_ts").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("n_obs").cast("double")
    sxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    syy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    sxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = F.when((F.col("n_obs") >= 2) & (sxx > 0), sxy / sxx)
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = F.when(syy > 0, (sxy * sxy) / (sxx * syy))
    return agg.select(
        *keys,
        "bucket_ts",
        slope.alias("slope_per_sec"),
        intercept.alias("intercept"),
        F.when(slope.isNotNull(), r2).alias("r2"),
        "n_obs",
    )


def acf(
    df: DataFrame,
    max_lag: int,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-series autocorrelation function at lags 1..max_lag over an
    ordered series (normally an already-rolled-up, gap-filled tier —
    lags are POSITIONAL, so run it on a regular grid):

        r_k = Σ_{t≤n−k} (x_t − μ)(x_{t+k} − μ) / Σ_t (x_t − μ)²

    with μ and the denominator over the FULL series — the standard
    Box-Jenkins/statsmodels estimator (biased, positive-semidefinite),
    NOT the per-lag-mean variant. The seasonality-detection primitive: a
    daily cycle in an hourly tier peaks at lag 24.

    ONE Exchange total and NO join: an ordered window builds the array
    of the next ``max_lag`` centered values in ONE pass (the naive form
    self-joins the series K times), with μ from an unordered window over
    the SAME partitioning (Catalyst reuses the Exchange); the
    denominator Σd² and n ride along as a second window over the same
    partitioning (again no new Exchange) instead of a per-series
    aggregate that would need a join back — AQE turns that join into a
    SortMergeJoin whenever stats are missing. Products then explode to
    (series, lag) rows — bounded at n·K, map-side partials — and the
    (series, lag) groupBy finishes WITHOUT reshuffling: hash-partitioning
    on series already satisfies its distribution (plan-asserted). Output keeps every lag
    1..max_lag per series: ``r`` (NULL when the series has no lag-k
    pairs or zero variance), ``n_pairs`` for CIs (±1.96/√n), ``n_obs``."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    keys = list(series_keys or [])
    if not keys:
        raise ValueError(
            "acf requires series_keys: a keyless series is one global "
            "window partition (single task holds every row)"
        )
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    wfull = Window.partitionBy(*keys)
    y = F.col(value).cast("double")
    mu = F.avg(y).over(wfull)
    base = df.select(
        *keys,
        (y - mu).alias("__d"),
        F.array(
            *[F.lead(y, k).over(w) - mu for k in range(1, max_lag + 1)]
        ).alias("__dl"),
    )
    base = base.select(
        *keys,
        "__d",
        "__dl",
        F.sum(F.col("__d") * F.col("__d")).over(wfull).alias("__ss"),
        F.count(F.lit(1)).over(wfull).alias("__n"),
    )
    num = (
        base.select(
            *keys, "__d", "__ss", "__n",
            F.posexplode("__dl").alias("__k0", "__dlk"),
        )
        .groupBy(*keys, (F.col("__k0") + 1).alias("lag"))
        .agg(
            F.sum(F.col("__d") * F.col("__dlk")).alias("__num"),
            # count the PRODUCT, not the lead: a pair whose left side is
            # NULL contributes nothing to the numerator and must not
            # inflate n_pairs either
            F.count(F.col("__d") * F.col("__dlk")).alias("n_pairs"),
            F.first("__ss").alias("__ss"),
            F.first("__n").alias("n_obs"),
        )
    )
    r = F.when(
        (F.col("n_pairs") > 0) & (F.col("__ss") > 0),
        F.col("__num") / F.col("__ss"),
    )
    return num.select(
        *keys,
        F.col("lag").cast("int").alias("lag"),
        r.alias("r"),
        "n_pairs",
        "n_obs",
    )


def seasonal_decompose(
    df: DataFrame,
    period: int,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Classical additive seasonal decomposition (the statsmodels
    ``seasonal_decompose(model='additive')`` estimator) of a REGULAR
    series — run it on a gap-filled tier, positions are ordinal:

      trend_t    = centered moving average of width ``period``
                   (even p: the 2×p MA — ends half-weighted; odd p:
                   plain centered MA); NULL at the edges where the
                   full window does not exist,
      seasonal_φ = mean over t of (x_t − trend_t) at phase φ = t mod p,
                   re-centered so the p seasonal effects sum to zero —
                   constant per phase across the whole series,
      resid_t    = x_t − trend_t − seasonal_t (NULL where trend is).

    Scale shape: ONE ordered window per series carries the row number
    and both MA half-sums (even p needs two overlapping p-frames — same
    sort, no extra Exchange); phase effects are a (series, phase)
    groupBy — at most p rows per series — re-centered with a second
    p-row groupBy and broadcast-joined back. Raw rows shuffle once.

    Phase 0 is the series' FIRST row (ordinal, statsmodels convention),
    not a calendar phase: decompose aligned series (same grid start) or
    read phases via the returned ``phase`` column."""
    if period < 2:
        raise ValueError("period must be >= 2")
    keys = list(series_keys or [])
    if not keys:
        raise ValueError(
            "seasonal_decompose requires series_keys: a keyless series is "
            "one global window partition (single task holds every row)"
        )
    w = Window.partitionBy(*keys).orderBy(F.col(on))
    y = F.col(value).cast("double")
    half = period // 2
    if period % 2 == 0:
        # 2xp MA: average of the p-frame [-h, h-1] and the p-frame [-h+1, h]
        f1 = w.rowsBetween(-half, half - 1)
        f2 = w.rowsBetween(-half + 1, half)
        trend = F.when(
            (F.count(y).over(f1) == period) & (F.count(y).over(f2) == period),
            (F.sum(y).over(f1) + F.sum(y).over(f2)) / F.lit(2.0 * period),
        )
    else:
        fr = w.rowsBetween(-half, half)
        trend = F.when(
            F.count(y).over(fr) == period, F.sum(y).over(fr) / F.lit(float(period))
        )
    base = df.withColumn("__rn", F.row_number().over(w) - 1).withColumn(
        "__trend", trend
    )
    base = base.withColumn("phase", (F.col("__rn") % period).cast("int"))
    eff = (
        base.filter(F.col("__trend").isNotNull())
        .groupBy(*keys, "phase")
        .agg(F.avg(y - F.col("__trend")).alias("__raw"))
    )
    ctr = eff.groupBy(*keys).agg(F.avg("__raw").alias("__c"))
    eff = eff.join(F.broadcast(ctr), keys).select(
        *keys, "phase", (F.col("__raw") - F.col("__c")).alias("__seas")
    )
    out = base.join(F.broadcast(eff), keys + ["phase"], "left")
    return out.select(
        *df.columns,
        "phase",
        F.col("__trend").alias("trend"),
        F.col("__seas").alias("seasonal"),
        (y - F.col("__trend") - F.col("__seas")).alias("resid"),
    )


def kll_quantile_tier(
    df: DataFrame,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "hour",
    k: int = 200,
    qs: list[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Finest-tier re-aggregatable percentiles: one Datasketches KLL
    sketch of ``value`` per (series, calendar bucket) — the quantile
    analogue of ``hll_distinct_tier``, and the only percentile shape the
    tier engine can keep: exact p99-per-hour cannot be rolled into
    p99-per-day (quantiles don't add), but KLL sketches MERGE losslessly
    within their rank-error bound, so every coarser tier reads only the
    tier below, never the raw stream.

    Output: series keys, ``bucket_ts``, ``kll`` (binary sketch),
    decoded ``p50/p95/p99`` (or the requested qs), exact ``n_rows``.
    One groupBy on bounded (series, bucket) keys with mergeable map-side
    partials; the shuffle carries O(k·log(n/k))-byte sketches, never raw
    values. Rank-error contract: ~1.65/√k ≈ 1.2% at k=200 (two-sided,
    99% confidence), tested against exact ``percentile``. Estimates are
    LIB-DEFINED at rank boundaries (KLL returns a stored value, not an
    interpolation — quantile_cont oracles don't apply); n_rows is exact
    and additive."""
    keys = list(series_keys or [])
    v = F.col(value).cast("double")
    agg = df.groupBy(*keys, F.date_trunc(by, F.col(on)).alias("bucket_ts")).agg(
        F.kll_sketch_agg_double(v, F.lit(int(k))).alias("kll"),
        F.count(v).alias("n_rows"),
    )
    return agg.select(
        *keys,
        "bucket_ts",
        "kll",
        *[
            F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(q))).alias(
                f"p{str(q).replace('0.', '').ljust(2, '0')}"
            )
            for q in qs
        ],
        "n_rows",
    )


def kll_quantile_rollup(
    tier: DataFrame,
    to: str = "day",
    series_keys: list[str] | None = None,
    qs: list[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Roll a finer percentile tier to a coarser one by MERGING the
    stored KLL sketches — no raw data touched (hour→day→week→month each
    reads only the tier below), the continuous-aggregate property.

    Input is ``kll_quantile_tier`` output (or a previous rollup — the
    operation composes). One groupBy over coarser bucket keys; n_rows
    stays exactly additive. Merge is within the same rank-error bound as
    a sketch built directly from the raw rows (tested); like the HLL
    tier, estimates are NOT asserted bit-equal across decompositions —
    the KLL compaction schedule depends on merge order — the contract is
    the rank-error bound plus exact n_rows."""
    keys = list(series_keys or [])
    agg = tier.groupBy(
        *keys, F.date_trunc(to, F.col("bucket_ts")).alias("bucket_ts")
    ).agg(
        F.kll_merge_agg_double(F.col("kll")).alias("kll"),
        F.sum("n_rows").alias("n_rows"),
    )
    return agg.select(
        *keys,
        "bucket_ts",
        "kll",
        *[
            F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(q))).alias(
                f"p{str(q).replace('0.', '').ljust(2, '0')}"
            )
            for q in qs
        ],
        "n_rows",
    )


def bucket_histogram(
    df: DataFrame,
    lo: float,
    hi: float,
    nbins: int,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "hour",
) -> DataFrame:
    """Fixed-bin histogram per (series, calendar bucket): counts of
    ``value`` in ``nbins`` equal-width bins over [lo, hi), plus underflow
    (bin -1) and overflow (bin ``nbins``) — the Prometheus-histogram /
    distribution-tier shape. Unlike percentiles, histogram counts are
    EXACT integers and re-aggregate losslessly (hour bins sum into day
    bins), so this is the cheap lossless companion to the KLL tier when
    the bin layout can be fixed up front.

    Bin index is pure JVM arithmetic (floor of the affine map, clamped),
    one groupBy on (series, bucket, bin) with map-side partials — bounded
    keys, no window, no Python. Empty bins are absent (sparse output);
    densify downstream with a sequence() join only if a fixed-width
    vector is genuinely needed. NULL values are dropped (they are in
    every aggregation in this engine); NaN goes to overflow (IEEE
    compares false on both engine sides, documented rather than clever).

    Rolling a finer tier up: ``out.groupBy(keys, date_trunc(coarser,
    bucket_ts), bin).sum(n)`` — counts add exactly; no helper needed."""
    if nbins < 1:
        raise ValueError("nbins must be >= 1")
    if not (hi > lo):
        raise ValueError("need hi > lo")
    keys = list(series_keys or [])
    v = F.col(value).cast("double")
    width = (hi - lo) / nbins
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(width)))
    bin_ = (
        F.when(F.isnan(v), F.lit(nbins))
        .when(v < F.lit(float(lo)), F.lit(-1))
        .when(raw >= nbins, F.lit(nbins))
        .otherwise(raw)
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .groupBy(
            *keys,
            F.date_trunc(by, F.col(on)).alias("bucket_ts"),
            bin_.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "bin_lo",
            F.when(F.col("bin") == -1, F.lit(float("-inf"))).otherwise(
                F.lit(float(lo)) + F.col("bin") * F.lit(float(width))
            ),
        )
        .withColumn(
            "bin_hi",
            F.when(F.col("bin") == nbins, F.lit(float("inf"))).otherwise(
                F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(float(width))
            ),
        )
    )


def holt_forecast(
    df: DataFrame,
    alpha: float,
    beta: float,
    horizon: int,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Holt linear-trend exponential smoothing per series, with an
    h-step-ahead forecast — the "where is this measure heading" primitive
    over a rolled-up tier:

        l_1 = x_1,  b_1 = x_2 − x_1   (statsmodels legacy-heuristic init;
                                       a 1-point series gets b_1 = 0;
                                       NULL values are dropped first)
        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        ŷ(h) = l_n + h·b_n

    Output: one row per (series, h) for h = 1..horizon, with ``level``
    and ``trend`` (the final l_n, b_n), ``yhat``, ``n_obs`` and
    ``last_ts`` (forecast origin). β = 0 degenerates to simple
    exponential smoothing (trend frozen at its init — pass a 1-row... or
    rather use alpha-only SES by also passing beta=0 and reading level).

    The recurrence is inherently sequential (l and b are coupled), so
    like ``lttb_downsample`` this is a per-series ``applyInPandas`` numpy
    kernel at the RIGHT altitude: input is an already-rolled-up tier,
    bounded per series by retention; parallelism is the series dimension.
    NOT for raw event streams — roll up first. The float operations are
    written in the exact textbook order above so a row-by-row SQL replay
    (DuckDB recursive CTE) reproduces them bit-for-bit."""
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0):
        raise ValueError("need 0 < alpha <= 1 and 0 <= beta <= 1")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    keys = list(series_keys or [])
    if not keys:
        raise ValueError("holt_forecast requires series_keys (per-series kernel)")
    import numpy as np
    import pandas as pd

    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    ts_type = df.schema[on].dataType.simpleString()
    out_schema = (
        f"{key_fields}, h int, yhat double, level double, trend double, "
        f"n_obs long, last_ts {ts_type}"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = (
            pdf[pdf[value].notna()]
            .sort_values(on, kind="mergesort")
            .reset_index(drop=True)
        )
        if not len(pdf):
            return pd.DataFrame({
                **{k: pd.Series([], dtype=pdf[k].dtype) for k in keys},
                "h": pd.Series([], dtype="int32"),
                "yhat": pd.Series([], dtype="float64"),
                "level": pd.Series([], dtype="float64"),
                "trend": pd.Series([], dtype="float64"),
                "n_obs": pd.Series([], dtype="int64"),
                "last_ts": pd.Series([], dtype=pdf[on].dtype),
            })
        x = pdf[value].to_numpy(dtype=np.float64)
        n = len(x)
        l = x[0]
        b = (x[1] - x[0]) if n >= 2 else 0.0
        for t in range(1, n):
            l_prev = l
            l = alpha * x[t] + (1.0 - alpha) * (l_prev + b)
            b = beta * (l - l_prev) + (1.0 - beta) * b
        rows = {k: [pdf[k].iloc[0]] * horizon for k in keys}
        rows["h"] = np.arange(1, horizon + 1, dtype=np.int32)
        rows["yhat"] = [l + h * b for h in range(1, horizon + 1)]
        rows["level"] = [l] * horizon
        rows["trend"] = [b] * horizon
        rows["n_obs"] = [n] * horizon
        rows["last_ts"] = [pdf[on].iloc[n - 1]] * horizon
        return pd.DataFrame(rows)

    return (
        df.select(*keys, on, value)
        .groupBy(*keys)
        .applyInPandas(_kernel, schema=out_schema)
    )


def ccf(
    df: DataFrame,
    max_lag: int,
    on: str = "ts",
    x: str = "x",
    y: str = "y",
    series_keys: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-series cross-correlation function between two aligned columns
    at lags −max_lag..max_lag (positional — run on a regular grid):

        r_k = Σ_t (x_t − x̄)(y_{t+k} − ȳ)
              / √( Σ(x − x̄)² · Σ(y − ȳ)² )

    (statsmodels ``ccf`` convention: positive k means x LEADS y — the
    "do clicks lead purchases by k hours" primitive; r_{−k} mirrors y
    leading x.) Means and both denominators are over the FULL series.

    Same plan shape as ``acf`` — ONE Exchange, NO join: one ordered
    window builds the array of y at offsets −K..K (lead for positive,
    lag for negative) in a single pass; x̄, ȳ and both sums of squares
    ride unordered windows over the same partitioning; the (series, lag)
    groupBy reuses it. NULL r where a series has no lag-k pairs or
    either side has zero variance."""
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")
    keys = list(series_keys or [])
    if not keys:
        raise ValueError(
            "ccf requires series_keys: a keyless series is one global "
            "window partition (add a constant key to correlate one pair)"
        )
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    wfull = Window.partitionBy(*keys)
    xv = F.col(x).cast("double")
    yv = F.col(y).cast("double")
    mx = F.avg(xv).over(wfull)
    my = F.avg(yv).over(wfull)

    def _off(k: int) -> Column:
        if k > 0:
            return F.lead(yv, k).over(w)
        if k < 0:
            return F.lag(yv, -k).over(w)
        return yv

    base = df.select(
        *keys,
        (xv - mx).alias("__dx"),
        (yv - my).alias("__dy"),
        F.array(
            *[_off(k) - my for k in range(-max_lag, max_lag + 1)]
        ).alias("__dyl"),
    )
    base = base.select(
        *keys,
        "__dx",
        "__dyl",
        F.sum(F.col("__dx") * F.col("__dx")).over(wfull).alias("__ssx"),
        F.sum(F.col("__dy") * F.col("__dy")).over(wfull).alias("__ssy"),
        F.count(F.lit(1)).over(wfull).alias("__n"),
    )
    num = (
        base.select(
            *keys, "__dx", "__ssx", "__ssy", "__n",
            F.posexplode("__dyl").alias("__k0", "__dyk"),
        )
        .groupBy(*keys, (F.col("__k0") - max_lag).alias("lag"))
        .agg(
            F.sum(F.col("__dx") * F.col("__dyk")).alias("__num"),
            F.count(F.col("__dx") * F.col("__dyk")).alias("n_pairs"),
            F.first("__ssx").alias("__ssx"),
            F.first("__ssy").alias("__ssy"),
            F.first("__n").alias("n_obs"),
        )
    )
    r = F.when(
        (F.col("n_pairs") > 0) & (F.col("__ssx") > 0) & (F.col("__ssy") > 0),
        F.col("__num") / F.sqrt(F.col("__ssx") * F.col("__ssy")),
    )
    return num.select(
        *keys,
        F.col("lag").cast("int").alias("lag"),
        r.alias("r"),
        "n_pairs",
        "n_obs",
    )


def mad_outliers(
    df: DataFrame,
    threshold: float = 3.5,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
    by: str = "day",
) -> DataFrame:
    """Robust per-(series, calendar bucket) outlier flags: each
    observation is scored against its bucket's MEDIAN and MAD (median
    absolute deviation), flagged when

        |x − median| > threshold · 1.4826 · MAD

    (1.4826 = 1/Φ⁻¹(3/4) makes MAD consistent for the normal σ; 3.5 is
    the standard Iglewicz-Hoaglin cut). The robust counterpart of
    ``rolling_zscore``: a burst of extreme values drags a mean/stddev
    gate (masking itself) but barely moves the median. Zero-MAD buckets
    (at least half the bucket at one value) get NULL ``robust_z`` and
    ``is_outlier`` = false — a zero-spread bucket has no robust scale to
    score against.

    ONE Exchange, NO join: exact ``percentile`` runs as a window
    aggregate over the (series, bucket) partition for the median, and
    again over the SAME partitioning for the MAD of the derived
    deviations — two Window nodes, one hash Exchange, rows never leave
    their partition. Exact per-bucket percentile state is the bucket
    itself (same contract as bucket_percentiles mode='exact'); this is a
    monitoring op over rolled-up or bounded buckets, not a raw 10^12-row
    pass — use rolling_zscore for the cheap streaming-friendly gate."""
    keys = list(series_keys or [])
    v = F.col(value).cast("double")
    # materialize the bucket BEFORE the windows: partitioning two Window
    # nodes by the same named column collapses them onto one Exchange,
    # partitioning by a fresh date_trunc expression does not
    base = df.withColumn("__b", F.date_trunc(by, F.col(on)))
    wb = Window.partitionBy(*keys, "__b")
    base = base.withColumn("__med", F.expr(f"percentile({value}, 0.5)").over(wb))
    base = base.withColumn("__adev", F.abs(v - F.col("__med")))
    base = base.withColumn(
        "__mad", F.expr("percentile(__adev, 0.5)").over(wb)
    ).withColumn("__n", F.count(v).over(wb))
    z = F.when(
        F.col("__mad") > 0,
        (v - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")),
    )
    return base.select(
        *df.columns,
        F.col("__b").alias("bucket_ts"),
        F.col("__med").alias("bucket_median"),
        F.col("__mad").alias("bucket_mad"),
        z.alias("robust_z"),
        F.coalesce(F.abs(z) > F.lit(float(threshold)), F.lit(False)).alias(
            "is_outlier"
        ),
        F.col("__n").alias("n_obs"),
    )


def holt_winters(
    df: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    horizon: int,
    on: str = "ts",
    value: str = "value",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal exponential smoothing per series,
    with an h-step-ahead forecast — completes the smoothing family
    (``ewma_time_decay`` -> ``holt_forecast`` -> here) for tiers with a
    repeating cycle (hour-of-day, day-of-week). The reference has no
    forecasting at all (its across-time layer stops at weighted rolling
    sums, /root/reference/R/sentomeasures_main.R:406-453).

    Textbook recurrence (NIST/ESD convention, means-based init), with
    m = ``period``:

        l_m = mean(x_1..x_m)
        b_m = (mean(x_{m+1}..x_{2m}) - mean(x_1..x_m)) / m
        s_i = x_i - l_m                       for i = 1..m
        for t = m+1..n:
            l_t = alpha*(x_t - s_{t-m}) + (1-alpha)*(l_{t-1} + b_{t-1})
            b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
            s_t = gamma*(x_t - l_t) + (1-gamma)*s_{t-m}
        yhat(h) = l_n + h*b_n + s_{n-m+1+((h-1) mod m)}

    Output: one row per (series, h) for h = 1..horizon with ``yhat``,
    the final ``level``/``trend``, the ``season`` term applied at that
    h, ``n_obs`` and ``last_ts``. Series with fewer than 2*period
    non-NULL observations are dropped (two full cycles are required for
    the init, as in statsmodels). The season index is POSITIONAL — run
    on a gap-filled regular tier when calendar alignment matters.

    Scale shape: identical to ``holt_forecast`` — the recurrence is
    inherently sequential, so this is a per-series ``applyInPandas``
    numpy kernel over an already-rolled-up tier (bounded per series by
    retention); parallelism is the series dimension; ONE Exchange on the
    series keys. Float ops are written in the exact textbook order above
    so a row-by-row SQL replay (DuckDB recursive CTE carrying the last m
    seasonals as a LIST) reproduces them bit-for-bit; feed the tier as
    integer-valued doubles (e.g. micro-units) to make the two init means
    summation-order-free across engines.
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0) or not (
        0.0 <= gamma <= 1.0
    ):
        raise ValueError("need 0 < alpha <= 1, 0 <= beta <= 1, 0 <= gamma <= 1")
    if period < 2:
        raise ValueError("period must be >= 2")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    keys = list(series_keys or [])
    if not keys:
        raise ValueError("holt_winters requires series_keys (per-series kernel)")
    import numpy as np
    import pandas as pd

    m = int(period)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    ts_type = df.schema[on].dataType.simpleString()
    out_schema = (
        f"{key_fields}, h int, yhat double, level double, trend double, "
        f"season double, n_obs long, last_ts {ts_type}"
    )

    def _empty(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            **{k: pd.Series([], dtype=pdf[k].dtype) for k in keys},
            "h": pd.Series([], dtype="int32"),
            "yhat": pd.Series([], dtype="float64"),
            "level": pd.Series([], dtype="float64"),
            "trend": pd.Series([], dtype="float64"),
            "season": pd.Series([], dtype="float64"),
            "n_obs": pd.Series([], dtype="int64"),
            "last_ts": pd.Series([], dtype=pdf[on].dtype),
        })

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = (
            pdf[pdf[value].notna()]
            .sort_values(on, kind="mergesort")
            .reset_index(drop=True)
        )
        n = len(pdf)
        if n < 2 * m:
            return _empty(pdf)
        x = pdf[value].to_numpy(dtype=np.float64)
        mean1 = float(np.sum(x[:m])) / m
        mean2 = float(np.sum(x[m:2 * m])) / m
        l = mean1
        b = (mean2 - mean1) / m
        s = [x[i] - mean1 for i in range(m)]  # s[0] oldest of last m
        for t in range(m, n):
            s_old = s[0]
            l_prev = l
            l = alpha * (x[t] - s_old) + (1.0 - alpha) * (l_prev + b)
            b = beta * (l - l_prev) + (1.0 - beta) * b
            s = s[1:] + [gamma * (x[t] - l) + (1.0 - gamma) * s_old]
        seasons = [s[(h - 1) % m] for h in range(1, horizon + 1)]
        rows = {k: [pdf[k].iloc[0]] * horizon for k in keys}
        rows["h"] = np.arange(1, horizon + 1, dtype=np.int32)
        rows["yhat"] = [
            l + h * b + seasons[h - 1] for h in range(1, horizon + 1)
        ]
        rows["level"] = [l] * horizon
        rows["trend"] = [b] * horizon
        rows["season"] = seasons
        rows["n_obs"] = [n] * horizon
        rows["last_ts"] = [pdf[on].iloc[n - 1]] * horizon
        return pd.DataFrame(rows)

    return (
        df.select(*keys, on, value)
        .groupBy(*keys)
        .applyInPandas(_kernel, schema=out_schema)
    )


def burn_rate(
    df: DataFrame,
    slo: float,
    short_buckets: int,
    long_buckets: int,
    on: str = "ts",
    good: str = "good",
    bad: str = "bad",
    threshold: float | None = None,
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Multi-window SLO error-budget burn rate over a per-bucket
    (good, bad) counts tier — the Google-SRE alerting primitive
    (burn = observed bad ratio / allowed bad ratio, alert when BOTH a
    short and a long trailing window burn faster than ``threshold``;
    the short window gates alert reset, the long one gates flappiness).

    For each bucket row: trailing sums of ``bad`` and ``good`` over the
    last ``short_buckets`` / ``long_buckets`` rows (current inclusive),
    bad_ratio = bad / (bad + good), burn = bad_ratio / (1 - slo).
    Ratios are NULL while a window has zero events; ``alert`` (only when
    ``threshold`` is given) is true when both burns exceed it. Windows
    are POSITIONAL (rows, not time) — run on a gap-filled tier so a
    silent hour counts as zero traffic, not a skipped row.

    Scale shape: pure Catalyst — one hash Exchange on the series keys,
    one sort, TWO row frames on the same window partitioning (no join,
    no UDF); whole-stage codegen end to end. Counts are integers, so
    the trailing sums are exact and order-free, and the derived ratios
    are bit-reproducible across engines.
    """
    if not (0.0 < slo < 1.0):
        raise ValueError("slo must be in (0, 1)")
    if short_buckets < 1 or long_buckets < short_buckets:
        raise ValueError("need 1 <= short_buckets <= long_buckets")
    keys = list(series_keys or [])
    order = Window.partitionBy(*keys).orderBy(F.col(on)) if keys else (
        Window.partitionBy().orderBy(F.col(on))
    )
    w_s = order.rowsBetween(-(short_buckets - 1), 0)
    w_l = order.rowsBetween(-(long_buckets - 1), 0)
    g = F.col(good).cast("long")
    e = F.col(bad).cast("long")
    budget = F.lit(1.0) - F.lit(float(slo))

    def _ratio(w):
        tot = F.sum(g + e).over(w)
        return F.when(
            tot > 0, F.sum(e).over(w).cast("double") / tot.cast("double")
        )

    r_s, r_l = _ratio(w_s), _ratio(w_l)
    out = df.select(
        *df.columns,
        (r_s / budget).alias("burn_short"),
        (r_l / budget).alias("burn_long"),
        r_s.alias("bad_ratio_short"),
        r_l.alias("bad_ratio_long"),
    )
    if threshold is not None:
        thr = F.lit(float(threshold))
        out = out.withColumn(
            "alert",
            F.coalesce(
                (F.col("burn_short") > thr) & (F.col("burn_long") > thr),
                F.lit(False),
            ),
        )
    return out


def topk_summary_tier(
    df: DataFrame,
    k: int,
    value_col: str = "value",
    on: str = "ts",
    by: str = "hour",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Re-aggregatable top-k summary tier — the heavy-hitter companion to
    the HLL/KLL/histogram tiers, and the piece a retention engine needs
    to answer "top values last month" AFTER the raw hours are dropped.

    Per (series, bucket): exact counts per value, keep the k largest
    (ties broken by value ascending — fully deterministic, unlike
    SpaceSaving whose state depends on stream order), and fold what was
    dropped into two scalars that make the summary MERGEABLE WITH
    BOUNDS: ``other_weight`` (total dropped count) and ``other_max``
    (largest single dropped count — the most any unstored value can
    have occurred in this bucket). ``n_rows`` = total rows, so
    n_rows == sum(kept cnt) + other_weight exactly.

    Scale shape: one groupBy (bucket, value) with map-side partials,
    then the mad_outliers pattern — an ordered rank window and the
    unordered bucket stats share ONE Exchange; no join, no UDF. The
    shuffle carries (bucket, value) count partials, never raw rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = list(series_keys or [])
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *keys,
            F.date_trunc(by, F.col(on)).alias("bucket_ts"),
            F.col(value_col).alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wo = Window.partitionBy(*keys, "bucket_ts").orderBy(
        F.desc("cnt"), F.asc("value")
    )
    wb = Window.partitionBy(*keys, "bucket_ts")
    dropped = F.when(F.col("rank") > k, F.col("cnt"))
    return (
        counts.withColumn("rank", F.row_number().over(wo))
        .withColumn("n_rows", F.sum("cnt").over(wb))
        .withColumn(
            "other_weight",
            F.coalesce(F.sum(dropped).over(wb), F.lit(0)).cast("long"),
        )
        .withColumn(
            "other_max",
            F.coalesce(F.max(dropped).over(wb), F.lit(0)).cast("long"),
        )
        .filter(F.col("rank") <= k)
    )


def topk_summary_rollup(
    df: DataFrame,
    k: int,
    to: str = "day",
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Roll a ``topk_summary_tier`` up a grain (hour -> day/week/month)
    reading ONLY the summaries, with deterministic error bounds:

        lb  = sum of this value's stored counts (exact where stored)
        ub  = lb + sum(other_max) over the period's buckets where the
              value was NOT stored (it can hide at most other_max times
              in each — anything larger would have been kept)
        missing_ub = sum(other_max) over ALL buckets — the ceiling for
              a value stored NOWHERE; ``no_hidden_beats`` = lb >=
              missing_ub certifies no unstored value can have a
              STRICTLY larger period count than this row (at exact
              equality an unstored value could still tie and win the
              value-ascending tiebreak — use lb > missing_ub for the
              airtight rank certificate). ub == lb (exact) whenever the
              value was stored in every bucket it could hide in.

    Output: the ``k`` largest values per (series, period) by
    (lb desc, value asc) with lb/ub/missing_ub/hours_present/n_buckets.
    True period counts always lie in [lb, ub] (pinned in pytest).

    Scale shape: two small aggregations over summary rows (k' per
    bucket, never raw data) + a broadcast of the per-period bucket
    stats; one rank window. Retention can delete raw events and hour
    tiers and this still answers month-level top-k with guarantees.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = list(series_keys or [])
    d = F.date_trunc(to, F.col("bucket_ts"))
    per_bucket = (
        df.groupBy(*keys, "bucket_ts")
        .agg(F.min("other_max").alias("om"))
        .groupBy(*keys, d.alias("bucket_ts"))
        .agg(
            F.sum("om").alias("missing_ub"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )
    per_value = df.groupBy(*keys, d.alias("bucket_ts"), "value").agg(
        F.sum("cnt").alias("lb"),
        F.sum("other_max").alias("present_om"),
        F.count(F.lit(1)).alias("buckets_present"),
    )
    joined = per_value.join(
        F.broadcast(per_bucket), keys + ["bucket_ts"]
    ).select(
        *keys,
        "bucket_ts",
        "value",
        "lb",
        (F.col("lb") + F.col("missing_ub") - F.col("present_om"))
        .alias("ub"),
        "missing_ub",
        "buckets_present",
        "n_buckets",
        (F.col("lb") >= F.col("missing_ub")).alias("no_hidden_beats"),
    )
    wo = Window.partitionBy(*keys, "bucket_ts").orderBy(
        F.desc("lb"), F.asc("value")
    )
    return joined.withColumn("rank", F.row_number().over(wo)).filter(
        F.col("rank") <= k
    )
