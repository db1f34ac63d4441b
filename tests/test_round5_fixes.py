"""Round-5 hardening regression tests (VERDICT.md round-4 "next" items +
ADVICE round-4 findings):

  1. simhash_near_pairs: over-cap buckets never materialize a member
     array (row-wise star path); star edges are an explicit recall
     approximation under star_edges='filter' and unfiltered cluster-link
     hints under star_edges='link' (the non-transitivity fix).
  2. interval_join(how='left') surrogate-key join-back (test lives in
     test_timeseries.py).
  3. cusum_changepoints: single-observation series yields NULL statistics
     and false flags, never NaN.
  4. sample_by_source_temperature: NULL source fails fast; selected is
     never NULL.
  5. pack_documents: zero-token documents keep a consistent
     pack_first <= pack_last span (n_packs = 1 convention).
  6. funnel_stages / stream_sessionize: defensive per-user event cap so
     one pathological bot key cannot OOM a task.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from sentometrics_spark.textops import dedup

T0 = datetime(2024, 3, 1)


def _t(minutes):
    return T0 + timedelta(minutes=minutes)


# ----------------------------------------------------------- simhash stars


def test_simhash_star_recall_and_link_mode(spark, monkeypatch):
    """Hamming closeness is not transitive: members 2 and 3 are 4 bits
    from the keeper (1) but 0 bits from each other. With a crafted
    signature table (bits=8, bands=2) and cap=2, bucket (band0, chunk0)
    holds {1,2,3} and goes star. star_edges='filter' drops the far star
    edges (documented recall approximation); star_edges='link' emits them
    unfiltered as via_star cluster-link hints, so connected components
    still unite the whole degenerate bucket."""
    crafted = spark.createDataFrame(
        [(1, 0), (2, 240), (3, 240)], "doc_id long, simhash long"
    )
    monkeypatch.setattr(
        dedup, "simhash", lambda df, id_col, bits, hash_fn: crafted
    )
    docs = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                 "doc_id long, text string")
    filt = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_pairs(
            docs, max_hamming=3, bands=2, bits=8, max_bucket_size=2
        ).collect()
    )
    # pair (2,3) survives via its own small bucket; star edges (1,2),(1,3)
    # have hamming 4 > 3 and are dropped under 'filter'
    assert filt == [(2, 3, 0)]
    link = sorted(
        (r.id_a, r.id_b, r.hamming, r.via_star)
        for r in dedup.simhash_near_pairs(
            docs, max_hamming=3, bands=2, bits=8, max_bucket_size=2,
            star_edges="link",
        ).collect()
    )
    assert link == [(1, 2, 4, True), (1, 3, 4, True), (2, 3, 0, False)]
    comp = {
        r.node: r.component
        for r in dedup.connected_components(
            dedup.simhash_near_pairs(
                docs, max_hamming=3, bands=2, bits=8, max_bucket_size=2,
                star_edges="link",
            )
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1}
    with pytest.raises(ValueError, match="star_edges"):
        dedup.simhash_near_pairs(docs, star_edges="both")


def test_simhash_degenerate_bucket_row_bounded(spark):
    """A planted degenerate bucket (50 identical docs, cap=8) takes the
    row-wise star path: output is exactly the 49 keeper pairs at hamming 0
    in BOTH modes, and the small-branch collect_list sees zero rows — no
    single row ever holds the 50-member bucket."""
    docs = spark.createDataFrame(
        [(i, "common crawl boilerplate footer text") for i in range(50)],
        "doc_id long, text string",
    )
    out = dedup.simhash_near_pairs(docs, max_bucket_size=8).collect()
    assert sorted((r.id_a, r.id_b, r.hamming) for r in out) == [
        (0, i, 0) for i in range(1, 50)
    ]
    link = dedup.simhash_near_pairs(
        docs, max_bucket_size=8, star_edges="link"
    ).collect()
    assert sorted((r.id_a, r.id_b, r.hamming, r.via_star) for r in link) == [
        (0, i, 0, True) for i in range(1, 50)
    ]
    # uncapped: the same bucket expands all 50*49/2 pairs
    assert dedup.simhash_near_pairs(docs).count() == 1225


def test_simhash_planted_1e5_member_bucket(spark):
    """VERDICT r4 'done' criterion: a planted 10^5-member degenerate
    bucket. Every (band, chunk) bucket holds all 100k docs (identical
    text), far above the default cap of 256 — the old formulation built
    ONE collect_list row holding all 100k members (~tens of MB in a
    single aggregation buffer); the two-phase form emits the 99,999 star
    pairs row-wise and the small-branch collect_list sees zero rows, so
    the largest materialized row is a single pair."""
    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.lit("mass duplicated boilerplate page body").alias("text"),
    )
    out = dedup.simhash_near_pairs(docs, id_col="doc_id")
    assert out.count() == 99_999
    agg = out.agg(
        F.min("id_a"), F.max("id_a"), F.max("id_b"), F.max("hamming")
    ).collect()[0]
    # all star pairs anchor at the min-id keeper, hamming 0
    assert tuple(agg) == (0, 0, 99_999, 0)


# ------------------------------------------------------------ cusum n == 1


def test_cusum_single_observation_series_is_null_not_nan(spark):
    """ADVICE r4: n=1 gives sigma = sqrt(0/0) = NaN (Spark orders NaN
    greatest, so statistics silently read NaN while flags read false).
    Gate: NULL cusum columns, explicitly-false flags; n>=2 series in the
    same frame are untouched."""
    import math
    from sentometrics_spark.aggregate.timeseries import cusum_changepoints

    df = spark.createDataFrame(
        [("lonely", _t(0), 5.0),
         ("pair", _t(0), 1.0), ("pair", _t(1), 2.0)],
        "k string, ts timestamp, value double",
    )
    out = {
        (r.k, r.ts): r
        for r in cusum_changepoints(df, series_keys=["k"]).collect()
    }
    lone = out[("lonely", _t(0))]
    assert lone.cusum_up is None and lone.cusum_down is None
    assert lone.shift_up is False and lone.shift_down is False
    for key in [("pair", _t(0)), ("pair", _t(1))]:
        r = out[key]
        assert r.cusum_up is not None and not math.isnan(r.cusum_up)
        assert r.shift_up in (True, False)


# ------------------------------------------------------- sampling hardening


def test_sample_temperature_null_source_fails_fast(spark):
    from sentometrics_spark.textops.sampling import sample_by_source_temperature

    docs = spark.createDataFrame(
        [(1, "a", "t"), (2, None, "t")], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError, match="NULL 'source'"):
        sample_by_source_temperature(docs)


def test_sample_temperature_selected_never_null(spark):
    """A source without a fitted threshold (impossible in the single-pass
    API, possible if the selection expression is reused on new data) must
    read selected=false, not NULL."""
    from sentometrics_spark.textops.sampling import sample_by_source_temperature

    docs = spark.createDataFrame(
        [(i, "web", "t") for i in range(8)] + [(9, "books", "t")],
        "doc_id long, source string, text string",
    )
    out = sample_by_source_temperature(docs, tau=0.5, target_frac=0.5)
    assert out.filter(F.col("selected").isNull()).count() == 0
    # reuse the fitted expression on a frame with an unseen source
    unseen = out.sparkSession.createDataFrame(
        [(99, "unseen", "t")], "doc_id long, source string, text string"
    )
    # rebuild via union so the CASE falls through for 'unseen'
    both = docs.unionByName(unseen)
    got = sample_by_source_temperature(both, tau=0.5, target_frac=0.5)
    assert got.filter(F.col("selected").isNull()).count() == 0


def test_funnel_cap_drops_hot_key_and_overflow_reports(spark):
    """VERDICT r4: the per-user collect_list is the one per-key-scaling
    row in the funnel — a bot key must not OOM a task. Above the cap the
    user is dropped (not truncated: a truncated cascade would report a
    plausible-but-wrong stage) and funnel_overflow surfaces the key."""
    import re
    from sentometrics_spark.aggregate.timeseries import (
        funnel_overflow, funnel_stages,
    )

    rows = [(1, _t(0), "view"), (1, _t(1), "click"), (1, _t(2), "buy")]
    rows += [(2, _t(i), "view") for i in range(50)]   # the bot
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["view", "click", "buy"]

    capped = funnel_stages(ev, steps, max_events_per_user=10)
    # the opt-in guard is a count window riding the aggregation's OWN
    # (user) Exchange: still one shuffle, no join — the cost is the
    # per-partition sort the window needs (measured and documented; both
    # guard variants were benchmarked at 200M events and this one is the
    # cheaper). Inspect before execution finalizes the adaptive plan.
    p = capped._sc._jvm.PythonSQLUtils.explainString(
        capped._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"^\(\d+\) Exchange", p, flags=re.M)) == 1, p
    assert "Join" not in p, p
    # default (None): the original single-Exchange sort-free fold
    p0 = funnel_stages(ev, steps)
    p0s = p0._sc._jvm.PythonSQLUtils.explainString(
        p0._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"^\(\d+\) Exchange", p0s, flags=re.M)) == 1, p0s
    assert "Join" not in p0s, p0s
    assert not re.search(r"^\(\d+\) Sort", p0s, flags=re.M), p0s
    got = {r.user_id: r.stage for r in capped.collect()}
    assert got == {1: 3}                               # bot dropped
    over = funnel_overflow(ev, steps, max_events_per_user=10).collect()
    assert [(r.user_id, r.n_events) for r in over] == [(2, 50)]
    # cap disabled (or generous): bot folds normally at stage 1
    got_all = {r.user_id: r.stage
               for r in funnel_stages(ev, steps, max_events_per_user=None).collect()}
    assert got_all == {1: 3, 2: 1}
    assert got_all == {r.user_id: r.stage
                       for r in funnel_stages(ev, steps).collect()}
    with pytest.raises(ValueError, match="max_events_per_user"):
        funnel_stages(ev, steps, max_events_per_user=0)


def test_stream_sessionize_batch_cap_engages(spark, tmp_path):
    """One micro-batch with a 30-event hot key and cap=5 folds only the
    earliest 5 events (session start exact, drop logged executor-side)."""
    import pandas as pd
    from sentometrics_spark import streaming

    base = pd.Timestamp("2024-03-01")
    hot = pd.DataFrame({
        "user_id": [7] * 30,
        "ts": [base + pd.Timedelta(minutes=i) for i in range(30)],
        "value": [1.0] * 30,
    })
    sent = pd.DataFrame({"user_id": [999999],
                         "ts": [base + pd.Timedelta(days=30)],
                         "value": [0.0]})
    src = tmp_path / "cap_src"
    src.mkdir()
    kw = {"coerce_timestamps": "us", "allow_truncated_timestamps": True}
    hot.to_parquet(src / "f1.parquet", index=False, **kw)
    sent.to_parquet(src / "f2.parquet", index=False, **kw)
    stream = (
        spark.readStream.format("parquet")
        .schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out = streaming.stream_sessionize(
        stream, gap_min=30, max_events_per_user_batch=5
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cap_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cap_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.n_events, r.session_start, r.session_end)
        for r in spark.sql(
            "SELECT * FROM cap_sessions WHERE user_id = 7"
        ).collect()
    ]
    assert len(got) == 1
    n_events, s_start, s_end = got[0]
    assert n_events == 5
    assert s_start == base.to_pydatetime()
    assert s_end == (base + pd.Timedelta(minutes=4)).to_pydatetime()
    with pytest.raises(ValueError, match="max_events_per_user_batch"):
        streaming.stream_sessionize(stream, max_events_per_user_batch=0)


def test_pack_documents_zero_token_span_consistent(spark):
    """ADVICE r4: a zero-token document used to get pack_last < pack_first
    (n_packs = 0, pack_last = -1 at stream start). Convention: it touches
    exactly the pack its start offset falls in (n_packs = 1)."""
    from sentometrics_spark.textops.sampling import pack_documents

    docs = spark.createDataFrame(
        [(0, "s", ""), (1, "s", "a b c"), (2, "s", ""), (3, "s", "d e")],
        "doc_id long, source string, text string",
    )
    toks = F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), " "))
    )
    rows = {
        r.doc_id: r
        for r in pack_documents(docs, budget=4, tokens=toks).collect()
    }
    for r in rows.values():
        assert r.pack_first <= r.pack_last, r
        assert r.n_packs == r.pack_last - r.pack_first + 1 >= 1, r
    # zero-token doc at stream start: pack 0, not -1
    assert (rows[0].pack_first, rows[0].pack_last, rows[0].n_packs) == (0, 0, 1)
    # doc 1 spans tokens [0,3) of pack 0; doc 2 (zero tokens) sits at
    # offset 3 inside pack 0; doc 3 straddles packs 0-1
    assert (rows[2].pack_first, rows[2].pack_last) == (0, 0)
    assert (rows[3].pack_first, rows[3].pack_last, rows[3].n_packs) == (0, 1, 2)


# ------------------------------------------- aggregate_time join strategy


def test_aggregate_time_join_strategy_matches_window(spark):
    """The kernel-join formulation (bounded plan size for very large
    lags) is value-identical to the lag-column window form up to float
    summation order, and 'auto' dispatches to it past lag 512 — the plan
    then carries the broadcast position fan-out instead of an O(lag)
    expression tree (whose balanced-tree sum plans at any practical lag
    but costs ~12 s of driver-side analysis per 1000 lag positions)."""
    import numpy as np

    from sentometrics_spark.aggregate.time_agg import aggregate_time

    rng = np.random.default_rng(7)
    n = 40
    rows = [
        (datetime(2024, 1, 1) + timedelta(days=i), lx, ft, float(v))
        for lx in ("LA", "LB")
        for ft in ("f1",)
        for i, v in enumerate(rng.normal(size=n))
    ]
    panel = spark.createDataFrame(
        rows, "bucket_ts timestamp, lexicon string, feature string, value double"
    )
    kernels = {
        "lin": np.linspace(0.1, 1.0, 7),
        "exp": np.exp(-0.3 * np.arange(7))[::-1].copy(),
    }
    key = lambda r: (r["bucket_ts"], r["lexicon"], r["feature"], r["timeweight"])
    w = {key(r): r["value"] for r in aggregate_time(
        panel, kernels, 7, strategy="window").collect()}
    j = {key(r): r["value"] for r in aggregate_time(
        panel, kernels, 7, strategy="join").collect()}
    assert set(w) == set(j) and len(w) == 2 * 2 * (n - 7 + 1)
    for k in w:
        assert abs(w[k] - j[k]) < 1e-12, (k, w[k], j[k])

    # large lag: numpy oracle (the window form would spend O(lag)
    # driver-side plan analysis here; the join plan is flat)
    big = 600
    series = rng.normal(size=700)
    rows = [
        (datetime(2024, 1, 1) + timedelta(hours=i), "L", "f", float(v))
        for i, v in enumerate(series)
    ]
    panel2 = spark.createDataFrame(
        rows, "bucket_ts timestamp, lexicon string, feature string, value double"
    )
    ker = rng.uniform(size=big)
    out = aggregate_time(panel2, {"k": ker}, big, strategy="auto")
    import re as _re
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in p, p  # auto picked the join form
    got = {r["bucket_ts"]: r["value"] for r in out.collect()}
    assert len(got) == 700 - big + 1
    for t_idx in (big - 1, 650, 699):
        ts = datetime(2024, 1, 1) + timedelta(hours=t_idx)
        expect = float(np.dot(series[t_idx - big + 1: t_idx + 1], ker))
        assert abs(got[ts] - expect) < 1e-9 * max(1.0, abs(expect))


# ----------------------------------------- attributions_docs inline weights


def test_attributions_docs_inline_weights_match_stored(spark):
    """weights=None derives the realized doc weights inside the job (the
    doc_weights window rides the scoring rows' own shuffle) instead of
    joining a stored attribWeights$W table back on (url, bucket_ts,
    measure keys). Values must be identical for every how."""
    import numpy as np
    import pandas as pd

    from sentometrics_spark.aggregate.doc_agg import doc_weights
    from sentometrics_spark.aggregate.kernels import setup_time_weights
    from sentometrics_spark.aggregate.time_agg import measures_fill
    from sentometrics_spark.config import TimeKernelSpec
    from sentometrics_spark.model.attribution import attributions_docs, coef_df

    rng = np.random.default_rng(5)
    rows = [
        (f"u{i}", datetime(2024, 1, 1 + i % 9), lx, ft, float(rng.normal()),
         50 + (i % 7) * 10)
        for i in range(60)
        for lx in ("LA", "LB")
        for ft in ("f1",)
    ]
    sent = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, lexicon string, feature string, "
        "score double, word_count long",
    )
    agg = (
        sent.groupBy(F.date_trunc("day", "warc_ts").alias("bucket_ts"),
                     "lexicon", "feature")
        .agg(F.avg("score").alias("value"))
    )
    filled = measures_fill(agg, by="day", fill="zero")
    lag = 3
    kernels = setup_time_weights((TimeKernelSpec("linear"),), lag)
    coefs = pd.Series({
        f"{lx}--f1--{tw}": 0.2 + 0.1 * i
        for i, (lx, tw) in enumerate((lx, tw) for lx in ("LA", "LB") for tw in kernels)
    })
    cdf = coef_df(spark, coefs)
    for how in ("equal_weight", "proportional"):
        variants = {
            "stored": attributions_docs(
                sent, doc_weights(sent, by="day", how=how),
                filled, cdf, kernels, lag, "day",
            ),
            "inline": attributions_docs(
                sent, None, filled, cdf, kernels, lag, "day", how=how
            ),
            "general": attributions_docs(
                sent, None, filled, cdf, kernels, lag, "day", how=how,
                common_spine=False,
            ),
        }
        got = {
            name: {(r.pred_ts, r.url): r.attrib for r in df.collect()}
            for name, df in variants.items()
        }
        ref = got["stored"]
        for name in ("inline", "general"):
            assert set(ref) == set(got[name]), (how, name)
            for k in ref:
                assert abs(ref[k] - got[name][k]) < 1e-12, (how, name, k)


# -------------------------------------------------- span-level (substring) dedup


def test_repeated_spans_and_removal(spark):
    """ExactSubstr-style span dedup (Lee et al. arXiv:2107.06499): a
    boilerplate passage shared by two documents is flagged in BOTH as one
    merged span (overlapping n-gram positions fold via gaps-and-islands);
    within-document repetition flags the whole run; unique documents and
    sub-n documents emit nothing; removal keeps non-flagged tokens and
    single-space-rejoins."""
    from sentometrics_spark.textops.dedup import remove_repeated_spans, repeated_spans

    boiler = "all rights reserved contact us for licensing terms today"
    docs = spark.createDataFrame(
        [
            (1, "unique words alpha beta " + boiler + " gamma delta epsilon"),
            (2, "other prose here " + boiler + " trailing tail content"),
            (3, "totally unrelated text with no duplication at all present"),
            (4, "repeat me repeat me repeat me repeat me repeat me repeat me"),
            (5, "short doc"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    sp = repeated_spans(docs, n=5, min_repeats=2)
    got = sorted(tuple(r) for r in sp.collect())
    # boiler = 9 tokens -> 5 overlapping 5-gram positions merged into one
    # span of 9 tokens; doc 4's self-repetition covers all 12 tokens
    assert got == [(1, 4, 13), (2, 3, 12), (4, 0, 12)]
    out = {
        r.doc_id: (r.text_clean, r.n_removed_tokens)
        for r in remove_repeated_spans(docs, sp).collect()
    }
    assert out[1] == ("unique words alpha beta gamma delta epsilon", 9)
    assert out[2] == ("other prose here trailing tail content", 9)
    assert out[3] == ("totally unrelated text with no duplication at all present", 0)
    assert out[4] == ("", 12)
    assert out[5] == ("short doc", 0)
    # NULL text: as-if-absent — no spans, text_clean stays NULL, count 0
    assert out[6] == (None, 0)


# ------------------------------------------------- review-pass regressions


def test_remove_repeated_spans_preserves_case(spark):
    """Reconstruction must split the ORIGINAL text: gram matching
    lowercases, but token boundaries are case-independent, so span
    indices transfer and untouched documents keep their casing."""
    from sentometrics_spark.textops.dedup import remove_repeated_spans, repeated_spans

    boiler = "All Rights Reserved Contact Us"
    docs = spark.createDataFrame(
        [
            (1, "Alpha Beta " + boiler + " Gamma"),
            (2, "Delta Epsilon " + boiler.upper() + " Zeta"),
            (3, "Mixed Case Unique Text Entirely Here"),
        ],
        "doc_id long, text string",
    )
    sp = repeated_spans(docs, n=3, min_repeats=2)
    # matching is case-insensitive: boiler flags in both docs
    assert {r.doc_id for r in sp.collect()} == {1, 2}
    out = {r.doc_id: r.text_clean for r in remove_repeated_spans(docs, sp).collect()}
    assert out[1] == "Alpha Beta Gamma"
    assert out[2] == "Delta Epsilon Zeta"
    assert out[3] == "Mixed Case Unique Text Entirely Here"


def test_aggregate_time_join_null_window_matches_window_strategy(spark):
    """An all-NULL lag window yields 0.0 under BOTH strategies (the
    window form coalesces each lag slot; the join form coalesces the
    group sum). Partially-NULL windows agree structurally (skipped NULL
    term == zero term)."""
    from sentometrics_spark.aggregate.time_agg import aggregate_time

    rows = [
        (datetime(2024, 1, 1 + i), "L", "f", None if i < 4 else float(i))
        for i in range(8)
    ]
    panel = spark.createDataFrame(
        rows, "bucket_ts timestamp, lexicon string, feature string, value double"
    )
    kernels = {"k": __import__("numpy").linspace(1.0, 3.0, 3)}
    w = {r.bucket_ts: r.value for r in aggregate_time(
        panel, kernels, 3, strategy="window", check_lag=False).collect()}
    j = {r.bucket_ts: r.value for r in aggregate_time(
        panel, kernels, 3, strategy="join", check_lag=False).collect()}
    assert set(w) == set(j) and len(w) == 6
    # target at index 2: window entirely NULL -> 0.0 in both
    assert w[datetime(2024, 1, 3)] == 0.0 and j[datetime(2024, 1, 3)] == 0.0
    for k in w:
        assert abs(w[k] - j[k]) < 1e-12, (k, w[k], j[k])


def test_attributions_docs_common_spine_guard_fails_loudly(spark):
    """An irregular per-measure spine under the default fast path raises
    (executor-side assert) instead of silently mixing prediction dates;
    common_spine=False handles the same input."""
    import numpy as np
    import pandas as pd

    from sentometrics_spark.aggregate.kernels import setup_time_weights
    from sentometrics_spark.config import TimeKernelSpec
    from sentometrics_spark.model.attribution import attributions_docs, coef_df

    sent = spark.createDataFrame(
        [(f"u{i}", datetime(2024, 1, 1 + i % 6), "LA", "f1", 0.5, 10) for i in range(12)],
        "url string, warc_ts timestamp, lexicon string, feature string, score double, word_count long",
    )
    # measure LB's spine starts 2 days later -> rn->bucket_ts differs
    irregular = spark.createDataFrame(
        [(datetime(2024, 1, 1 + i), "LA", "f1", 0.1 * i) for i in range(6)]
        + [(datetime(2024, 1, 3 + i), "LB", "f1", 0.2 * i) for i in range(6)],
        "bucket_ts timestamp, lexicon string, feature string, value double",
    )
    lag = 2
    kernels = setup_time_weights((TimeKernelSpec("equal_weight"),), lag)
    cdf = coef_df(spark, pd.Series({
        f"{lx}--f1--{tw}": 0.3 for lx in ("LA", "LB") for tw in kernels
    }))
    bad = attributions_docs(sent, None, irregular, cdf, kernels, lag, "day")
    with pytest.raises(Exception, match="common_spine"):
        bad.collect()
    ok = attributions_docs(
        sent, None, irregular, cdf, kernels, lag, "day", common_spine=False
    )
    assert ok.count() > 0


def test_doc_weights_null_bucket_rows_survive(spark):
    """A NULL warc_ts (hence NULL bucket) row normalizes within its own
    NULL group instead of vanishing through the denominator join — the
    Window.partitionBy semantics the aggregate-and-broadcast form
    replaced."""
    from sentometrics_spark.aggregate.doc_agg import doc_weights

    sent = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1), "LA", "f1", 1.0, 5),
            ("b", datetime(2024, 1, 1), "LA", "f1", 2.0, 5),
            ("c", None, "LA", "f1", 3.0, 5),
            ("d", None, "LA", "f1", 4.0, 5),
        ],
        "url string, warc_ts timestamp, lexicon string, feature string, score double, word_count long",
    )
    w = {r.url: (r.bucket_ts, r.weight) for r in doc_weights(sent, by="day").collect()}
    assert set(w) == {"a", "b", "c", "d"}
    assert w["c"][0] is None and abs(w["c"][1] - 0.5) < 1e-12
    assert abs(w["a"][1] - 0.5) < 1e-12


def test_contaminated_spans_localizes_benchmark_leakage(spark):
    """Span-level decontamination: a training doc quoting a benchmark
    passage gets exactly that span flagged (case-insensitively) and
    surgically removable; train-only repetition is NOT contamination;
    benchmark docs themselves never appear in the output."""
    from sentometrics_spark.textops.dedup import (
        contaminated_spans,
        remove_repeated_spans,
    )

    eval_q = "what is the capital of france answer paris"
    bench = spark.createDataFrame(
        [(100, "benchmark item one " + eval_q)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "A blog post Quoting " + eval_q.upper() + " among other things"),
            (2, "clean training text with no leakage whatsoever in this document"),
            (3, "repeat repeat repeat repeat repeat repeat repeat repeat repeat"),
        ],
        "doc_id long, text string",
    )
    sp = contaminated_spans(train, bench, n=5)
    assert sorted(tuple(r) for r in sp.collect()) == [(1, 4, 12)]
    out = {r.doc_id: r.text_clean for r in remove_repeated_spans(train, sp).collect()}
    assert out[1] == "A blog post Quoting among other things"
    assert out[2] == "clean training text with no leakage whatsoever in this document"
    assert out[3] == "repeat repeat repeat repeat repeat repeat repeat repeat repeat"
