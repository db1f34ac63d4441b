"""Training-data composition operators: temperature-based domain mixing
(deterministic hash sampling toward per-source quotas) and sequence
packing (document streams chunked into fixed token-budget contexts).

Both are the "last mile" of a curation pipeline: after dedup and quality
gates, a pretraining run needs (a) a mixture over sources that tempers
the natural (zipfian) domain distribution — the multinomial
``p_s ∝ n_s^τ`` reweighting of Lample & Conneau (XLM, 2019) §3.1, also
used by mT5/CC100 — and (b) documents laid out into fixed-length training
contexts (the standard concat-then-chunk packing of GPT-style pipelines).

Scale shapes
------------
- ``sample_by_source_temperature``: per-source counts are a bounded
  groupBy (|sources| rows) collected once; the selection pass is pure
  map — a hash-threshold test against an inlined per-source CASE, no
  shuffle of the corpus, no Python. Deterministic in (seed, counts):
  re-running selects the identical subset, so the op is safe to re-execute
  in a retried stage (idempotent sampling — rand() would not be).
- ``pack_documents``: one window pass per (source, shard) stream —
  cumulative token offsets, then pure arithmetic for pack ids. ``shards``
  splits a giant source into independent packing streams so no single
  window partition holds a whole domain at 10^12 docs; each stream's
  layout stays deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sentometrics_spark.textops.dedup import hash64
from sentometrics_spark.textops.textstats import token_count

__all__ = [
    "temperature_rates",
    "sample_by_source_temperature",
    "pack_documents",
    "split_train_val_test",
    "vocab_top",
    "cap_per_group",
]

_HASH_MOD = 1 << 20


def temperature_rates(
    counts: dict[str, int], tau: float, target_frac: float
) -> dict[str, int]:
    """Per-source integer hash thresholds (out of 2^20) implementing
    temperature sampling: source weight w_s = n_s^τ / Σ n_s^τ, desired
    draw k_s = target_frac·N·w_s, per-document keep rate min(1, k_s/n_s).

    τ=1 keeps the natural distribution, τ→0 flattens toward uniform over
    sources; τ<1 upsamples (relatively) the tail domains exactly as in
    XLM §3.1. The Σ is a left fold over lexicographically sorted sources
    and the rate→threshold map uses the engine's tie-stable rounding, so
    an independent SQL oracle reproduces the thresholds bit-for-bit
    (sums of a handful of doubles can differ by an ulp across engines;
    the 1e-9 nudge moves the cliff off those ties)."""
    if not 0.0 < target_frac <= 1.0:
        raise ValueError("target_frac must be in (0, 1]")
    srcs = sorted(counts)
    pw = {s: math.pow(float(counts[s]), tau) for s in srcs}
    tot_w = 0.0
    for s in srcs:  # fixed fold order — see docstring
        tot_w += pw[s]
    n_total = sum(counts.values())
    out = {}
    for s in srcs:
        k = target_frac * n_total * (pw[s] / tot_w)
        rate = min(1.0, k / counts[s])
        out[s] = int(math.floor(rate * _HASH_MOD + 0.5 + 1e-9))
    return out


def sample_by_source_temperature(
    docs: DataFrame,
    tau: float = 0.5,
    target_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Adds a deterministic ``selected`` flag realizing a temperature-τ
    mixture over sources at ~``target_frac`` of the corpus: doc kept iff
    hash(source:doc_id) mod 2^20 falls under its source's threshold.
    Expected per-source draw matches the τ-tempered multinomial up to the
    min(1,·) cap (a source too small for its tempered share is kept
    whole — the remainder is NOT redistributed, matching the standard
    single-pass implementation).

    hash_fn='md5' makes the per-document decision replayable in DuckDB."""
    counts = {
        r[source_col]: r["n"]
        for r in docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # fail fast on NULL sources: they have no tempered quota (and None vs
    # str is unorderable in the sorted threshold fold) — the caller must
    # impute a bucket (e.g. coalesce to 'unknown') before mixing
    if None in counts:
        raise ValueError(
            f"{counts[None]} document(s) have NULL {source_col!r}; "
            "temperature mixing needs every document in a source bucket — "
            "impute one (e.g. coalesce to 'unknown') first"
        )
    thresholds = temperature_rates(counts, tau, target_frac)
    thr: Column = F.lit(None).cast("long")
    for s, t in thresholds.items():
        thr = F.when(F.col(source_col) == s, F.lit(t)).otherwise(thr)
    h = F.pmod(
        hash64(
            F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string")),
            seed=seed,
            hash_fn=hash_fn,
        ),
        F.lit(_HASH_MOD),
    )
    # a source unseen at fit time has no threshold: NOT selected (false),
    # never a NULL flag a downstream filter would silently drop
    return docs.withColumn("selected", F.coalesce(h < thr, F.lit(False)))


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 1,
    tokens: Column | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each (source, shard)
    stream, documents ordered by id form one token stream chunked into
    packs of ``budget`` tokens; a document occupies the half-open token
    interval [start_offset, start_offset + n_tokens) of its stream and
    may straddle packs (GPT-style packing splits it across contexts —
    pack_first/pack_last report the span, n_packs = how many contexts
    touch it).

    All outputs are integers derived from one cumulative-sum window, so
    the layout is exactly reproducible (and exactly SQL-oracle-able).
    ``shards`` deterministically splits a source into ``doc_id % shards``
    independent streams — the skew valve for domains too large for one
    sorted window partition."""
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    ntok = (tokens if tokens is not None else token_count(text_col)).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(shards)).cast("int")
    w = (
        Window.partitionBy(source_col, shard)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(ntok).over(w)
    start = (cum - ntok).alias("start_offset")
    first = F.floor((cum - ntok) / budget).cast("long")
    # a zero-token document has an empty interval: floor((cum-1)/budget)
    # would put pack_last BEFORE pack_first (and at -1 at stream start) —
    # clamp to the n_packs = 1 convention (it "touches" the pack its
    # start offset falls in) so pack_first <= pack_last always holds
    last = F.greatest(first, F.floor((cum - 1) / budget).cast("long"))
    return docs.select(
        F.col(id_col),
        F.col(source_col),
        shard.alias("shard"),
        ntok.alias("n_tokens"),
        start,
        first.alias("pack_first"),
        last.alias("pack_last"),
    ).withColumn("n_packs", F.col("pack_last") - F.col("pack_first") + F.lit(1))


def split_train_val_test(
    docs: DataFrame,
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 13,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test assignment: each document's uniform
    draw is hash(source:doc_id) mod 2^20, split against integer
    thresholds — so the assignment is a pure function of identity, stable
    across runs, retries, and corpus growth (a new snapshot's documents
    never move existing ones between splits, the property that keeps a
    held-out set honest over time). Hash uniformity within every source
    stratifies the proportions per domain for free.

    hash_fn='md5' makes every assignment replayable in DuckDB."""
    f1, f2, f3 = fractions
    if min(fractions) < 0 or abs(f1 + f2 + f3 - 1.0) > 1e-9:
        raise ValueError("fractions must be non-negative and sum to 1")
    t1 = int(math.floor(f1 * _HASH_MOD + 0.5 + 1e-9))
    t2 = int(math.floor((f1 + f2) * _HASH_MOD + 0.5 + 1e-9))
    h = F.pmod(
        hash64(
            F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string")),
            seed=seed,
            hash_fn=hash_fn,
        ),
        F.lit(_HASH_MOD),
    )
    return docs.withColumn(
        "split",
        F.when(h < t1, F.lit("train"))
        .when(h < t2, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def vocab_top(
    docs: DataFrame,
    v: int = 50_000,
    text_col: str = "text",
) -> DataFrame:
    """Top-V vocabulary with counts and deterministic ranks (count desc,
    token asc on ties) — the vocab-fitting step for the hashed-LM /
    tokenizer-training paths.

    Scale shape: explode → groupBy(token) is SAFE on the zipfian token
    key — unlike a token-keyed JOIN (the round-3 lm_cross_entropy
    finding), hash aggregation does map-side partial combine, so "the"
    arrives at the shuffle as one partial row per task, not 5% of all
    rows. The top-V cut is orderBy().limit(V): Spark plans TakeOrdered —
    per-partition partial top-V + driver merge, O(V) driver memory, no
    global sort. The rank window then runs over only V rows."""
    if v <= 0:
        raise ValueError("v must be positive")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(v)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w))


def cap_per_group(
    docs: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 13,
    hash_fn: str = "xxhash64",
    prefilter: bool = False,
) -> DataFrame:
    """Deterministic per-group cap — keep at most ``cap`` documents per
    group (domain, source, language): the anti-monoculture gate every
    web-corpus mix applies so one mass-crawled host cannot dominate the
    training distribution (C4 and Gopher both cap per-domain
    contributions). Selection is a pure function of identity — each
    kept set is the ``cap`` documents with the smallest
    hash(seed:group:id), so re-runs, retries, and REORDERED inputs keep
    exactly the same documents, and growing the corpus only ever evicts
    by hash rank, never reshuffles survivors arbitrarily.

    Scale shape: one hash shuffle on the group key; the per-group work is
    a rank over hash order (uniform random permutation within the group,
    so the cap is an unbiased uniform sample of the group). Hot domains
    ARE the skewed key here — at Common-Crawl scale pre-filter with an
    approximate per-group count and only rank groups that exceed the cap
    (the ``prefilter`` flag), which turns the skewed sort into a
    broadcast-filtered one over the minority of over-cap groups.

    hash_fn='md5' makes the kept set replayable in DuckDB."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    h = hash64(
        F.concat_ws(":", F.col(group_col), F.col(id_col).cast("string")),
        seed=seed,
        hash_fn=hash_fn,
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    if not prefilter:
        return (
            docs.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= cap)
            .drop("__rk")
        )
    over = (
        docs.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__gn"))
        .filter(F.col("__gn") > cap)
        .select(F.col(group_col).alias("__og"))
    )
    # under-cap groups pass through untouched (no sort, no shuffle beyond
    # the count); only the over-cap minority pays the per-group rank.
    # eqNullSafe so a NULL group is capped identically in both paths
    flagged = docs.join(
        F.broadcast(over.withColumn("__over", F.lit(True))),
        F.col(group_col).eqNullSafe(F.col("__og")),
        "left",
    ).drop("__og")
    keep_small = flagged.filter(F.col("__over").isNull()).drop("__over")
    capped = (
        flagged.filter(F.col("__over").isNotNull())
        .drop("__over")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
    return keep_small.unionByName(capped)
