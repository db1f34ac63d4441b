"""Deduplication operators for a large-scale training-data pipeline.

All pure-Catalyst except the hash math, which uses built-in xxhash64/crc32 —
no Python in any hot path. Designed so every stage is a hash-partitioned
shuffle on a bounded key (band bucket / simhash band), never an O(n^2)
crossJoin:

  - exact_duplicates:   groupBy(hash(text))
  - ngram_jaccard_pairs: shingle -> explode -> self-join on shingle ->
                         count/union (candidate pre-filter by shared-shingle
                         count keeps the join sparse)
  - minhash_lsh:        k minhashes via xxhash64(shingle, seed) minima ->
                        band signatures -> groupBy(band, signature) buckets
  - simhash:            64-bit simhash from token hashes -> band split ->
                        bucket join for near pairs
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tokens(col: str = "text"):
    return F.split(F.lower(F.col(col)), " ")


def hash64(col, seed: int | None = None, hash_fn: str = "xxhash64") -> Column:
    """64-bit-ish hash of a string column.

    - "xxhash64": Spark's built-in (production default — fastest, JVM-side).
    - "md5": first 60 bits of md5 as a bigint. Slower, but DuckDB computes
      the identical value (md5 + hex parse), which turns every hash-based
      dedup operator into a bit-exact DuckDB-oracle query; the pipeline
      shape (shingle -> min-agg -> band -> bucket join) is unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    if hash_fn == "xxhash64":
        return F.xxhash64(c, F.lit(seed)) if seed is not None else F.xxhash64(c)
    if hash_fn == "md5":
        if seed is not None:
            c = F.concat_ws(":", F.lit(str(seed)), c)
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn: {hash_fn}")


# DuckDB expression computing the same value as hash64(..., hash_fn="md5"):
# parse the first 15 hex chars of md5 into a BIGINT.
DUCK_HX = (
    "list_reduce(list_transform(string_split_regex(substr(md5({e}), 1, 15), ''),"
    " c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"
)


def duck_hx(expr: str) -> str:
    return DUCK_HX.format(e=expr)


def shingles(df: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (long form)."""
    toks = _tokens()
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return df.select(id_col, F.explode(F.array_distinct(sh)).alias("shingle"))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact-dup groups by text hash; keep_id = min id."""
    return (
        df.groupBy(F.xxhash64("text").alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("group_size"),
            F.collect_list(id_col).alias("members"),
        )
        .filter(F.col("group_size") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing >= 1
    shingle. |A ∩ B| from the shingle self-join; |A ∪ B| = |A|+|B|-∩.

    max_shingle_df caps the document frequency of shingles entering the
    self-join: one hot shingle ("click here to") appearing in d documents
    would otherwise create O(d^2) candidate rows — quadratic blow-up at
    corpus scale. Dropping high-df shingles is standard practice and keeps
    the join sparse; it only LOWERS n_inter for pairs sharing boilerplate,
    never invents a pair. |A|/|B| denominators still count all shingles, so
    reported jaccard is a lower bound for pairs touched by hot shingles and
    exact otherwise (near-dup pairs share mostly low-df shingles)."""
    sh = shingles(df, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


MINHASH_P = (1 << 31) - 1  # Mersenne prime for the affine permutation family


def minhash_perm_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal-hash permutations
    mh_i = (a_i * h32 + b_i) mod (2^31 - 1). Shared by the engine and the
    DuckDB oracle (which inlines them as literals)."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P)) for _ in range(k)]


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", n: int = 3, k: int = 32,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """k-permutation MinHash signature per doc: ONE string hash per
    shingle, then k affine permutations (a_i*h32 + b_i) mod p of its low 32
    bits — the standard trick that replaces k string hashes with k
    multiply-adds. With a < MINHASH_P < 2^31 and h32 < 2^32 the product
    stays just under 2^63 (~2^63 - 2^33), so it fits signed 64-bit with no
    overflow — but only because MINHASH_P is a 31-bit prime; a larger
    modulus would silently wrap.

    MAP-ONLY: one ``aggregate`` over each row's shingle-hash array carries
    all k running minima (k-slot accumulator, same shape as the simhash
    rewrite) — no shingle explode, no groupBy(doc) shuffle. At sf0.1x40
    that shuffle was 40M rows; now the only shuffle in the LSH pipeline is
    the bounded (band, signature) bucket groupBy.

    PERF NOTE (measured, PLANS.md round 3): higher-order functions are
    CodegenFallback — the expression is interpreted and NOT shared across
    output columns, so anything that references the signature k times
    (like this function's own k-column unnest) pays k evaluations.
    Consumers that need derived values should compute them INSIDE the
    aggregate's ``finish`` lambda (one evaluation per row), which is
    exactly what minhash_lsh_buckets does via _minhash_agg_expr."""
    sig, toks = _minhash_agg_expr(n, k, hash_fn)
    out = df.filter(F.size(toks) > 0).select(id_col, sig.alias("__sig"))
    return out.select(
        id_col, *[F.get("__sig", i).alias(f"mh_{i}") for i in range(k)]
    )


def _minhash_agg_expr(n: int, k: int, hash_fn: str, finish=None):
    """(signature Column over 'text', token-array Column). finish, when
    given, maps the final k-min accumulator to the expression output in
    ONE evaluation (see minhash_signatures PERF NOTE)."""
    toks = _tokens()
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    h32 = F.transform(
        sh, lambda s: hash64(s, hash_fn=hash_fn).bitwiseAND(F.lit(0xFFFFFFFF))
    )
    coeffs = minhash_perm_coeffs(k)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    kwargs = {} if finish is None else {"finish": finish}
    sig = F.aggregate(
        h32,
        F.array_repeat(F.lit(MINHASH_P).cast("long"), k),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda m, i: F.least(
                m, (F.get(a_arr, i) * h + F.get(b_arr, i)) % F.lit(MINHASH_P)
            ),
        ),
        **kwargs,
    )
    return sig, toks


def _minhash_banded_arrow(
    df: DataFrame, id_col: str, n: int, k: int, bands: int
) -> DataFrame:
    """Arrow/numpy banding kernel (production fast path): one mapInPandas
    pass emits (id, band, sig) rows. Tokens are dictionary-encoded C-side
    so only the UNIQUE vocabulary is hashed (pandas siphash); shingle
    hashes are a vectorized uint64 mix of the n consecutive token hashes;
    the k affine permutations and per-doc minima are numpy
    (minimum.reduceat over doc offsets). Statistically identical MinHash
    to the expression path — exact duplicates collide on every band, and
    near-dup collision probabilities are the standard banding curve — but
    hash VALUES differ (mix64 of token hashes, not xxhash64 of shingle
    strings), so the DuckDB-reproducible md5 variant keeps the expression
    path."""
    import pandas as pd

    rows = k // bands
    coeffs = minhash_perm_coeffs(k)
    a_np = np.array([c[0] for c in coeffs], dtype=np.uint64)
    b_np = np.array([c[1] for c in coeffs], dtype=np.uint64)
    p_u64 = np.uint64(MINHASH_P)
    id_type = dict(zip(df.columns, (f.dataType.simpleString() for f in df.schema)))[
        id_col
    ]
    out_schema = f"{id_col} {id_type}, band int, sig long"
    C1 = np.uint64(0x9E3779B97F4A7C15)
    C2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            # null-text docs carry no signature (parity with the
            # expression path, which filters them out)
            pdf = pdf[pdf["text"].notna()]
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            arr = pa.Array.from_pandas(pdf["text"].astype(str))
            toks = pc.split_pattern(pc.utf8_lower(arr), " ")
            flat = pc.list_flatten(toks)
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            lens = np.asarray(lens, dtype=np.int64)
            dic = flat.dictionary_encode()
            idx = np.asarray(dic.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
            vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
            th = pd.util.hash_array(vocab).astype(np.uint64)[idx]

            with np.errstate(over="ignore"):
                # shingle mix over n consecutive token hashes (uint64 wrap)
                n_sh = np.maximum(lens - (n - 1), 1)
                offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
                sh_offs = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
                total = int(n_sh.sum())
                sh = np.zeros(total, dtype=np.uint64)
                # positions of each shingle start in the flat token array
                starts = (
                    np.arange(total, dtype=np.int64)
                    - sh_offs.repeat(n_sh)
                    + offs.repeat(n_sh)
                )
                doc_len = lens.repeat(n_sh)
                acc = np.zeros(total, dtype=np.uint64)
                doc_end = offs.repeat(n_sh) + np.maximum(doc_len - 1, 0)
                for j in range(n):
                    # a short doc's single shingle chains over its EXISTING
                    # tokens only — positions past the doc are masked out,
                    # never re-mixed, so a shingle hash depends on shingle
                    # content alone (required for cross-doc MinHash)
                    pos = starts + j
                    valid = pos <= doc_end
                    safe = np.minimum(pos, doc_end)
                    mixed = (acc * C1) ^ (th[safe] + C2)
                    acc = np.where(valid, mixed, acc)
                sh = acc
                h32 = sh & np.uint64(0xFFFFFFFF)

                # k affine permutations, per-doc minima. NOTE (round 6,
                # measured): numpy's uint64 `%` by a scalar outperforms an
                # exact Mersenne shift-fold reduction 3.3x here (77 vs
                # 255 ms per 450k-token batch) — the fold's five vectorized
                # temporaries cost more than the optimized scalar-divisor
                # mod. Keep the plain `%`.
                mins = np.empty((len(ids), k), dtype=np.uint64)
                red = sh_offs
                for j in range(k):
                    perm = (a_np[j] * h32 + b_np[j]) % p_u64
                    mins[:, j] = np.minimum.reduceat(perm, red)
                # empty-text docs (lens==0 after split never happens: split
                # of "" is [""]), so every doc has >= 1 shingle

                # band signatures: mix the band's mins
                out_ids = np.repeat(ids, bands)
                out_band = np.tile(np.arange(bands, dtype=np.int32), len(ids))
                bsig = np.zeros((len(ids), bands), dtype=np.uint64)
                for b in range(bands):
                    acc2 = np.zeros(len(ids), dtype=np.uint64)
                    for r in range(rows):
                        acc2 = (acc2 * C1) ^ (mins[:, b * rows + r] + C2)
                    bsig[:, b] = acc2
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    "band": out_band,
                    "sig": bsig.reshape(-1).astype(np.int64),
                }
            )

    return df.select(id_col, "text").mapInPandas(gen, out_schema)


def minhash_lsh_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """LSH banding: split the k-minhash signature into ``bands`` bands of
    k/bands rows; docs sharing any (band, band-signature) land in one
    bucket. Returns buckets with >= 2 members (near-dup candidates).
    Shuffle key is (band, signature) — bounded and well-distributed.

    Two banding kernels, same bucket statistics:
      - hash_fn="xxhash64" (production): Arrow/numpy mapInPandas kernel —
        the whole signature math runs vectorized C-side (~4x the
        interpreted Catalyst expression);
      - hash_fn="md5": pure-expression path whose every value DuckDB
        reproduces bit-exactly (the driver-oracle variant)."""
    if k % bands:
        raise ValueError("k must be divisible by bands")
    rows = k // bands

    if hash_fn == "xxhash64":
        exploded = _minhash_banded_arrow(df, id_col, n, k, bands)
    else:
        # band hashes computed inside the aggregate's FINISH lambda: the
        # heavy interpreted signature expression runs exactly once per
        # row; only the tiny array<struct<band,sig>> leaves it (see
        # minhash_signatures PERF NOTE — unnesting k columns first would
        # pay k interpreted evaluations)
        def band_array(acc: Column) -> Column:
            items = []
            for b in range(bands):
                cols = [F.get(acc, b * rows + r) for r in range(rows)]
                # md5 variant: hash the '|'-joined signature row (same
                # string DuckDB builds with string_agg(mh, '|'))
                s = hash64(
                    F.concat_ws("|", *[c.cast("string") for c in cols]),
                    hash_fn="md5",
                )
                items.append(F.struct(F.lit(b).alias("band"), s.alias("sig")))
            return F.array(*items)

        bands_expr, toks = _minhash_agg_expr(n, k, hash_fn, finish=band_array)
        exploded = (
            df.filter(F.size(toks) > 0)
            .select(id_col, F.explode(bands_expr).alias("bs"))
            .select(
                id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
            )
        )
    return (
        exploded.groupBy("band", "sig")
        .agg(
            F.count("*").alias("bucket_size"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("bucket_size") > 1)
    )


def dedup_incremental(
    new_df: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Cross-snapshot exact dedup — the incremental form of
    ``exact_duplicates`` for a rolling crawl: classify each incoming
    document against a HISTORICAL fingerprint store ``seen`` (a DataFrame
    with one ``content_hash`` column, e.g. the persisted hashes of every
    previously kept snapshot) and against its own batch.

    status per row:
      'new'          first occurrence of this content anywhere;
      'dup_history'  the hash is already in the store;
      'dup_batch'    another doc in the SAME batch with a smaller id is
                     the keeper.

    Scale shape: one groupBy(content_hash) over the batch only and one
    left join against the store on its hash key — the history is touched
    only through that join (on Iceberg, a bucketed/bloom-indexed key),
    never rescanned, so cost is O(batch), not O(history). The output is
    the store's next delta: append rows with status='new'."""
    batch = new_df.select(
        F.col(id_col), hash64(F.col(text_col), hash_fn=hash_fn).alias("content_hash")
    )
    firsts = batch.groupBy("content_hash").agg(F.min(id_col).alias("first_id"))
    seen_d = (
        seen.select("content_hash").distinct().withColumn("in_hist", F.lit(True))
    )
    return (
        batch.join(firsts, "content_hash")
        .join(seen_d, "content_hash", "left")
        .select(
            id_col,
            "content_hash",
            F.when(F.col("in_hist").isNotNull(), F.lit("dup_history"))
            .when(F.col(id_col) != F.col("first_id"), F.lit("dup_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


def minhash_dedup_candidates(
    df: DataFrame, id_col: str = "doc_id", n: int = 3, k: int = 32, bands: int = 8,
    hash_fn: str = "xxhash64", max_bucket_size: int = 256,
) -> DataFrame:
    """Distinct candidate near-dup pairs from LSH buckets.

    Buckets up to ``max_bucket_size`` emit all O(m²) within-bucket pairs.
    DEGENERATE buckets (boilerplate pages sharing a band signature — m can
    be 10⁵⁺ at crawl scale) are capped: they emit only (keep_id, member)
    star pairs, O(m) rows, which still link every member into the same
    connected component for the downstream keep-one resolution. Without the
    cap a single hot bucket materializes m² rows and dominates the job."""
    buckets = minhash_lsh_buckets(df, id_col, n, k, bands, hash_fn=hash_fn)
    all_pairs = F.filter(
        F.flatten(
            F.transform(
                "members",
                lambda x: F.transform(
                    "members", lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))
                ),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    # keep_id == min(members), so (keep_id, member) is already ordered.
    # ONE conditional expression over each bucket row (a filter+union of
    # small/big branches would re-compute the whole signature+bucket
    # subtree per branch — two scans, two Exchanges)
    star_pairs = F.transform(
        F.filter("members", lambda m: m != F.col("keep_id")),
        lambda m: F.struct(F.col("keep_id").alias("id_a"), m.alias("id_b")),
    )
    pairs = F.when(F.col("bucket_size") <= max_bucket_size, all_pairs).otherwise(
        star_pairs
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Pile procedure,
    public): flag every training document that shares ANY word ``n``-gram
    with an evaluation benchmark, so eval examples can be excluded from
    the training set. Returns one row per training doc:
    (id, n_shared_ngrams, contaminated).

    Scale shape: the benchmark's distinct n-gram hashes are a SMALL set
    (benchmarks are thousands of examples, not billions) — broadcast;
    training docs explode to distinct gram hashes and hash-join the
    broadcast, one groupBy(doc) for the hit count, then a left join back
    onto the doc spine for the zero rows. O(training tokens), no shuffle
    keyed on anything benchmark-sized."""
    toks = _tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: hash64(
            F.concat_ws(" ", F.slice(toks, i + 1, n)), hash_fn=hash_fn
        ),
    )
    bench_grams = (
        benchmark.select(F.explode(F.array_distinct(grams)).alias("h")).distinct()
    )
    doc_grams = df.select(id_col, F.explode(F.array_distinct(grams)).alias("h"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    min_len: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact-substring duplicate spans (the token-level analogue of
    suffix-array dedup for training corpora, cf. Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"): a token
    run is flagged when its ``min_len``-gram occurs more than once in the
    corpus (in another document or elsewhere in the same one). Overlapping
    flagged k-gram starts merge into maximal intervals; returns one row per
    maximal duplicated span: (id, start_pos, end_pos) in token positions,
    end exclusive.

    Scale shape: explode to (doc, pos, k-gram hash) ONCE (Arrow kernel on
    the production hash path — see _gram_positions); one hash Exchange on
    the gram hash feeds a window count that flags duplicated grams in
    place (the former groupBy + left_semi re-generated the gram table for
    the probe side and paid a sort-merge join on top — guide §2.4);
    per-doc gap-and-island window merge. No suffix array, no self-join,
    shuffle keys are hash then doc."""
    from pyspark.sql.window import Window

    g = _gram_positions(df, id_col, "text", min_len, hash_fn).withColumnRenamed(
        "g", "h"
    )
    wc = Window.partitionBy("h")
    flagged = (
        g.withColumn("__c", F.count(F.lit(1)).over(wc))
        .filter(F.col("__c") > 1)
        .select(id_col, "pos")
    )
    # gap-and-island: two flagged k-gram starts p < q produce overlapping
    # (or touching) spans iff q - p <= min_len, so a new island begins
    # whenever the gap exceeds min_len
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > min_len, F.lit(1)
    ).otherwise(F.lit(0))
    islands = flagged.withColumn(
        "grp",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + min_len).alias("end_pos"),
        )
        .drop("grp")
        .select(id_col, "start_pos", "end_pos")
    )


def _simhash_arrow(df: DataFrame, id_col: str, bits: int) -> DataFrame:
    """Arrow/numpy SimHash kernel (production fast path, same doctrine as
    _minhash_banded_arrow): tokens dictionary-encoded C-side, only the
    unique vocabulary hashed, per-doc bit votes via add.reduceat over doc
    offsets. Hash family differs from the expression path (statistically
    equivalent signatures; exact duplicates still collide at hamming 0)."""
    import pandas as pd

    id_type = dict(zip(df.columns, (f.dataType.simpleString() for f in df.schema)))[
        id_col
    ]
    out_schema = f"{id_col} {id_type}, simhash long"

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            pdf = pdf[pdf["text"].notna()]
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            arr = pa.Array.from_pandas(pdf["text"].astype(str))
            toks = pc.split_pattern(pc.utf8_lower(arr), " ")
            flat = pc.list_flatten(toks)
            lens = np.asarray(
                pc.list_value_length(toks).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            dic = flat.dictionary_encode()
            idx = np.asarray(dic.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
            vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
            th = pd.util.hash_array(vocab).astype(np.uint64)[idx]
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            lens_u = lens.astype(np.uint64)
            sig = np.zeros(len(ids), dtype=np.uint64)
            one = np.uint64(1)
            two = np.uint64(2)
            # per-bit pass kept 1D/uint64 end to end: the +1/-1 vote sign
            # is equivalent to 2*count_of_ones > n_tokens, so the
            # int64 cast + affine transform the old loop streamed per bit
            # are gone (measured 2.2x on the isolated kernel; 2D-reduceat
            # and cumsum formulations both measured SLOWER than this loop
            # — reduceat only vectorizes on contiguous 1D input)
            for b in range(bits):
                ones = np.add.reduceat((th >> np.uint64(b)) & one, offs)
                sig |= ((ones * two) > lens_u).astype(np.uint64) << np.uint64(b)
            yield pd.DataFrame({id_col: ids, "simhash": sig.astype(np.int64)})

    return df.select(id_col, "text").mapInPandas(gen, out_schema)


def simhash(
    df: DataFrame, id_col: str = "doc_id", bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per doc: sign-sum of token-hash bits, weighted by term
    frequency. Single map-only pass — per row, one codegen'd
    ``aggregate`` over the token-hash array builds all ``bits``
    accumulator slots (a +1/-1 vote per occurrence sums to exactly the
    tf-weighted vote per distinct term), then the sign vector packs into
    one bigint. NO explode, NO shuffle: the previous formulation blew each
    (doc, distinct token) into 64 bit-rows and paid two hash shuffles for
    what is a per-document reduction. 64 bits with xxhash64; pass bits=60
    with hash_fn="md5" (the md5-derived hash carries 60 usable bits).

    hash_fn="xxhash64" (production) dispatches to the Arrow/numpy kernel
    (_simhash_arrow — vectorized C-side, different hash family, same
    collision statistics); "md5" keeps this expression path, every value
    of which DuckDB reproduces bit-exactly for the driver oracle."""
    if hash_fn == "xxhash64":
        return _simhash_arrow(df, id_col, bits)
    toks = _tokens()
    hashes = F.transform(toks, lambda t: hash64(t, hash_fn=hash_fn))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda a, b: a
            + F.when(
                F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s.bitwiseOR(x),
    )
    # null-text docs carried no rows through the old explode and must stay
    # absent here too (size(null) is null => filtered)
    return df.filter(F.size(toks) > 0).select(id_col, packed.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bands: int = 4,
    bits: int = 64, hash_fn: str = "xxhash64", max_bucket_size: int = 256,
    star_edges: str = "filter",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the hash into ``bands`` chunks
    (pigeonhole: hamming <= bands-1 guarantees a shared band), bucket the
    banded table by (band, chunk), expand within-bucket pairs, then exact
    popcount filter.

    Degenerate buckets are capped, mirroring ``minhash_dedup_candidates``:
    a mass-duplicated boilerplate page can put m ~ 10^5 docs into one
    (band, chunk) bucket, and an uncapped expansion materializes O(m^2)
    rows and dominates the job. Buckets up to ``max_bucket_size`` emit all
    within-bucket pairs (exact); bigger buckets emit only
    (keep_id=min(id), member) star pairs — O(m) rows. The star reduction
    is a RECALL APPROXIMATION, not an equivalence: Hamming closeness is
    not transitive, so two members each > ``max_hamming`` bits from the
    keeper but <= ``max_hamming`` from each other lose their pair under
    the default ``star_edges='filter'``. For keep-one dedup feed
    ``star_edges='link'`` into :func:`connected_components` instead: star
    edges then BYPASS the popcount filter and are emitted as cluster-link
    hints (flagged ``via_star=true``, ``hamming`` reported as measured),
    which links every member of a degenerate bucket into the keeper's
    component — the right contract when an over-cap bucket means
    mass-duplicated boilerplate.

    Scale shape: over-cap buckets never materialize a member array at all
    — bucket size and the keeper come from window aggregates over the
    banded table, and star pairs are emitted ROW-WISE, so no single row
    ever holds more than ``max_bucket_size`` members (the small-bucket
    ``collect_list`` runs on rows already filtered to sz <=
    ``max_bucket_size``). The ranked banded table is pinned with a lazy
    ``localCheckpoint`` before the small-pair and star branches split:
    the r5 form shared the (band, chunk) Exchange as a ReusedExchange but
    still re-ran the sort + window once per branch (physical plans only
    dedupe at exchange boundaries) — the checkpoint computes the window
    pass ONCE and both branches read the stored blocks (measured
    3.94 -> 2.53 s on the 200k-doc suite corpus, value-identical; the
    stored footprint is the same corpus x bands rows the second
    sort+window would otherwise re-shuffle, disk-backed, and a lost
    block fails the job loudly — the connected_components localCheckpoint
    precedent). No self-join, no cartesian (plan-tested)."""
    if star_edges not in ("filter", "link"):
        raise ValueError("star_edges must be filter|link")
    sh = simhash(df, id_col, bits=bits, hash_fn=hash_fn)
    width = bits // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("chunk"),
        )
        for b in range(bands)
    ]
    banded = sh.select(
        F.col(id_col).alias("id"),
        F.col("simhash").alias("h"),
        F.explode(F.array(*band_structs)).alias("bs"),
    ).select("id", "h", F.col("bs.band").alias("band"), F.col("bs.chunk").alias("chunk"))
    w = Window.partitionBy("band", "chunk")
    ranked = banded.withColumn("__sz", F.count(F.lit(1)).over(w)).withColumn(
        "__keep", F.min(F.struct(F.col("id"), F.col("h"))).over(w)
    ).localCheckpoint(eager=False)
    small = (
        ranked.filter(
            (F.col("__sz") > 1) & (F.col("__sz") <= max_bucket_size)
        )
        .groupBy("band", "chunk")
        .agg(F.sort_array(F.collect_list(F.struct("id", "h"))).alias("members"))
    )
    all_pairs = F.filter(
        F.flatten(
            F.transform(
                "members",
                lambda x: F.transform(
                    "members",
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        x["h"].alias("h_a"),
                        y["h"].alias("h_b"),
                    ),
                ),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    small_pairs = (
        small.select(F.explode(all_pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.h_a", "p.h_b")
        .withColumn("via_star", F.lit(False))
    )
    # window min(struct(id, h)) = the min-id keeper; id != keeper.id keeps
    # pairs ordered id_a < id_b by construction
    star_pairs = ranked.filter(
        (F.col("__sz") > max_bucket_size) & (F.col("id") != F.col("__keep.id"))
    ).select(
        F.col("__keep.id").alias("id_a"),
        F.col("id").alias("id_b"),
        F.col("__keep.h").alias("h_a"),
        F.col("h").alias("h_b"),
        F.lit(True).alias("via_star"),
    )
    cand = small_pairs.unionByName(star_pairs)
    if star_edges == "filter":
        return (
            cand.select("id_a", "id_b", "h_a", "h_b")
            .distinct()
            .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
        )
    # link mode: a pair can surface as an exact pair in one band and a star
    # edge in another — bool_or keeps it linked (max recall for CC)
    return (
        cand.groupBy("id_a", "id_b", "h_a", "h_b")
        .agg(F.max("via_star").alias("via_star"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter((F.col("hamming") <= max_hamming) | F.col("via_star"))
        .select("id_a", "id_b", "hamming", "via_star")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a candidate-pair edge list — the keep-one
    resolution stage downstream of every candidate generator here
    (minhash_dedup_candidates / simhash_near_pairs /
    embedding near-dup): each near-dup cluster collapses to its minimum
    member id, and "drop all but the keeper" is then a trivial filter.

    Alternating large-star / small-star contraction (Kiveris, Lattanzi,
    Mirrokni, Rastogi, Vassilvitskii 2014, "Connected Components in
    MapReduce and Beyond" — public algorithm): converges in O(log n)
    rounds on arbitrary graphs; the star-capped pair lists produced
    upstream have diameter <= ~4, so 2-4 rounds in practice. Each round
    is two bounded node-keyed groupBy+join shuffles — no collect of the
    graph, no per-node Python. The driver loop only reads a two-number
    fingerprint per round for the convergence test (the same pattern
    GraphFrames' CC uses).

    Returns (node, component) for every distinct node in ``pairs``,
    component = min node id of its component."""
    spark = pairs.sparkSession

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

    def _star(e: DataFrame, large: bool) -> DataFrame:
        """large: emit (v, m) for v in nbrs(u), v > u.
        small: over v <= u, emit (v, m) for v in (nbrs<=u ∪ {u}) \\ {m}."""
        sym = _sym(e)
        if not large:
            sym = sym.filter(F.col("dst") <= F.col("src"))
        mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
        mins = mins.withColumn("m", F.least("mn", F.col("src"))).drop("mn")
        j = sym.join(mins, "src")
        if large:
            out = j.filter(F.col("dst") > F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst")
            )
        else:
            out = (
                j.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .unionByName(mins.select("src", F.col("m").alias("dst")))
            )
        return out.filter(F.col("src") != F.col("dst")).distinct()

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .unionByName(pairs.select(F.col(id_b).alias("node")))
        .distinct()
        .persist()
    )
    prev_fp = None
    for _ in range(max_iter):
        # localCheckpoint: an iterative DataFrame loop otherwise DOUBLES
        # the logical plan per round (sym/union reference the previous
        # round twice) — by round ~10 plan cloning alone OOMs the driver.
        # Truncating lineage each round keeps plans O(1); on a cluster
        # with an unreliable executor set, use checkpoint(dir) instead.
        edges = _star(_star(edges, large=True), large=False).localCheckpoint()
        fp = edges.agg(
            F.count("*").alias("c"),
            # bit_xor: order-independent and overflow-free under ANSI mode
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        fp = (fp["c"], fp["h"])
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # post-convergence every edge points node -> component min; isolated
    # nodes (possible if callers pass self-pairs) are their own component
    comp = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return (
        nodes.join(comp, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )


def dedup_resolve(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Keep-one resolution: (node, component, keep) — keep=True exactly
    for each component's minimum id. Downstream: left_anti join the
    corpus against the keep=False rows."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.withColumn("keep", F.col("node") == F.col("component"))


def bloom_build(
    seen: DataFrame,
    hash_col: str = "content_hash",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    hash_fn: str = "xxhash64",
) -> dict:
    """Build a Bloom filter over a historical fingerprint store — the
    Dolma-style alternative to the hash-join form of cross-snapshot dedup
    (dedup_incremental): instead of joining every batch against the
    history on its hash key, fold the history ONCE into an m_bits bitmap
    and test each incoming document map-only against the broadcast bitmap.

    Each item sets k_hashes bit positions

        pos_i = hash64(str(i) + ':' + str(item_hash)) mod m_bits ,

    derived from the item's content hash so that both engines (and the
    DuckDB oracle, via hash_fn='md5') compute identical positions.

    Scale shape: one explode(k positions) -> distinct shuffle whose OUTPUT
    is bounded at m_bits rows regardless of history size, collected and
    bit-packed driver-side into m_bits/64 longs (m_bits=2^20 -> 128 KiB —
    broadcast-trivial). The history is scanned once at build time and
    never again; contains/dedup passes are pure map. Size m_bits for the
    target false-positive rate (1 - e^{-kn/m})^k; at 10^12 documents a
    single in-plan bitmap no longer fits a task closure, and the same
    positions feed a partitioned bitmap or the table format's native
    key-bloom metadata instead — the operator contract (positions, k,
    packing) is unchanged.

    Returns {"m_bits", "k_hashes", "hash_fn", "words", "n_items"} —
    pass to bloom_contains / bloom_dedup built with the SAME parameters.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    hs = F.col(hash_col).cast("string")
    pos = F.array(
        *[
            F.pmod(hash64(hs, seed=i, hash_fn=hash_fn), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )
    n_items = seen.count()
    rows = seen.select(F.explode(pos).alias("pos")).distinct().collect()
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in rows:
        p = r["pos"]
        words[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
    return {
        "m_bits": m_bits,
        "k_hashes": k_hashes,
        "hash_fn": hash_fn,
        "words": [int(np.int64(w)) for w in words],  # signed, Spark long
        "n_items": n_items,
    }


def bloom_contains(
    df: DataFrame, bloom: dict, hash_col: str = "content_hash"
) -> DataFrame:
    """Map-only Bloom membership: adds boolean ``maybe_seen`` — True iff
    every one of the filter's k bit positions for this row's hash is set.
    False is certain-new; True is probably-seen (false-positive rate set
    by the build's m/k/n). The bitmap is inlined as ONE parsed
    array-literal (the lm_cross_entropy doctrine — per-element F.lit would
    issue a py4j call per word); the bit test is pure JVM integer math, no
    shuffle, no Python."""
    words = F.expr(
        "array(" + ",".join(f"{w}L" for w in bloom["words"]) + ")"
    )
    pow2 = F.expr(
        "array(" + ",".join(f"{(1 << b) - (1 << 64 if b == 63 else 0)}L" for b in range(64)) + ")"
    )
    hs = F.col(hash_col).cast("string")
    m = bloom["m_bits"]
    tests = []
    for i in range(bloom["k_hashes"]):
        pos = F.pmod(hash64(hs, seed=i, hash_fn=bloom["hash_fn"]), F.lit(m))
        word = F.get(words, F.shiftright(pos, 6).cast("int"))
        bit = F.get(pow2, F.pmod(pos, F.lit(64)).cast("int"))
        tests.append(word.bitwiseAND(bit) != F.lit(0))
    maybe = tests[0]
    for t in tests[1:]:
        maybe = maybe & t
    return df.withColumn("maybe_seen", maybe)


def bloom_dedup(
    batch: DataFrame,
    bloom: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-snapshot dedup against a Bloom'd history — the map-only
    counterpart of dedup_incremental's history join: (id, content_hash,
    maybe_seen). maybe_seen=False rows are certainly new (append their
    hashes to the store and set their bits); True rows are duplicates up
    to the filter's false-positive rate — route them to the exact
    hash-join path if exactness is required (the standard two-tier
    Bloom-then-join plan: the join now touches only the tiny maybe set).
    """
    hashed = batch.select(
        F.col(id_col),
        hash64(F.col(text_col), hash_fn=bloom["hash_fn"]).alias("content_hash"),
    )
    return bloom_contains(hashed, bloom)


def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    min_repeats: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Span-level (substring) deduplication: the ExactSubstr shape of Lee
    et al., "Deduplicating Training Data Makes Language Models Better"
    (arXiv:2107.06499) — any word n-gram occurring >= min_repeats times
    across the corpus (within-document repeats count too) marks its token
    span, and overlapping-or-adjacent marked spans merge per document.
    Complements the document-level operators above: exact/minhash/simhash
    kill whole near-duplicate documents, this finds the duplicated
    PASSAGES (boilerplate, licenses, templated paragraphs) inside
    otherwise-unique documents.

    Output: one row per merged span — (id, span_start, span_end), token
    indices into the whitespace tokenization, end exclusive.

    Plan: n-gram positions are generated once (Arrow kernel on the
    production hash path, JVM expressions on the md5 oracle path —
    O(tokens) rows per doc), ONE hash Exchange on the gram hash feeds a
    window count that flags repeated grams in place, and the per-doc
    merge is one sort window (gaps-and-islands via running max of span
    end). Every stage is a bounded-key shuffle — no crossJoin. The
    former groupBy(g) + join-back formulation paid the gram generation
    TWICE (the aggregate side and the probe side are different
    exchanges, so nothing is reused) plus a sort-merge join; the window
    form generates grams once and sorts the position table once for the
    same per-gram count (measured 10.1 -> ~5 s noop on the 40x-replicated
    suite corpus, guide §2.4). The gram key is hashed (``hash_fn``, as
    elsewhere in this module) so shuffles carry longs, not n-word
    strings; the output is hash-independent modulo collisions."""
    pos = _gram_positions(df, id_col, text_col, n, hash_fn)
    w = Window.partitionBy("g")
    flagged = (
        pos.withColumn("__c", F.count(F.lit(1)).over(w))
        .filter(F.col("__c") >= min_repeats)
        .select(id_col, "pos")
    )
    return _merge_position_spans(flagged, id_col, n)


def _gram_hash_arrow(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Arrow/numpy gram-hash kernel (production fast path, the
    _minhash_banded_arrow doctrine): one mapInArrow pass emits one row
    per doc — (id, array of 64-bit gram hashes, one per n-gram start
    position). Tokens are split C-side (lower + single-space split,
    empties kept — byte-parity with :func:`_tokens`), dictionary-encoded
    so only the unique vocabulary is hashed, and each gram hash is the
    same vectorized uint64 mix of its n consecutive token hashes that
    the MinHash kernel uses. A different hash family than xxhash64 over
    the concatenated gram string, with the same collision statistics —
    span outputs are hash-independent modulo 64-bit collisions. The
    expression path (md5) stays for the DuckDB-reproducible oracle
    variant."""
    import pyarrow as pa

    id_field = df.select(id_col).schema.fields[0]

    def gen(batches):
        import pandas as pd
        import pyarrow.compute as pc

        C1 = np.uint64(0x9E3779B97F4A7C15)
        C2 = np.uint64(0xC2B2AE3D27D4EB4F)
        for rb in batches:
            tbl = pa.table(rb)
            mask = pc.is_valid(tbl[text_col])
            if not pc.all(mask).as_py():
                tbl = tbl.filter(mask)
            if tbl.num_rows == 0:
                continue
            arr = tbl[text_col].combine_chunks()
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            toks = pc.split_pattern(pc.utf8_lower(arr), " ")
            flat = pc.list_flatten(toks)
            lens = np.asarray(
                pc.list_value_length(toks).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            dic = flat.dictionary_encode()
            idx = np.asarray(dic.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
            vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
            th = pd.util.hash_array(vocab).astype(np.uint64)[idx]
            n_g = np.maximum(lens - (n - 1), 0)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            g_offs = np.concatenate(([0], np.cumsum(n_g)))
            total = int(g_offs[-1])
            # flat start position of each gram's first token
            starts = (
                np.arange(total, dtype=np.int64)
                - g_offs[:-1].repeat(n_g)
                + offs.repeat(n_g)
            )
            with np.errstate(over="ignore"):
                acc = np.zeros(total, dtype=np.uint64)
                for j in range(n):
                    acc = (acc * C1) ^ (th[starts + j] + C2)
            garr = pa.ListArray.from_arrays(
                pa.array(g_offs, type=pa.int32()),
                pa.array(acc.view(np.int64), type=pa.int64()),
            )
            idc = tbl[id_col].combine_chunks()
            if isinstance(idc, pa.ChunkedArray):
                idc = idc.combine_chunks()
            yield pa.RecordBatch.from_arrays(
                [idc, garr], names=[id_col, "__garr"]
            )

    return df.select(id_col, text_col).mapInArrow(
        gen, schema=f"{id_col} {id_field.dataType.simpleString()}, __garr array<bigint>"
    )


def _gram_positions(
    df: DataFrame, id_col: str, text_col: str, n: int, hash_fn: str
) -> DataFrame:
    """(id, pos, gram-hash) long table: one row per word n-gram position
    (lowercased whitespace tokenization). hash_fn="xxhash64" (production)
    dispatches to the Arrow/numpy kernel (_gram_hash_arrow — the gram
    array is built vectorized C-side, only the posexplode runs in the
    JVM; measured ~3.5x the interpreted higher-order-function expression,
    whose per-gram concat_ws + hash never reaches codegen); "md5" keeps
    the pure-expression path whose every value DuckDB reproduces
    bit-exactly for the driver oracle."""
    if hash_fn == "xxhash64":
        garr = _gram_hash_arrow(df, id_col, text_col, n)
        return garr.select(F.col(id_col), F.posexplode("__garr").alias("pos", "g"))
    toks = _tokens(text_col)
    gram_hashes = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: hash64(F.concat_ws(" ", F.slice(toks, i + 1, n)), hash_fn=hash_fn),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(F.col(id_col), F.posexplode(gram_hashes).alias("pos", "g"))


def _merge_position_spans(flagged: DataFrame, id_col: str, n: int) -> DataFrame:
    """Merge flagged n-gram start positions into maximal token spans per
    doc (gaps-and-islands: one sort window with a running max of span
    ends; overlapping-or-adjacent spans fold)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    island = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        flagged.withColumn("__island", island)
        .groupBy(id_col, "__island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n).cast("long").alias("span_end"),
        )
        .drop("__island")
    )


def contaminated_spans(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Span-level benchmark decontamination: token spans of ``df`` that
    verbatim-reproduce any word n-gram of the ``benchmark`` corpus,
    merged per document (same gaps-and-islands machinery as
    :func:`repeated_spans`). Where :func:`decontaminate` flags whole
    documents by shared-gram count, this localizes WHICH passages leak a
    benchmark — so a document quoting one eval question can be surgically
    cleaned with :func:`remove_repeated_spans` instead of dropped.
    n=13 is the common eval-decontamination window (GPT-3 appendix C /
    arXiv:2005.14165).

    Plan: both sides explode to (pos, gram-hash) rows JVM-side; the
    benchmark side reduces to a DISTINCT gram-hash set (bounded by the
    benchmark's volume, usually << corpus, so AQE typically broadcasts
    it); one hash join flags training positions and one per-doc sort
    window merges them."""
    pos = _gram_positions(df, id_col, text_col, n, hash_fn)
    bench_grams = (
        _gram_positions(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bench_text_col).alias("__btxt")),
            "__bid",
            "__btxt",
            n,
            hash_fn,
        )
        .select("g")
        .distinct()
    )
    flagged = pos.join(bench_grams, "g").select(id_col, "pos")
    return _merge_position_spans(flagged, id_col, n)


def remove_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`repeated_spans` output: drop every token inside a
    flagged span and rebuild the text (single-space joined, matching the
    operator's whitespace tokenization). Adds ``text_clean`` and
    ``n_removed_tokens``; documents without spans pass through intact.
    The span table is doc-keyed and far smaller than the corpus, so the
    join shuffles only (id, spans) rows.

    Reconstruction splits the ORIGINAL text (case preserved) — span
    indices align because repeated_spans' lowercasing changes token
    contents for gram matching, never token boundaries."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = F.split(F.col(text_col), " ")
    spans_arr = F.coalesce(F.col("__spans"), F.array().cast(
        "array<struct<span_start:bigint,span_end:bigint>>"
    ))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            spans_arr,
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return (
        df.join(sp, id_col, "left")
        # NULL text is as-if-absent (module NULL convention): no spans
        # were ever flagged for it, text_clean stays NULL (not ""), and
        # the removed count is 0
        .withColumn(
            "text_clean",
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
                F.concat_ws(" ", kept)
            ),
        )
        .withColumn(
            "n_removed_tokens",
            F.coalesce((F.size(toks) - F.size(kept)).cast("long"), F.lit(0)),
        )
        .drop("__spans")
    )
