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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col: str = "text"):
    return F.split(F.lower(F.col(col)), " ")


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


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", n: int = 3, k: int = 32
) -> DataFrame:
    """k-permutation MinHash signature per doc: min over shingles of
    xxhash64(shingle, seed_i). One explode + one groupBy."""
    sh = shingles(df, id_col, n)
    mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}") for i in range(k)]
    return sh.groupBy(id_col).agg(*mins)


def minhash_lsh_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: split the k-minhash signature into ``bands`` bands of
    k/bands rows; docs sharing any (band, band-signature) land in one
    bucket. Returns buckets with >= 2 members (near-dup candidates).
    Shuffle key is (band, signature) — bounded and well-distributed."""
    if k % bands:
        raise ValueError("k must be divisible by bands")
    rows = k // bands
    sig = minhash_signatures(df, id_col, n, k)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias("sig"),
        )
        for b in range(bands)
    ]
    exploded = sig.select(id_col, F.explode(F.array(*band_cols)).alias("bs")).select(
        id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
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


def minhash_dedup_candidates(
    df: DataFrame, id_col: str = "doc_id", n: int = 3, k: int = 32, bands: int = 8
) -> DataFrame:
    """Distinct candidate near-dup pairs from LSH buckets."""
    buckets = minhash_lsh_buckets(df, id_col, n, k, bands)
    pairs = buckets.select(
        F.explode(
            F.filter(
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
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()
    return pairs


def simhash(df: DataFrame, id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token-hash bits, weighted by term
    frequency. Pure Catalyst: explode tokens -> per-(doc, bit) majority."""
    tok = df.select(id_col, F.explode(_tokens()).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", F.xxhash64("token"))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    per_bit = h.select(id_col, "tf", "h", bit).withColumn(
        "vote",
        F.when(F.expr("(h >> bit) & 1") == 1, F.col("tf")).otherwise(-F.col("tf")),
    )
    votes = per_bit.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit hash into ``bands`` chunks
    (pigeonhole: hamming <= bands-1 guarantees a shared band), bucket-join,
    then exact popcount filter."""
    sh = simhash(df, id_col)
    width = 64 // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("chunk"),
        )
        for b in range(bands)
    ]
    banded = sh.select(id_col, "simhash", F.explode(F.array(*band_structs)).alias("bs")).select(
        id_col, "simhash", F.col("bs.band").alias("band"), F.col("bs.chunk").alias("chunk")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.chunk") == F.col("b.chunk")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")
