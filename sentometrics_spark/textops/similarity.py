"""Similarity search over an embedding column (array<float>).

  - brute-force cosine top-k (baseline; exact)
  - LSH-bucketed approximate top-k via random hyperplanes (scale path:
    candidate set shrinks by ~2^bits per table; recall tunable by tables)
  - IVF-style: k-means-lite coarse centroids (sampled, driver-side numpy),
    probe nearest cells only

All vector math stays JVM-side via zip_with/aggregate; the only Python is
the tiny centroid fit on a driver sample.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(c):
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (queries broadcast)."""
    pairs = emb.crossJoin(F.broadcast(queries)).select(
        q_id_col,
        id_col,
        (_dot(F.col(vec_col), F.col(q_vec_col)) / (_norm(F.col(vec_col)) * _norm(F.col(q_vec_col)))).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).astype(np.float64)


def _bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-bit bucket id for one hyperplane table, as a JVM expression."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in p])
        bits.append(
            F.when(_dot(F.col(vec_col), arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket with
    the query in ANY of n_tables sign-hyperplane tables; exact cosine on
    candidates only. Join key is (table, bucket) — a bounded hash shuffle,
    never a crossJoin."""
    # ONE corpus scan for all tables: every table's bucket id is computed
    # in the same pass and posexploded to (tbl, bucket) rows, so the plan
    # has a single broadcast join on (tbl, bucket) instead of n_tables
    # scan+join+union rounds (same buckets, same candidates, bit-for-bit)
    all_planes = [random_hyperplanes(dim, bits, seed + t) for t in range(n_tables)]
    e = emb.select(
        id_col,
        vec_col,
        F.posexplode(
            F.array(*[_bucket_expr(vec_col, p) for p in all_planes])
        ).alias("tbl", "bucket"),
    )
    q = queries.select(
        q_id_col,
        q_vec_col,
        F.posexplode(
            F.array(*[_bucket_expr(q_vec_col, p) for p in all_planes])
        ).alias("tbl", "bucket"),
    )
    cands = (
        e.join(F.broadcast(q), ["tbl", "bucket"])
        .select(id_col, q_id_col, vec_col, q_vec_col)
        .dropDuplicates([q_id_col, id_col])
    )
    scored = cands.select(
        q_id_col,
        id_col,
        (_dot(F.col(vec_col), F.col(q_vec_col)) / (_norm(F.col(vec_col)) * _norm(F.col(q_vec_col)))).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _unit_vectors(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, v) with v L2-normalized. The norm is computed ONCE into a
    column and divided out — a per-element transform that recomputes the
    aggregate norm inside the lambda would be O(d^2) per vector."""
    return (
        emb.withColumn("__n", _norm(F.col(vec_col)))
        .select(
            F.col(id_col).alias("id"),
            F.transform(vec_col, lambda x: x.cast("double") / F.col("__n")).alias("v"),
        )
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs: all (a, b) with a < b
    and cosine(a, b) >= threshold. O(n²) self-join — this is the
    correctness baseline and the DuckDB-oracle path; use
    embedding_near_dup_lsh for corpora where n² is not an option."""
    normed = _unit_vectors(emb, id_col, vec_col)
    a = normed.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = normed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.92,
    bits: int = 8,
    n_tables: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Scale path for embedding near-dup: candidate pairs share a
    sign-hyperplane bucket in ANY of n_tables tables — a (table, bucket)
    groupBy self-join, never all-pairs — then the exact cosine filter.
    For unit vectors P[same bit] = 1 - angle/pi, so a pair at cosine c
    survives one table with prob (1 - arccos(c)/pi)^bits; n_tables OR-ed
    tables push recall toward 1 (pytest pins recall vs the exact path).
    Bucket width is tunable: more bits = smaller buckets = cheaper join,
    lower per-table recall."""
    norm_emb = _unit_vectors(emb, id_col, vec_col)
    # ONE corpus scan for all tables (posexplode of every table's bucket
    # id), then a single self-join on (tbl, bucket) — not n_tables
    # scan+join+union rounds; same buckets and candidate pairs
    all_planes = [random_hyperplanes(dim, bits, seed + t) for t in range(n_tables)]
    bucketed = norm_emb.select(
        "id",
        "v",
        F.posexplode(
            F.array(*[_bucket_expr("v", p) for p in all_planes])
        ).alias("tbl", "bucket"),
    )
    ln = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket", "tbl")
    rn = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket", "tbl")
    cands = (
        ln.join(rn, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        cands.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    sample: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    iters: int = 5,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: fit k-means-lite centroids on a driver sample
    (numpy), assign every vector to its nearest cell JVM-side. Returns
    (assigned df with 'cell', centroids array).

    The sample is drawn by seeded-hash order (top-k over xxhash64(id)) —
    deterministic, one O(n) scan, and independent of the table's physical
    layout. A bare limit() would take the FIRST partitions, biasing the
    centroids whenever the table is sorted or partitioned by anything
    correlated with the vectors."""
    pdf = (
        emb.select(vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("__r"))
        .orderBy("__r")
        .limit(sample)
        .select(vec_col)
        .toPandas()
    )
    X = np.vstack(pdf[vec_col].to_numpy())
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        lbl = d.argmin(axis=1)
        for c in range(len(cent)):
            m = lbl == c
            if m.any():
                cent[c] = X[m].mean(axis=0)
    # nearest-centroid assignment as a JVM expression
    dists = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in cent[c]]),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"d_{c}")
        for c in range(len(cent))
    ]
    structs = F.array(
        *[F.struct(F.col(f"d_{c}").alias("d"), F.lit(c).alias("cell")) for c in range(len(cent))]
    )
    assigned = (
        emb.select("*", *dists)
        .withColumn("cell", F.array_min(structs)["cell"])
        .drop(*[f"d_{c}" for c in range(len(cent))])
    )
    return assigned, cent


def ivf_topk(
    emb: DataFrame,
    queries_pdf,
    centroids: np.ndarray,
    assigned: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells per query; exact cosine within."""
    spark = emb.sparkSession
    rows = []
    for r in queries_pdf.itertuples(index=False):
        q = np.asarray(r.q_emb, dtype=np.float64)
        d = ((centroids - q[None, :]) ** 2).sum(axis=1)
        cells = np.argsort(d)[:n_probe]
        for c in cells:
            rows.append((int(r.q_id), [float(x) for x in q], int(c)))
    qdf = spark.createDataFrame(rows, "q_id long, q_emb array<double>, cell int")
    cands = assigned.join(F.broadcast(qdf), "cell")
    scored = cands.select(
        "q_id",
        id_col,
        (_dot(F.col(vec_col), F.col("q_emb")) / (_norm(F.col(vec_col)) * _norm(F.col("q_emb")))).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
