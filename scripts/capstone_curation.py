"""Single-node curation capstone: N documents through the full
training-data composition path in one run, timing each stage.

  1. exact dedup            (xxhash64 groups -> keep-one)
  2. Gopher quality gate    (one corpus pass, all n-gram streams)
  3. temperature mixing     (tau=0.5 hash-threshold selection, map-only)
  4. train/val/test split   (deterministic hash assignment, map-only)
  5. sequence packing       (per-(source, shard) cumsum windows)

Usage:
  python scripts/capstone_curation.py [replicate] [cpus]   # default 4000 x sf0.1 = 20M docs

The corpus is materialized to /tmp once (reused across runs); one JSON
line per stage + a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bench import get_spark
    from sentometrics_spark.textops import dedup, sampling, textstats

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    src = f"/tmp/curation_docs_{os.path.basename(sf_dir.rstrip('/'))}_rep{rep}"
    if not os.path.isdir(src):
        t0 = time.time()
        docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n0 = docs0.count()
        reps = spark.range(rep).select(F.col("id").alias("rep"))
        big = (
            docs0.repartition(cpus * 4)
            .crossJoin(F.broadcast(reps))
            # distinct doc ids per replica; texts repeat (realistic: crawl
            # snapshots re-serve the same pages under new ids)
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * (n0 + 1))
            .drop("rep")
        )
        big.write.mode("overwrite").parquet(src)
        print(json.dumps({"stage": "materialize", "wall_sec": round(time.time() - t0, 1)}))

    docs = spark.read.parquet(src)
    n_docs = docs.count()
    results = {"n_docs": n_docs, "cpus": cpus, "stages": {}}

    def stage(name, fn):
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 2)
        results["stages"][name] = {"wall_sec": dt, "rows": n}
        print(json.dumps({"stage": name, "wall_sec": dt, "rows": n}))
        return n

    # 1. exact dedup: keep-one per content hash (every text has `rep`
    # copies, so this is the worst-case duplicate-heavy regime)
    hashed = docs.withColumn("content_hash", dedup.hash64(F.col("text")))
    keep = hashed.withColumn(
        "keep",
        F.row_number().over(
            Window.partitionBy("content_hash").orderBy("doc_id")
        ) == 1,
    )
    stage("exact_dedup", lambda: keep.filter("keep").agg(F.count("*")).collect()[0][0])

    # survivors proceed (re-derive rather than cache 20M rows)
    survivors = keep.filter("keep").drop("keep")

    # 2. Gopher quality stats on the deduped survivors. The composite
    # `passes_gopher` gate includes an English stop-word test the synthetic
    # corpus can never satisfy, so the capstone gates on the repetition
    # components (same computation — the stop-word column is one
    # array_intersect in the same projection).
    stage(
        "gopher_gate",
        lambda: textstats.gopher_quality(survivors.select(F.col("doc_id"), "text"))
        .filter(
            "top_bigram_frac <= 0.20 and top_trigram_frac <= 0.18"
            " and dup_5gram_frac <= 0.30 and n_tokens >= 10"
        )
        .agg(F.count("*"))
        .collect()[0][0],
    )

    # 3+4. composition decisions over the FULL corpus (map-only passes)
    sel = sampling.sample_by_source_temperature(docs, tau=0.5, target_frac=0.5)
    stage("temperature_mix", lambda: sel.filter("selected").agg(F.count("*")).collect()[0][0])
    split = sampling.split_train_val_test(docs)
    stage(
        "train_val_test",
        lambda: split.groupBy("split").count().agg(F.sum("count")).collect()[0][0],
    )

    # 5. packing layout across 64 shards per source
    packed = sampling.pack_documents(docs, budget=2048, shards=64)
    stage(
        "pack_documents",
        lambda: packed.agg(
            F.count("*"), F.max("pack_last")
        ).collect()[0][0],
    )

    # 6-8. span-level cleaning (the full Lee et al. ExactSubstr pipeline,
    # arXiv:2107.06499) over the raw replicated corpus — the worst-case
    # regime where every 8-gram of a replicated page is flagged and spans
    # merge wall-to-wall, the same stress as the suite's q18. The span
    # table is consumed twice (count + removal), so it is persisted for
    # the duration of the stage pair.
    span_src = docs.select("doc_id", "text")
    spans = dedup.repeated_spans(span_src, n=8, min_repeats=2).persist()
    stage("repeated_spans", lambda: spans.agg(F.count("*")).collect()[0][0])
    cleaned = dedup.remove_repeated_spans(span_src, spans)
    stage(
        "remove_repeated_spans",
        lambda: cleaned.agg(
            F.count("*"), F.sum("n_removed_tokens")
        ).collect()[0][0],
    )
    spans.unpersist()

    # span-level benchmark decontamination: src0/src1 play the eval
    # benchmark (the contaminated_spans_n8 contract); a doc carrying any
    # leaked span is DROPPED from the remaining pool
    bench = docs.filter(F.col("source").isin("src0", "src1")).select("doc_id", "text")
    train = docs.filter(~F.col("source").isin("src0", "src1")).select("doc_id", "text")
    cont = dedup.contaminated_spans(train, bench, n=8)
    stage(
        "contaminated_drop",
        lambda: train.join(
            cont.select("doc_id").distinct(), "doc_id", "left_anti"
        ).agg(F.count("*")).collect()[0][0],
    )

    total = round(sum(s["wall_sec"] for s in results["stages"].values()), 2)
    results["total_wall_sec"] = total
    results["docs_per_sec_total"] = round(n_docs * len(results["stages"]) / total, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
