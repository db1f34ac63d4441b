"""Cluster entry point for spark-submit (north rule).

    spark-submit --py-files dist/sentometrics_spark.zip scripts/submit_job.py \
        --input <pages table/path> --output <tier root> \
        [--format iceberg|parquet] [--how-within proportional] \
        [--how-docs proportional] [--salts 16] [--resume-root <ckpt root>]

Reads the Common-Crawl-style pages table, scores it with the Arrow-UDF
engine, builds the hour->day->week->month tier tables with salted two-phase
aggregation, writes them partitioned by bucket_date, and records the
per-partition checkpoint manifest so a rerun resumes from where it stopped.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--how-within", default="proportional")
    ap.add_argument("--how-docs", default="proportional")
    ap.add_argument("--salts", type=int, default=16)
    ap.add_argument("--resume-root", default=None)
    ap.add_argument("--master", default=None, help="only for local testing; spark-submit sets this")
    ap.add_argument("--driver-memory", default=None, help="only for local testing")
    args = ap.parse_args()

    from sentometrics_spark.aggregate.doc_agg import aggregate_docs_salted
    from sentometrics_spark.aggregate.tiers import TierStore, rollup
    from sentometrics_spark.corpus import validate_corpus
    from sentometrics_spark.lexicons import fixture_lexicons
    from sentometrics_spark.scoring.udf_engine import compute_sentiment_udf
    from sentometrics_spark.session import build_session

    spark = build_session(
        master=args.master,
        app_name="sentometrics-tiers",
        driver_memory=args.driver_memory,
    )
    t0 = time.time()

    if args.format == "iceberg":
        pages = spark.read.format("iceberg").load(args.input)
    else:
        pages = spark.read.parquet(args.input)
    pages = validate_corpus(pages)

    sent = compute_sentiment_udf(pages, fixture_lexicons(), args.how_within, mode="unigram")

    if args.resume_root:
        from sentometrics_spark.storage.checkpoint import CheckpointedRun

        run = CheckpointedRun(spark, args.resume_root)
        metrics = run.run(
            pages,
            lambda df: compute_sentiment_udf(df, fixture_lexicons(), args.how_within, mode="unigram"),
        )
        sent = run.results()
    else:
        metrics = {}

    hour = aggregate_docs_salted(sent, by="hour", how=args.how_docs, n_salts=args.salts)
    store = TierStore(spark, args.output, fmt=args.format if args.format == "parquet" else "parquet")
    store.write("hour", hour)
    day = rollup(store.read("hour"), "day")
    store.write("day", day)
    store.write("week", rollup(store.read("day"), "week"))
    store.write("month", rollup(store.read("day"), "month"))

    metrics["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
