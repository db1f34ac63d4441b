"""Storage-knob probe for the 8->32 single-node scaling ceiling.

Round-2 attribution said the 8->32 step (0.48-0.55 efficiency) is the one
socket's memory bus. If that is right, knobs that shrink bytes moved from
storage (codec level, row-group size, dictionary hits) should lift the
32-core rate; if they do nothing, the ceiling is elsewhere (e.g. shared
LLC / memory controller on decompressed bytes, Python worker memory
traffic). Either outcome sharpens BASELINE.md's attribution.

Variants of the SAME 5M-doc replicated corpus (sf0.1 x 1000):
  snappy          — parquet default (the round-2 baseline)
  zstd3 / zstd9   — smaller files, more decompress CPU
  rg32m           — 32 MiB row groups (more, smaller splits)
  clustered       — replicas sorted so identical texts co-locate inside
                    row groups => parquet dictionary encoding engages
                    (NOTE: an artifact of the replicated benchmark corpus;
                    real crawl text is unique — reported for attribution,
                    not as a production claim)

Each variant runs the fused job (parquet scan -> Arrow scoring ->
map-side hour partials -> finalize) at local[8] and local[32],
interleaved, min of N. Usage:

    python scripts/bench_knobs.py [--runs=2] [--rep=1000]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_variants(rep: int) -> dict[str, str]:
    from pyspark.sql import functions as F

    sys.path.insert(0, REPO)
    from bench import get_spark, replicated_pages

    spark = get_spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    base = replicated_pages(spark, SF_DIR, rep).cache()
    base.count()
    out: dict[str, str] = {}

    def write(name: str, df, codec: str, block: int | None = None,
              zstd_level: int | None = None):
        path = f"/tmp/bench_knobs_{name}_rep{rep}"
        out[name] = path
        if os.path.isdir(path):
            return
        w = df.write.mode("overwrite").option("compression", codec)
        if block:
            w = w.option("parquet.block.size", str(block))
        if zstd_level:
            w = w.option("parquet.compression.codec.zstd.level", str(zstd_level))
        w.parquet(path)

    write("snappy", base, "snappy")
    write("zstd3", base, "zstd", zstd_level=3)
    write("zstd9", base, "zstd", zstd_level=9)
    write("rg32m", base, "snappy", block=32 * 1024 * 1024)
    # cluster replicas of the same base doc into the same row groups so
    # parquet's dictionary page actually deduplicates the text bytes
    clustered = base.withColumn("base_url", F.substring_index("url", "#", 1)) \
        .repartition(32, "base_url").sortWithinPartitions("base_url").drop("base_url")
    write("clustered", clustered, "snappy")
    spark.stop()
    return out


def du(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e9


def timed_run(src: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, BENCH, "--once", "--fused-scaling",
         f"--cpus={cpus}", f"--src={src}"],
        capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout + out.stderr)
        raise SystemExit(1)
    return json.loads(lines[-1])


def main() -> None:
    runs = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--runs=")), "2"))
    rep = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--rep=")), "1000"))
    variants = build_variants(rep)
    sizes = {k: round(du(v), 2) for k, v in variants.items()}
    times: dict[str, dict[int, list[float]]] = {k: {8: [], 32: []} for k in variants}
    n_docs = 0
    for _ in range(runs):
        for name, src in variants.items():
            for c in (8, 32):
                r = timed_run(src, c)
                times[name][c].append(r["t_sec"])
                n_docs = r["n_docs"]
    result = {"n_docs": n_docs, "runs": runs, "sf": SF_DIR, "variants": {}}
    for name in variants:
        t8, t32 = min(times[name][8]), min(times[name][32])
        result["variants"][name] = {
            "gb": sizes[name],
            "t8": round(t8, 2),
            "t32": round(t32, 2),
            "docs_per_sec_8": round(n_docs / t8 / 1e3, 1),
            "docs_per_sec_32": round(n_docs / t32 / 1e3, 1),
            "eff_8_32": round((t8 / t32) / 4.0, 3),
        }
    result["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "knobs.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
