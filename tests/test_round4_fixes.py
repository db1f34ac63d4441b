"""Round-4 hardening regression tests (VERDICT.md round-3 "next" items):

  1. simhash_near_pairs caps degenerate (band, chunk) buckets with O(m)
     star pairs, mirroring the round-3 MinHash fix, and its plan carries
     no self-join / cartesian.
  2. lm_cross_entropy scores map-only (bucketed-LM fold, no token-keyed
     Exchange) while staying bit-exact vs the join formulation.
  3. ADVICE round-3 fixes: multinomial warm start passed in solver scale;
     compact_partials leaves the highest batch_id partition alone so a
     post-restart replay of a pending batch cannot double-count.
  4. CJK segmenter hook: a per-language callable feeds the pre-tokenized
     path, lifting the fail-fast for languages it covers.
"""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from sentometrics_spark.textops import dedup


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------- simhash cap


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """1,000 near-identical boilerplate pages (identical but for a numeric
    token => tiny hamming, all sharing every band chunk) plus a handful of
    distinct docs."""
    rows = [
        (i, "lorem ipsum cookie banner accept terms privacy policy page " + str(i % 7))
        for i in range(1000)
    ]
    rows += [(5000 + i, f"genuinely unique document number {i} with its own words {i*i}") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_degenerate_bucket_emits_star_pairs(boilerplate_docs):
    out = dedup.simhash_near_pairs(
        boilerplate_docs, max_hamming=8, bands=4, max_bucket_size=64
    ).toPandas()
    # 1,000 boilerplate members share buckets far beyond the 64 cap: the
    # capped op emits O(m) star rows, not m^2/2 ~ 500k
    boiler = out[(out.id_a < 1000) & (out.id_b < 1000)]
    assert 0 < len(boiler) <= 4 * 1000
    # every boilerplate member is still linked into the keeper's component
    linked = set(boiler.id_a) | set(boiler.id_b)
    assert linked.issuperset(set(range(1, 1000)) | {0})
    # star pairs keep the keeper (min id) on the left
    assert (boiler.id_a == 0).all() or len(boiler[boiler.id_a != 0]) < len(boiler)


def test_simhash_small_buckets_unchanged_by_cap(spark, tmp_path):
    """Below the cap the output is identical to an uncapped run."""
    rows = [(i, f"alpha beta gamma delta {i % 3} epsilon {i % 5}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.simhash_near_pairs(docs, max_hamming=6, max_bucket_size=256).toPandas()
    uncapped = dedup.simhash_near_pairs(docs, max_hamming=6, max_bucket_size=10**9).toPandas()
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b", "hamming"]].to_numpy()))
    assert key(capped) == key(uncapped)


def test_simhash_pairs_plan_no_self_join(spark):
    docs = spark.createDataFrame(
        [(i, "spark fast query engine row " + "x" * (i % 5)) for i in range(30)],
        "doc_id long, text string",
    )
    p = _plan_of(dedup.simhash_near_pairs(docs, id_col="doc_id"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # the old formulation self-joined the banded table; the capped one is a
    # single groupBy expansion — no join operator at all
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
