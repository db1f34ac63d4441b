"""Training-data pipeline ops: dedup (exact/minhash/simhash/jaccard),
similarity search (brute force / LSH / IVF), text stats, multimodal
plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sentometrics_spark.textops import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Append exact and near duplicates of known docs."""
    base = docs.limit(5).collect()
    rows = []
    for i, r in enumerate(base):
        rows.append((10_000 + i, r["text"], r["lang"], r["source"], r["n_chars"]))  # exact dup
        toks = r["text"].split(" ")
        toks[0] = "zzz"  # near dup: one token changed
        rows.append((20_000 + i, " ".join(toks), r["lang"], r["source"], r["n_chars"]))
    extra = spark.createDataFrame(rows, docs.schema)
    return docs.unionByName(extra).cache()


def test_exact_duplicates(docs_with_dups):
    groups = dedup.exact_duplicates(docs_with_dups).collect()
    assert len(groups) == 5
    for g in groups:
        assert g["group_size"] == 2
        assert g["keep_id"] == min(g["members"])


def test_minhash_lsh_finds_near_dups(docs_with_dups):
    pairs = dedup.minhash_dedup_candidates(docs_with_dups, k=32, bands=8).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    # each planted near-dup (orig, 20000+i) and exact dup (orig, 10000+i)
    # must be among candidates
    origs = [p for p in found if p[1] >= 10_000]
    assert len(origs) >= 10, f"only {len(origs)} planted pairs found: {sorted(found)[:20]}"


def test_ngram_jaccard(docs_with_dups):
    pairs = dedup.ngram_jaccard_pairs(docs_with_dups, threshold=0.5).toPandas()
    keyed = {(a, b): j for a, b, j in zip(pairs.id_a, pairs.id_b, pairs.jaccard)}
    # the 5 planted exact dups have jaccard exactly 1.0
    for i in range(5):
        assert keyed.get((i, 10_000 + i)) == pytest.approx(1.0)
    # the 5 planted near dups (one token changed) are found below 1.0
    near = pairs[(pairs.id_a < 5) & (pairs.id_b >= 20_000)]
    assert len(near) == 5
    assert (near["jaccard"] < 1.0).all() and (near["jaccard"] > 0.5).all()


def test_simhash_near_pairs(docs_with_dups):
    pairs = dedup.simhash_near_pairs(docs_with_dups, max_hamming=6).toPandas()
    keyed = {(a, b): h for a, b, h in zip(pairs.id_a, pairs.id_b, pairs.hamming)}
    # planted exact dups: identical simhash -> hamming 0 (other natural
    # collisions can exist on the tiny closed vocabulary)
    for i in range(5):
        assert keyed.get((i, 10_000 + i)) == 0
    # planted near dups (one token changed): small hamming, found within 6
    near = [(a, b) for (a, b) in keyed if a < 5 and b == 20_000 + a]
    assert len(near) >= 3


def test_brute_force_vs_lsh_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = emb.filter(F.col("vec_id") >= 5)
    exact = similarity.brute_force_topk(cand, queries, k=10).toPandas()
    approx = similarity.lsh_topk(cand, queries, k=10, bits=4, n_tables=8, dim=64).toPandas()
    # recall@10 of LSH vs exact
    recall = 0.0
    for q in exact["q_id"].unique():
        e = set(exact[exact.q_id == q]["vec_id"])
        a = set(approx[approx.q_id == q]["vec_id"])
        recall += len(e & a) / len(e)
    recall /= exact["q_id"].nunique()
    assert recall >= 0.3, f"LSH recall@10 too low: {recall}"
    # exact results ordered by cosine desc
    for q in exact["q_id"].unique():
        c = exact[exact.q_id == q].sort_values("rnk")["cosine"].to_numpy()
        assert (np.diff(c) <= 1e-12).all()


def test_embedding_near_dup_exact_and_lsh(spark, sf_dir):
    """Plant perturbed copies (v*0.9 + 0.08) of 15 vectors; the exact path
    must find exactly the 15 planted pairs at threshold 0.7 (natural max
    pairwise cosine is ~0.53), and the LSH-bucketed scale path must reach
    high recall of the exact result without ever forming all pairs."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 15).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.9 + 0.08).alias("embedding"),
    )
    allv = emb.unionByName(planted)
    exact = similarity.embedding_near_dup_pairs(allv, threshold=0.7).toPandas()
    assert len(exact) == 15
    assert set(zip(exact.id_a, exact.id_b)) == {(i, i + 100000) for i in range(15)}
    assert (exact.cosine >= 0.7).all()

    # planted pairs sit at cosine ~0.79-0.85 -> per-bit collision prob
    # ~0.79, so bits=4 / n_tables=10 gives per-pair miss (1-0.79^4)^10 < 1%
    approx = similarity.embedding_near_dup_lsh(
        allv, threshold=0.7, bits=4, n_tables=10, dim=64
    ).toPandas()
    got = set(zip(approx.id_a, approx.id_b))
    # every reported pair is a true near-dup (the exact-cosine filter runs
    # on candidates), and recall vs exact is high
    assert got <= set(zip(exact.id_a, exact.id_b))
    assert len(got) / 15 >= 0.8, f"LSH near-dup recall too low: {len(got)}/15"


def test_ivf_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cand = emb.filter(F.col("vec_id") >= 5)
    assigned, cent = similarity.ivf_assign(cand, n_cells=8, sample=400)
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
        .toPandas()
    )
    got = similarity.ivf_topk(emb, queries, cent, assigned, k=5, n_probe=4).toPandas()
    assert set(got["q_id"]) == {0, 1, 2}
    assert (got.groupby("q_id").size() == 5).all()
    exact = similarity.brute_force_topk(
        cand,
        spark.createDataFrame(queries[["q_id", "q_emb"]]),
        k=5,
    ).toPandas()
    recall = 0.0
    for q in (0, 1, 2):
        e = set(exact[exact.q_id == q]["vec_id"])
        a = set(got[got.q_id == q]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 3 >= 0.5


def test_language_id(docs):
    out = textstats.language_id(docs).toPandas()
    assert {"lang_pred", "lang_score"} <= set(out.columns)
    # fixture texts share one vocabulary, so this only checks mechanics:
    # scores in [0,1], prediction one of the profiled langs
    assert out["lang_score"].between(0, 1).all()
    assert out["lang_pred"].isin(["en", "fr", "de", "es"]).all()


def test_quality_and_tokens(docs):
    out = textstats.quality_score(docs).toPandas()
    assert out["quality"].between(0, 1).all()
    assert (out["n_tokens"] > 0).all()
    tok = docs.select(
        textstats.token_count().alias("ws"), textstats.bpe_ish_token_count().alias("bpe")
    ).toPandas()
    assert (tok["bpe"] >= tok["ws"] * 0).all() and (tok["bpe"] > 0).all()


def test_fingerprint(docs_with_dups):
    out = textstats.fingerprint(docs_with_dups).toPandas()
    # exact dups share both fingerprint values
    by_id = out.set_index("doc_id")
    for i in range(5):
        orig = by_id.loc[i]
        dup = by_id.loc[10_000 + i]
        assert orig["fp_full"] == dup["fp_full"]
        assert orig["fp_min"] == dup["fp_min"]


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media).toPandas()
    assert len(feats) == 30
    assert feats["ok"].all()
    assert feats["feature"].map(len).eq(16).all()
    # deterministic: same payload -> same feature
    again = multimodal.extract_features(media).toPandas()
    a = feats.sort_values("media_id")["feature"].map(tuple).tolist()
    b = again.sort_values("media_id")["feature"].map(tuple).tolist()
    assert a == b
    plan = multimodal.frame_sample_plan(media, every_ms=200).toPandas()
    assert (plan.groupby("media_id").size() == 5).all()  # 1000ms / 200ms


def test_multimodal_resize(spark):
    media = multimodal.synth_media(spark, n=30)
    out = multimodal.resize_images(media, target_w=32, target_h=32).toPandas()
    # only image rows (n=30 -> kinds cycle image/audio/video -> 10 images)
    assert len(out) == 10 and (out["kind"] == "image").all() and out["ok"].all()
    assert (out["width"] == 32).all() and (out["height"] == 32).all()
    # 64x64 -> 32x32 = quarter the pixel count -> quarter the stub bytes
    assert out["payload"].map(len).eq(128 // 4).all()
    # deterministic
    again = multimodal.resize_images(media, target_w=32, target_h=32).toPandas()
    assert (
        out.sort_values("media_id")["payload"].map(bytes).tolist()
        == again.sort_values("media_id")["payload"].map(bytes).tolist()
    )


def test_gopher_quality_gate(spark):
    """Planted docs: a clean 60-token doc passes; a doc that is one bigram
    repeated fails on top_bigram_frac; a doc of duplicated 5-grams fails on
    dup_5gram_frac; a 5-token doc fails the length gate with zero (not
    null) repetition fractions."""
    # all-unique tokens (a cycled vocab would itself be repetitive text and
    # correctly fail the 5-gram dup gate)
    clean = " ".join(
        ["the", "be", "to", "of", "and", "that", "have", "with"]
        + [f"word{i:02d}" for i in range(56)]
    )
    loop_bigram = " ".join(["click", "here"] * 40)
    dup5 = " ".join(["one two three four five"] * 12)
    short = "tiny doc of five words"
    df = spark.createDataFrame(
        [(1, clean), (2, loop_bigram), (3, dup5), (4, short)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.gopher_quality(df).collect()}

    assert out[1]["passes_gopher"]
    assert out[1]["top_bigram_frac"] < 0.2 and out[1]["dup_5gram_frac"] == 0.0

    assert not out[2]["passes_gopher"]
    # "click here" occurs 40x in 80 tokens -> 40*2/80 = 1.0
    assert out[2]["top_bigram_frac"] == pytest.approx(1.0)

    assert not out[3]["passes_gopher"]
    # 56 5-gram instances, 9 distinct (the 5-cycle window) -> heavy dup
    assert out[3]["dup_5gram_frac"] > 0.5

    assert not out[4]["passes_gopher"]
    assert out[4]["n_tokens"] == 5
    assert out[4]["dup_5gram_frac"] == 0.0  # coalesced, never null


def test_gopher_quality_plan_has_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    import io
    from contextlib import redirect_stdout

    spark.catalog.clearCache()
    buf = io.StringIO()
    with redirect_stdout(buf):
        textstats.gopher_quality(docs).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    # the three n-gram streams must come from ONE corpus pass: the per-doc
    # stats branch + the gram branch = exactly 2 source scans, never 4
    # (count numbered plan nodes; the detail section repeats each node)
    import re

    assert len(re.findall(r"Scan parquet\s*\(\d+\)", p)) <= 2, p


def test_winnow_fingerprints_guarantee_and_ties(spark):
    """Winnowing guarantee: two docs sharing a token run of length
    >= k + window - 1 (= 8 here) share at least one selected fingerprint;
    ties select the RIGHTMOST minimal hash; short docs (< window k-grams)
    emit exactly one global-min fingerprint."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    d1 = "one two three " + shared + " nine ten"
    d2 = "uno dos " + shared + " once doce trece"
    rep = " ".join(["same same same same"] * 3)  # all k-gram hashes equal
    short = "just five little words here"  # 5 tokens -> 2 k-grams < window
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, rep), (4, short)], "doc_id long, text string"
    )
    out = textstats.winnow_fingerprints(df, k=4, window=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp_hash"]))

    h1 = {h for _, h in by_doc[1]}
    h2 = {h for _, h in by_doc[2]}
    assert h1 & h2, "shared 8-token run must share a fingerprint"

    # rep doc: 9 identical k-gram hashes; every window min ties and the
    # rightmost wins -> positions 4..8 each pick themselves
    assert by_doc[3] == {(p, list(by_doc[3])[0][1]) for p in range(4, 9)} or \
        {p for p, _ in by_doc[3]} == set(range(4, 9))

    assert len(by_doc[4]) == 1  # short doc: single global pick


def test_canonicalize_url_and_duplicates(spark):
    cases = [
        # (raw, expected canonical)
        ("HTTP://Example.COM:80/a/b/?utm_source=x&id=3#frag",
         "http://example.com/a/b?id=3"),
        ("https://example.com:443//a//b/", "https://example.com/a/b"),
        ("https://example.com/a?utm_campaign=z", "https://example.com/a"),
        ("https://example.com/a?fbclid=abc&gclid=def", "https://example.com/a"),
        ("https://example.com:8080/a", "https://example.com:8080/a"),
        ("http://example.com", "http://example.com"),
        ("http://example.com/", "http://example.com"),
        # precision pins (ADVICE r2): the tracking strip is [?&]-anchored —
        # a param NAME merely containing the token survives; '//' inside a
        # query VALUE survives slash collapsing; back-to-back tracking
        # params all drop in one pass
        ("https://example.com/p?autm_source=x", "https://example.com/p?autm_source=x"),
        ("https://example.com/p?next=https://other.io//x",
         "https://example.com/p?next=https://other.io//x"),
        ("https://example.com/p?utm_a=1&utm_b=2&keep=3", "https://example.com/p?keep=3"),
        ("https://example.com/p?utm_a=1&utm_b=2", "https://example.com/p"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "doc_id long, url string"
    )
    got = {
        r["url"]: r["c"]
        for r in df.select("url", textstats.canonicalize_url("url").alias("c")).collect()
    }
    for raw, want in cases:
        assert got[raw] == want, f"{raw} -> {got[raw]} != {want}"

    # rows 0..3 + two fresh variants of the same page collapse into groups
    extra = spark.createDataFrame(
        [(100, "http://example.com/a/b?id=3&utm_medium=m"),
         (101, "https://example.com/a#section2")],
        "doc_id long, url string",
    )
    groups = textstats.url_duplicates(df.unionByName(extra)).collect()
    by_key = {g["canon_url"]: sorted(g["members"]) for g in groups}
    assert by_key["http://example.com/a/b?id=3"] == [0, 100]
    assert by_key["https://example.com/a"] == [2, 3, 101]
    assert by_key["http://example.com"] == [5, 6]

    # the DuckDB oracle regexes produce identical canonicals on these
    # adversarial URLs, not just the tame corpus ones
    import duckdb

    from sentometrics_spark.textops.textstats import (
        URL_PATH_PASSES,
        URL_QUERY_PASSES,
    )

    con = duckdb.connect()
    con.register("raw_urls", df.toPandas()[["url"]])

    def chain(expr, passes):
        for pat, rep in passes:
            expr = (f"regexp_replace({expr}, '{pat}', "
                    f"'{rep.replace('$1', chr(92) + '1')}', 'g')")
        return expr

    rest = "regexp_replace(c, '^[A-Za-z0-9+.-]*://[^/?]*', '', 'g')"
    path = chain(f"regexp_extract({rest}, '^([^?]*)', 1)", URL_PATH_PASSES)
    query = chain(f"regexp_replace({rest}, '^[^?]*', '', 'g')", URL_QUERY_PASSES)
    sql = f"""SELECT url,
      regexp_replace(lower(regexp_extract(c, '^([A-Za-z0-9+.-]*://[^/?]*)', 1)),
                     ':(80|443)$', '', 'g') || {path} || {query} AS canon
      FROM (SELECT url, regexp_replace(url, '#.*$', '', 'g') AS c FROM raw_urls)"""
    duck = dict(con.sql(sql).fetchall())
    for raw, want in cases:
        assert duck[raw] == want, f"duckdb: {raw} -> {duck[raw]}"


def test_duplicated_spans_exact_substring(spark):
    """A 12-token run pasted into two otherwise-unique docs is recovered as
    one maximal span in each (start/end in token positions, end exclusive);
    unique docs yield nothing; a doc repeating the run twice internally
    flags both occurrences."""
    run = " ".join(f"dup{i}" for i in range(12))
    a = " ".join(f"a{i}" for i in range(10)) + " " + run + " " + " ".join(
        f"z{i}" for i in range(5)
    )
    b = run + " " + " ".join(f"b{i}" for i in range(20))
    c = " ".join(f"c{i}" for i in range(30))  # all unique
    d = run + " " + " ".join(f"d{i}" for i in range(10)) + " " + run
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string"
    )
    spans = {
        (r["doc_id"], r["start_pos"], r["end_pos"])
        for r in dedup.duplicated_spans(df, min_len=8).collect()
    }
    # doc 1: run occupies tokens [10, 22) -> 8-gram starts 10..14
    assert (1, 10, 22) in spans
    # doc 2: run at [0, 12)
    assert (2, 0, 12) in spans
    assert not any(s[0] == 3 for s in spans)
    # doc 4: run at [0,12) and [22,34); start gap 22 - 4 = 18 > 8 keeps
    # them separate islands
    assert (4, 0, 12) in spans and (4, 22, 34) in spans
    assert len([s for s in spans if s[0] == 4]) == 2


def test_redact_pii_planted(spark):
    """Planted PII: typed placeholders, per-type counts, ordering rules
    (a dotted quad is one <IP>, never also a phone; a 15-digit run is a
    <CARD>); Spark and the DuckDB oracle chain agree character-for-char."""
    cases = [
        (1, "write to john.doe+x@mail.example.org today",
            "write to <EMAIL> today", dict(email=1)),
        (2, "server 192.168.10.250 rebooted", "server <IP> rebooted", dict(ipv4=1)),
        (3, "card 4111111111111111 declined", "card <CARD> declined", dict(card=1)),
        (4, "call +1 (555) 123-4567 now", "call <PHONE> now", dict(phone=1)),
        (5, "a@b.co or 10.0.0.1 or +44 20 7946 0958",
            "<EMAIL> or <IP> or <PHONE>", dict(email=1, ipv4=1, phone=1)),
        (6, "no personal data here", "no personal data here", {}),
        # precision pins (ADVICE r2): ISO dates are NOT phones, and
        # adjacent space-separated numbers are not merged into one match
        (7, "dated 2024-01-05 and 1999-12-31", "dated 2024-01-05 and 1999-12-31", {}),
        (8, "scores 12 34 56 78 ok", "scores 12 34 56 78 ok", {}),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in cases], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in textstats.redact_pii(df).collect()}
    for i, _, want_text, want_counts in cases:
        r = got[i]
        assert r["text_redacted"] == want_text, (i, r["text_redacted"])
        for name in ("email", "ipv4", "card", "phone"):
            assert r[f"n_{name}"] == want_counts.get(name, 0), (i, name)
        assert r["has_pii"] == bool(want_counts)

    import duckdb

    from sentometrics_spark.textops.textstats import PII_PATTERNS

    con = duckdb.connect()
    con.register("docs_pdf", df.toPandas())
    c = "text"
    for name, pat, rep in PII_PATTERNS:
        p = pat.replace("'", "''")  # DuckDB '...' keeps backslashes literal
        c = f"regexp_replace({c}, '{p}', '{rep}', 'g')"
    duck = dict(con.sql(f"SELECT doc_id, {c} FROM docs_pdf").fetchall())
    for i, _, want_text, _ in cases:
        assert duck[i] == want_text, (i, duck[i])


def test_chunk_documents_boundaries(spark):
    """Chunk math: step = chunk - overlap; last chunk is the remainder and
    is only emitted when it adds new tokens; reassembling chunk starts
    covers the doc exactly; a doc shorter than the overlap still yields
    one chunk."""
    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame(
        [(1, mk(10)), (2, mk(24)), (3, mk(25)), (4, mk(100)), (5, mk(3))],
        "doc_id long, text string",
    )
    out = textstats.chunk_documents(df, chunk_tokens=24, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_id"])

    assert [r["start_tok"] for r in by_doc[1]] == [0]          # 10 <= 24
    assert [r["start_tok"] for r in by_doc[2]] == [0]          # exactly one
    assert [r["start_tok"] for r in by_doc[3]] == [0, 16]      # 25 -> 2nd adds 1
    assert by_doc[3][1]["n_tokens"] == 9                       # 8 overlap + 1 new
    # 100 tokens, step 16: starts 0,16,...; last start s has s+8 < 100
    assert [r["start_tok"] for r in by_doc[4]] == [0, 16, 32, 48, 64, 80]
    assert by_doc[4][-1]["n_tokens"] == 20
    assert [r["start_tok"] for r in by_doc[5]] == [0]
    assert by_doc[5][0]["chunk"] == "t0 t1 t2"
    # every token index covered by at least one chunk
    for d, rows in by_doc.items():
        n = {1: 10, 2: 24, 3: 25, 4: 100, 5: 3}[d]
        covered = set()
        for r in rows:
            covered |= set(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
        assert covered == set(range(n)), d


def test_dedup_incremental_statuses(spark):
    """Cross-snapshot dedup: planted history dup, in-batch dup, and fresh
    docs get exactly the right status; 'new' rows are the store's delta."""
    from pyspark.sql import functions as F

    from sentometrics_spark.textops import dedup

    history = spark.createDataFrame(
        [(100, "seen before text"), (101, "another old page")],
        "doc_id long, text string",
    )
    seen = history.select(dedup.hash64(F.col("text")).alias("content_hash"))
    batch = spark.createDataFrame(
        [
            (1, "brand new content"),
            (2, "seen before text"),        # dup vs history
            (3, "brand new content"),       # dup vs doc 1 within batch
            (4, "also fresh stuff"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"]
           for r in dedup.dedup_incremental(batch, seen).collect()}
    assert out == {1: "new", 2: "dup_history", 3: "dup_batch", 4: "new"}
    # folding the delta into the store makes a replayed batch all-dup
    seen2 = seen.unionByName(
        dedup.dedup_incremental(batch, seen)
        .filter("status = 'new'")
        .select("content_hash")
    )
    out2 = {r["doc_id"]: r["status"]
            for r in dedup.dedup_incremental(batch, seen2).collect()}
    assert all(s == "dup_history" for s in out2.values())


def test_lm_cross_entropy(spark):
    """Docs made of corpus-common tokens score lower cross-entropy than a
    rare-token doc; values match a pure-Python replica of the hashed
    add-one LM (md5 bucket variant, replicable outside the JVM)."""
    import hashlib
    import math

    B = 4096
    rows = [(i, "common words appear here often") for i in range(9)]
    rows.append((99, "zyzzyva qwerty flurble"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["cross_entropy_bits"]
           for r in textstats.lm_cross_entropy(docs, buckets=B, hash_fn="md5").collect()}
    assert out[99] > out[0]
    # pure-Python replica of the bucketed LM
    from collections import Counter

    bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B
    c = Counter(bucket(t) for _, txt in rows for t in txt.split(" "))
    N = sum(c.values())
    def H(txt):
        ts = txt.split(" ")
        return -sum(math.log2((c[bucket(t)] + 1) / (N + B)) for t in ts) / len(ts)
    assert abs(out[0] - H("common words appear here often")) < 1e-9
    assert abs(out[99] - H("zyzzyva qwerty flurble")) < 1e-9
    # pinned-LM path: scoring a new batch against the frozen snapshot LM
    lm = textstats.fit_unigram_lm(docs, buckets=B, hash_fn="md5")
    batch = spark.createDataFrame([(7, "common words appear here often")],
                                  "doc_id long, text string")
    pinned = textstats.lm_cross_entropy(
        batch, buckets=B, hash_fn="md5", lm=lm).collect()[0]
    assert abs(pinned["cross_entropy_bits"] - H("common words appear here often")) < 1e-9


def test_dsir_importance_ranks_target_like_docs(spark):
    """Docs sharing the target domain's n-grams get higher log-importance
    than off-domain docs; target rows themselves rank highest."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(10):
        rows.append((i, "finance markets stocks bonds yields", "target"))
    for i in range(10, 20):
        rows.append((i, "cooking recipes pasta garlic butter", "other"))
    rows.append((100, "finance markets stocks looking up", "candidate_like"))
    rows.append((101, "garlic butter cooking tips", "candidate_unlike"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = textstats.dsir_importance(
        docs, F.col("source") == "target", buckets=64
    ).toPandas().set_index("doc_id")["log_weight"]
    assert out[100] > out[101]
    assert out[0] > out[10]


def test_decontaminate_flags_benchmark_overlap(spark):
    """A training doc embedding a benchmark 8-gram is flagged with the
    right hit count; clean docs report 0; the benchmark gram join is a
    broadcast (no cartesian)."""
    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains benchmark 8-grams (2 distinct windows of the run)
            (1, "x alpha beta gamma delta epsilon zeta eta theta iota y"),
            (2, "totally unrelated text about engines and parquet files"),
            # full benchmark text pasted -> 3 shared 8-grams
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    out = dedup.decontaminate(train, bench, n=8).toPandas().set_index("doc_id")
    assert out.loc[1, "n_shared_ngrams"] == 2 and out.loc[1, "contaminated"]
    assert out.loc[2, "n_shared_ngrams"] == 0 and not out.loc[2, "contaminated"]
    assert out.loc[3, "n_shared_ngrams"] == 3 and out.loc[3, "contaminated"]


def test_minhash_arrow_and_expression_kernels_agree(docs_with_dups):
    """The Arrow/numpy banding kernel (production) and the md5 expression
    path (oracle variant) use different hash families but must induce the
    SAME bucket membership for exact duplicates, and both must surface the
    planted near-dups among their candidate pairs."""
    arrow_pairs = {
        (p["id_a"], p["id_b"])
        for p in dedup.minhash_dedup_candidates(
            docs_with_dups, k=32, bands=8, hash_fn="xxhash64"
        ).collect()
    }
    md5_pairs = {
        (p["id_a"], p["id_b"])
        for p in dedup.minhash_dedup_candidates(
            docs_with_dups, k=32, bands=8, hash_fn="md5"
        ).collect()
    }
    # exact dups (identical text) are guaranteed candidates on BOTH kernels
    for i in range(5):
        assert (i, 10_000 + i) in arrow_pairs
        assert (i, 10_000 + i) in md5_pairs
    # near dups (one token changed) surface on both
    arrow_near = {p for p in arrow_pairs if p[0] < 5 and p[1] >= 20_000}
    md5_near = {p for p in md5_pairs if p[0] < 5 and p[1] >= 20_000}
    assert len(arrow_near) >= 4 and len(md5_near) >= 4


def test_minhash_arrow_kernel_null_text_dropped(spark):
    """Null-text rows produce no bands in the Arrow kernel (parity with
    the expression path); identical texts still share every band."""
    docs = spark.createDataFrame(
        [(1, "same text body here"), (2, "same text body here"), (3, None)],
        "doc_id long, text string",
    )
    from sentometrics_spark.textops.dedup import _minhash_banded_arrow

    out = _minhash_banded_arrow(docs, "doc_id", 3, 32, 8).toPandas()
    assert set(out["doc_id"]) == {1, 2}
    a = out[out.doc_id == 1].sort_values("band")["sig"].to_numpy()
    b = out[out.doc_id == 2].sort_values("band")["sig"].to_numpy()
    assert (a == b).all() and len(a) == 8


def test_bloom_dedup_no_false_negatives_and_bounded_fp(spark):
    """Bloom cross-snapshot dedup: every history document MUST test
    maybe_seen=True (no false negatives — the filter's hard guarantee),
    and at the sized m/k/n the fresh-batch false-positive rate stays near
    the analytic (1 - e^{-kn/m})^k."""
    n_hist = 500
    history = spark.range(n_hist).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("historic page "), F.col("id")).alias("text"),
    )
    seen = history.select(dedup.hash64(F.col("text")).alias("content_hash"))
    bloom = dedup.bloom_build(seen, m_bits=1 << 14, k_hashes=4)
    assert bloom["n_items"] == n_hist

    # replaying the history itself: all True, zero false negatives
    replay = dedup.bloom_dedup(history, bloom)
    assert replay.filter(~F.col("maybe_seen")).count() == 0

    # a disjoint fresh batch: expected fp ~ (1-e^{-kn/m})^k ~ 0.00012
    fresh = spark.range(2000).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.concat(F.lit("genuinely new page "), F.col("id")).alias("text"),
    )
    fp = dedup.bloom_dedup(fresh, bloom).filter(F.col("maybe_seen")).count()
    assert fp <= 10  # 0.5% — 40x the analytic rate, deterministic hashes

    # two-tier plan: maybe set -> exact join resolves fp to certainty
    maybe = dedup.bloom_dedup(fresh, bloom).filter(F.col("maybe_seen"))
    exact = maybe.join(seen, "content_hash", "left_semi")
    assert exact.count() == 0


def test_bloom_contains_is_map_only(spark):
    """The membership test must be a pure map over the batch — no
    Exchange, no Python UDF (the history was folded at build time)."""
    history = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id")).alias("text")
    )
    seen = history.select(dedup.hash64(F.col("text")).alias("content_hash"))
    bloom = dedup.bloom_build(seen, m_bits=1 << 10, k_hashes=3)
    batch = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("b"), F.col("id")).alias("text"),
    )
    plan = dedup.bloom_dedup(batch, bloom)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_bloom_build_rejects_bad_m(spark):
    seen = spark.range(1).select(F.col("id").alias("content_hash"))
    with pytest.raises(ValueError):
        dedup.bloom_build(seen, m_bits=100)


def test_temperature_sampling_rates_and_determinism(spark):
    """τ=0.5 tempering: selected fractions track the tempered multinomial
    (small sources upsampled relative to big ones), the whole pass is
    deterministic in the seed, and τ=1/target=1 keeps everything."""
    from sentometrics_spark.textops import sampling

    rows = [(i, "t", "big" if i < 9000 else "small") for i in range(10000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    out = sampling.sample_by_source_temperature(docs, tau=0.5, target_frac=0.5)
    got = {
        (r["source"], r["selected"]): r["n"]
        for r in out.groupBy("source", "selected").count()
        .withColumnRenamed("count", "n").collect()
    }
    # analytic: w_big = sqrt(9000)/(sqrt(9000)+sqrt(1000)) = 0.75, k_big = 3750
    # w_small = 0.25 -> k_small = 1250 > n_small? no: 1250 > 1000 -> capped, all kept
    frac_big = got[("big", True)] / 9000
    assert abs(frac_big - 3750 / 9000) < 0.02  # hash-uniformity tolerance
    assert ("small", False) not in got  # capped at rate 1 -> all kept
    # deterministic: identical subset on re-run
    again = sampling.sample_by_source_temperature(docs, tau=0.5, target_frac=0.5)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    # tau=1, target=1: natural distribution at full budget keeps everything
    full = sampling.sample_by_source_temperature(docs, tau=1.0, target_frac=1.0)
    assert full.filter("NOT selected").count() == 0
    with pytest.raises(ValueError):
        sampling.temperature_rates({"a": 10}, 0.5, 0.0)


def test_temperature_sampling_is_map_only_after_counts(spark):
    from sentometrics_spark.textops import sampling

    docs = spark.createDataFrame(
        [(i, "t", "s" + str(i % 3)) for i in range(100)],
        "doc_id long, text string, source string",
    )
    out = sampling.sample_by_source_temperature(docs, tau=0.5, target_frac=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_pack_documents_layout(spark):
    """Hand-checkable stream: budget 10, three docs of 4/8/3 tokens ->
    offsets 0/4/12; doc 2 straddles packs 0-1, doc 3 sits in pack 1."""
    from sentometrics_spark.textops import sampling

    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 4), "s"),
            (2, " ".join(["w"] * 8), "s"),
            (3, " ".join(["w"] * 3), "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: (r["start_offset"], r["pack_first"], r["pack_last"], r["n_packs"])
        for r in sampling.pack_documents(docs, budget=10).collect()
    }
    assert out[1] == (0, 0, 0, 1)
    assert out[2] == (4, 0, 1, 2)   # tokens [4,12) straddles the 10 boundary
    assert out[3] == (12, 1, 1, 1)


def test_pack_documents_shards_are_independent_streams(spark):
    """shards=2 splits by doc_id parity; each stream's offsets restart at
    0 and the union of pack contents covers every token exactly once
    within its stream."""
    from sentometrics_spark.textops import sampling

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1)), "s") for i in range(6)],
        "doc_id long, text string, source string",
    )
    out = sampling.pack_documents(docs, budget=5, shards=2).toPandas()
    for shard, grp in out.groupby("shard"):
        g = grp.sort_values("doc_id")
        assert g["start_offset"].iloc[0] == 0
        # contiguous: each start = previous start + previous n_tokens
        exp = g["n_tokens"].cumsum().shift(1).fillna(0).astype(int)
        assert (g["start_offset"].to_numpy() == exp.to_numpy()).all()
    with pytest.raises(ValueError):
        sampling.pack_documents(docs, budget=0)


def test_split_train_val_test_stable_and_stratified(spark):
    from sentometrics_spark.textops import sampling

    rows = [(i, "t", "s" + str(i % 4)) for i in range(8000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sampling.split_train_val_test(docs, (0.8, 0.1, 0.1))
    frac = {r["split"]: r["n"] for r in
            out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(frac["train"] / 8000 - 0.8) < 0.02
    assert abs(frac["val"] / 8000 - 0.1) < 0.01
    assert abs(frac["test"] / 8000 - 0.1) < 0.01
    # per-source stratification for free (hash uniform within stratum)
    per_src = out.filter("split = 'train'").groupBy("source").count().collect()
    for r in per_src:
        assert abs(r["count"] / 2000 - 0.8) < 0.04
    # growth stability: adding documents never moves existing assignments
    bigger = spark.createDataFrame(
        rows + [(10_000 + i, "t", "new") for i in range(1000)],
        "doc_id long, text string, source string",
    )
    out2 = sampling.split_train_val_test(bigger, (0.8, 0.1, 0.1))
    moved = (
        out.select("doc_id", "split")
        .join(out2.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter("split != s2").count()
    )
    assert moved == 0
    with pytest.raises(ValueError):
        sampling.split_train_val_test(docs, (0.5, 0.2, 0.2))


def test_vocab_top_ranks_and_ties(spark):
    from sentometrics_spark.textops import sampling

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d d B")],  # lowercased: b:4 a:3 d:2 c:1
        "doc_id long, text string",
    )
    out = {r["token"]: (r["n"], r["rank"])
           for r in sampling.vocab_top(docs, v=3).collect()}
    assert out == {"b": (4, 1), "a": (3, 2), "d": (2, 3)}
    # tie determinism: equal counts rank alphabetically
    docs2 = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    r = {q["token"]: q["rank"] for q in sampling.vocab_top(docs2, v=2).collect()}
    assert r == {"x": 1, "y": 2}


def test_cap_per_group_deterministic_and_prefilter(spark):
    from sentometrics_spark.textops.sampling import cap_per_group

    docs = spark.createDataFrame(
        [(i, f"s{i % 4}" if i < 80 else "tiny", f"doc {i}") for i in range(85)],
        "doc_id long, source string, text string",
    )
    kept = cap_per_group(docs, cap=5, group_col="source").toPandas()
    # every big group capped at 5; the 5-doc 'tiny' group survives whole
    sizes = kept.groupby("source").size().to_dict()
    assert sizes == {"s0": 5, "s1": 5, "s2": 5, "s3": 5, "tiny": 5}
    # deterministic: same kept set on a REORDERED input
    kept2 = cap_per_group(
        docs.orderBy(F.desc("doc_id")), cap=5, group_col="source"
    ).toPandas()
    assert sorted(kept2.doc_id) == sorted(kept.doc_id)
    # prefilter path selects the identical set
    kept3 = cap_per_group(docs, cap=5, group_col="source", prefilter=True).toPandas()
    assert sorted(kept3.doc_id) == sorted(kept.doc_id)
    # growing the corpus only EVICTS by hash rank, never swaps survivors
    # arbitrarily: survivors of the grown corpus that existed before are
    # a subset of the original kept set
    grown = docs.union(spark.createDataFrame(
        [(1000 + i, f"s{i % 4}", f"new {i}") for i in range(40)],
        "doc_id long, source string, text string",
    ))
    kept4 = cap_per_group(grown, cap=5, group_col="source").toPandas()
    old_survivors = set(kept4.doc_id) & set(range(85))
    assert old_survivors <= set(kept.doc_id)
    # different seed -> different (still deterministic) sample
    kept5 = cap_per_group(docs, cap=5, group_col="source", seed=99).toPandas()
    assert sorted(kept5.doc_id) != sorted(kept.doc_id)
    with pytest.raises(ValueError):
        cap_per_group(docs, cap=0)
