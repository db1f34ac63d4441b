"""Bridge to the reference package's shipped data (.rda) for golden
cross-validation.

Loads ``usnews``, ``list_lexicons``, ``list_valence_shifters`` and the
frozen golden scores ``inst/extdata/test_data.rda`` via the pure-Python
reader in :mod:`sentometrics_spark.rdata`, and rebuilds
:class:`~sentometrics_spark.lexicons.Lexicons` objects with exactly the
reference's ``sento_lexicons`` preprocessing
(/root/reference/R/sentolexicons.R:64-116 + ``sento_as_key``
/root/reference/R/utils.R:454-487):

  - lexicon terms: lowercase, duplicates dropped (all copies), multiword
    (whitespace) entries dropped, y as double;
  - valence shifters: x lowercased, multiword and duplicated entries
    dropped (first kept); 3-column (x,y,t) input keeps (x,y) — bigram
    mode; 2-column (x,t) input drives cluster mode;
  - ``do.split``: each lexicon forked into _POS (y>0) / _NEG (y<0).

These functions exist for tests and driver-gate queries; nothing here is
on a hot path.
"""

from __future__ import annotations

import os

import pandas as pd

from sentometrics_spark.lexicons import Lexicons
from sentometrics_spark.rdata import read_rda

REFERENCE_ROOT = os.environ.get("SENTO_REFERENCE_ROOT", "/root/reference")


def _p(*parts: str) -> str:
    return os.path.join(REFERENCE_ROOT, *parts)


def reference_data_available() -> bool:
    return os.path.exists(_p("data", "usnews.rda"))


def load_usnews() -> pd.DataFrame:
    """usnews corpus: id, date, texts, wsj, wapo, economy, noneconomy."""
    return read_rda(_p("data", "usnews.rda"))["usnews"]


def load_list_lexicons() -> dict[str, pd.DataFrame]:
    return read_rda(_p("data", "list_lexicons.rda"))["list_lexicons"]


def load_valence_shifters() -> dict[str, pd.DataFrame]:
    return read_rda(_p("data", "list_valence_shifters.rda"))[
        "list_valence_shifters"]


def load_test_data() -> dict[str, pd.DataFrame]:
    """Frozen golden sentiment tables s1..s12 (250 usnews docs), generated
    by the reference package itself
    (/root/reference/tests/testthat/test_sentiment_computation.R:49,75-101)."""
    return read_rda(_p("inst", "extdata", "test_data.rda"))["test_data"]


def sento_as_key(df: pd.DataFrame) -> dict[str, float]:
    """sento_as_key + the only-unigram filter
    (/root/reference/R/utils.R:454-487, R/sentolexicons.R:96): duplicated
    terms dropped entirely, lowercased, whitespace entries dropped."""
    x = df.iloc[:, 0].astype(str)
    y = df.iloc[:, 1].astype(float)
    dup_terms = set(x[x.duplicated(keep=False)])
    out: dict[str, float] = {}
    for term, val in zip(x, y):
        if term in dup_terms:
            continue
        term = term.lower()
        if any(c.isspace() for c in term):
            continue
        out[term] = float(val)
    return out


def _valence_map(df: pd.DataFrame, use: str) -> dict[str, tuple[float, int]]:
    """Valence table prep (/root/reference/R/sentolexicons.R:98-111):
    lowercase, drop multiword + duplicated (keep first). use='y' -> bigram
    values (t unused, 0); use='t' -> cluster types (y unused, 1.0)."""
    out: dict[str, tuple[float, int]] = {}
    for _, row in df.iterrows():
        w = str(row["x"]).lower()
        if any(c.isspace() for c in w) or w in out:
            continue
        if use == "y":
            out[w] = (float(row["y"]), 0)
        else:
            out[w] = (1.0, int(row["t"]))
    return out


def build_reference_lexicons(
    names: tuple[str, ...] = ("GI_en", "LM_en", "HENRY_en"),
    valence: str | None = None,
    split: bool = False,
    lang: str = "en",
) -> Lexicons:
    """The test suite's lexicon objects. valence: None | 'y' (bigram,
    columns x,y of list_valence_shifters[lang]) | 't' (cluster, columns
    x,t) — mirroring lex / lexSplit / lexClust in
    /root/reference/tests/testthat/test_sentiment_computation.R:37-43."""
    ll = load_list_lexicons()
    lex = {lang: {n: sento_as_key(ll[n]) for n in names}}
    val: dict = {}
    use = "y"
    if valence is not None:
        use = valence
        val = {lang: _valence_map(load_valence_shifters()[lang], valence)}
    out = Lexicons(lex=lex, valence=val, valence_use=use)
    if split:
        out = out.split_pos_neg()
    return out


def usnews_pages(n: int = 250, lang: str = "en") -> pd.DataFrame:
    """First n usnews docs in the engine's corpus shape: url, warc_ts,
    lang, text + the four feature columns (feat_-prefixed, the engine's
    feature-column convention)."""
    us = load_usnews().iloc[:n]
    return pd.DataFrame(
        {
            "url": us["id"].astype(str).to_numpy(),
            "warc_ts": pd.to_datetime(us["date"]),
            "lang": lang,
            "text": us["texts"].astype(str).to_numpy(),
            "feat_wsj": us["wsj"].to_numpy(),
            "feat_wapo": us["wapo"].to_numpy(),
            "feat_economy": us["economy"].to_numpy(),
            "feat_noneconomy": us["noneconomy"].to_numpy(),
        }
    )


# C8 multi-language coverage: the package ships native-or-translated
# variants of each lexicon for en/fr/nl (/root/reference/data/
# list_lexicons.rda — FEEL_fr is native French, *_tr are machine
# translations shipped by the package itself) plus valence shifters for
# all three languages. The engine requires an identical lexicon-name set
# across languages, so the variants are registered under shared names.
MULTILANG_LEXICON_NAMES: dict[str, dict[str, str]] = {
    "en": {"GI": "GI_en", "LM": "LM_en", "HENRY": "HENRY_en", "FEEL": "FEEL_en_tr"},
    "fr": {"GI": "GI_fr_tr", "LM": "LM_fr_tr", "HENRY": "HENRY_fr_tr", "FEEL": "FEEL_fr"},
    "nl": {"GI": "GI_nl_tr", "LM": "LM_nl_tr", "HENRY": "HENRY_nl_tr", "FEEL": "FEEL_nl_tr"},
}


def build_multilang_lexicons(valence: str | None = "y") -> Lexicons:
    """en/fr/nl Lexicons from the package's own shipped tables, with the
    per-language valence shifters; same sento_lexicons preprocessing as
    the single-language builder."""
    ll = load_list_lexicons()
    lex = {
        lang: {shared: sento_as_key(ll[src]) for shared, src in names.items()}
        for lang, names in MULTILANG_LEXICON_NAMES.items()
    }
    val: dict = {}
    use = "y"
    if valence is not None:
        use = valence
        vs = load_valence_shifters()
        val = {lang: _valence_map(vs[lang], valence) for lang in lex}
    return Lexicons(lex=lex, valence=val, valence_use=use)


def usnews_pages_multilang(n: int = 150) -> pd.DataFrame:
    """First n usnews docs with langs assigned round-robin en/fr/nl —
    exercises per-language lexicon dispatch (C8) on real text. The fr/nl
    'documents' are English prose, but the shipped fr/nl lexicons share
    enough surface forms with English (FEEL_fr matches ~7% of usnews
    tokens) that scores are non-trivially nonzero; the point is that the
    engine's per-language dispatch, valence shifting and denominators
    agree with an independent oracle on every row."""
    pdf = usnews_pages(n)
    langs = ["en", "fr", "nl"]
    pdf["lang"] = [langs[i % 3] for i in range(len(pdf))]
    return pdf


def read_rda_epu() -> pd.DataFrame:
    """The shipped monthly EPU index (data/epu.rda): date (days since
    1970-01-01), index (double), above / aboveMulti (factors) — plus a
    'month' Period column for joining against monthly measures."""
    epu = read_rda(_p("data", "epu.rda"))["epu"].copy()
    epu["date"] = pd.to_datetime("1970-01-01") + pd.to_timedelta(
        epu["date"].astype(int), unit="D"
    )
    epu["month"] = epu["date"].dt.to_period("M")
    return epu
