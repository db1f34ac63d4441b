"""Pluggable word-segmentation hook for dictionary-segmented scripts
(zh/ja/th/lo/km/my — the T1 residual).

The built-in tokenizer (scoring/tokenize.py) implements UAX-29 RULE
segmentation; ICU additionally segments ideograph/Thai runs by DICTIONARY
(the reference reaches it through ``stringi::stri_split_boundaries``,
/root/reference/R/sentiment_engines.R:13-17), which needs language data this
engine does not ship. The supported path is therefore caller-supplied
segmentation feeding the T3 ``tokens_col=`` passthrough
(/root/reference/R/sentiment_engines.R:11-12,234-240):

    lex  = Lexicons(lex={"zh": ...}, pretokenized_langs={"zh"})
    docs = segment_corpus(pages, {"zh": jieba.lcut})
    out  = compute_sentiment_udf(docs, lex, tokens_col="tokens")

``segment_corpus`` applies a per-language jieba-style callable
(``text -> list[str]``) where one is registered and the built-in UAX-29
tokenizer everywhere else, so a mixed-language corpus scores consistently
in one pass. Scale shape: a single map-only mapInPandas — the segmenter
callables travel in the task closure, there is no shuffle, and rows are
processed in Arrow batches (the per-row Python call is inherent to
dictionary segmenters like jieba, which are themselves Python/C hybrids).
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame

from sentometrics_spark.scoring.tokenize import tokenize_to_lists

Segmenter = Callable[[str], list]


def segment_corpus(
    pages: DataFrame,
    segmenters: dict[str, Segmenter],
    text_col: str = "text",
    out_col: str = "tokens",
    lang_col: str = "lang",
) -> DataFrame:
    """Add an ``array<string>`` column of word tokens, using the registered
    per-language segmenter where one exists and the built-in UAX-29
    tokenizer otherwise. Segmenter output is lowercased and
    empty/whitespace tokens are dropped, matching the invariants the
    scoring kernels assume of the internal tokenizer (lexicon entries are
    lowercase by construction)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    segmenters = {str(k).split("-")[0].lower(): v for k, v in segmenters.items()}
    schema = StructType(
        list(pages.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            langs = pdf[lang_col].astype(str).str.split("-").str[0].str.lower()
            toks: list = [None] * len(pdf)
            custom = langs.isin(segmenters.keys())
            texts = pdf[text_col]
            for i in (idx for idx, c in enumerate(custom) if c):
                seg = segmenters[langs.iloc[i]]
                raw = seg(texts.iloc[i] if texts.iloc[i] is not None else "")
                toks[i] = [w for w in (str(t).strip().lower() for t in raw) if w]
            rest = [i for i, c in enumerate(custom) if not c]
            if rest:
                built_in = tokenize_to_lists(
                    [texts.iloc[i] if texts.iloc[i] is not None else "" for i in rest]
                )
                for i, ts in zip(rest, built_in):
                    toks[i] = ts
            out = pdf.copy()
            out[out_col] = toks
            yield out

    return pages.mapInPandas(gen, schema)


def longest_match_segmenter(vocab: Iterable[str]) -> Segmenter:
    """Reference implementation of the hook interface: greedy forward
    longest-match over a closed dictionary (the classic forward maximum
    matching baseline for Chinese word segmentation — public algorithm).
    Characters outside any dictionary word become single-char tokens;
    spaced runs split on whitespace first so mixed zh/latin text degrades
    sanely. Real deployments register jieba.lcut / a MeCab or ICU wrapper
    instead; this exists so the hook is testable without those packages."""
    words = set(vocab)
    max_len = max((len(w) for w in words), default=1)

    def seg(text: str) -> list:
        out: list = []
        for run in str(text).split():
            i, n = 0, len(run)
            while i < n:
                for l in range(min(max_len, n - i), 0, -1):
                    if run[i : i + l] in words:
                        out.append(run[i : i + l])
                        i += l
                        break
                else:
                    out.append(run[i])
                    i += 1
        return out

    return seg
