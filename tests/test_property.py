"""Property-based tests: random token sequences, every engine vs the
independent per-token oracle (no Spark — pure kernel checks, so hypothesis
can run hundreds of cases)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sentometrics_spark.config import HOWS_WITHIN
from sentometrics_spark.lexicons import Lexicons
from sentometrics_spark.scoring.udf_engine import (
    flat_from_texts,
    flat_from_tokens,
    score_flat,
    score_language_batch,
)

from tests import oracle as orc

LEX = Lexicons(
    lex={
        "en": {
            "A": {"good": 1.0, "bad": -1.0, "fine": 0.5},
            "B": {"good": 2.0, "ugly": -1.5},
        }
    },
    valence={"en": {"not": (-1.0, 1), "very": (1.8, 2), "barely": (0.4, 3), "but": (1.0, 4)}},
)
PACK = LEX.pack("en")
VOCAB = ["good", "bad", "fine", "ugly", "not", "very", "barely", "but", "x", "y", "zz"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=30), min_size=1, max_size=8
)


def _oracle_scores(tokens, how, mode, tfidf=None):
    lexmap = LEX.lex["en"]
    valence = {w: yt for w, yt in LEX.valence["en"].items()}
    out = np.zeros((len(tokens), 2))
    for i, doc in enumerate(tokens):
        _, scores = orc.score_doc(doc, lexmap, valence, how, mode, tfidf)
        out[i] = [scores["A"], scores["B"]]
    return out


@settings(max_examples=60, deadline=None)
@given(docs_strategy, st.sampled_from(HOWS_WITHIN), st.sampled_from(["unigram", "bigram", "cluster"]))
def test_engines_match_oracle(tokens, how, mode):
    tfidf = None
    if how == "TFIDF":
        df_map = {}
        for doc in tokens:
            for t in set(doc):
                df_map[t] = df_map.get(t, 0.0) + 1.0
        tfidf = (float(len(tokens)), df_map)
    lens, got = score_language_batch(tokens, PACK, how, mode, tfidf)
    exp = _oracle_scores(tokens, how, mode, tfidf)
    np.testing.assert_array_equal(lens, [len(t) for t in tokens])
    np.testing.assert_allclose(got, exp, atol=1e-10, rtol=1e-9)


@settings(max_examples=40, deadline=None)
@given(docs_strategy, st.sampled_from(["counts", "proportional", "UShaped", "proportionalPol"]))
def test_flat_front_ends_agree(tokens, how):
    """flat_from_tokens and the arrow flat_from_texts must produce identical
    scores when the texts are re-joined with spaces."""
    import pandas as pd

    texts = pd.Series([" ".join(doc) for doc in tokens])
    f1 = flat_from_tokens(tokens, PACK)
    f2 = flat_from_texts(texts, PACK)
    for mode in ("unigram", "bigram"):
        s1 = score_flat(f1, PACK, how, mode)
        s2 = score_flat(f2, PACK, how, mode)
        np.testing.assert_allclose(s1, s2, atol=0.0)  # bit-identical
