"""Driver-side modeling layer (R1-R8): elastic net, calibration, rolling
iteration, and the attribution reconciliation invariant
(/root/reference/tests/testthat/test_attribution.R:47-60)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sentometrics_spark.model.elasticnet import (
    ModelCtr,
    align_variables,
    clean_panel,
    create_cv_slices,
    elastic_net_cd,
    sento_model,
    sento_model_iter,
)


def _synth(n=200, p=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.normal(size=(n, p))
    beta = np.zeros(p)
    beta[:3] = [1.5, -2.0, 0.7]
    y = X @ beta + 0.5 + rng.normal(scale=0.1, size=n)
    return pd.Series(y), pd.DataFrame(X, columns=[f"x{i}" for i in range(p)]), beta


def test_elastic_net_recovers_signal():
    y, X, beta = _synth()
    coefs, b0 = elastic_net_cd(X.to_numpy(), y.to_numpy(), alpha=1.0, lam=0.01)
    assert b0 == pytest.approx(0.5, abs=0.1)
    np.testing.assert_allclose(coefs[:3], beta[:3], atol=0.15)
    assert np.abs(coefs[3:]).max() < 0.05


def test_lasso_sparsity_increases_with_lambda():
    y, X, _ = _synth()
    c1, _ = elastic_net_cd(X.to_numpy(), y.to_numpy(), alpha=1.0, lam=0.01)
    c2, _ = elastic_net_cd(X.to_numpy(), y.to_numpy(), alpha=1.0, lam=1.0)
    assert (c2 != 0).sum() <= (c1 != 0).sum()


def test_sento_model_calibration():
    y, X, beta = _synth()
    for cal in ("BIC", "AIC", "Cp"):
        m = sento_model(y, X, ModelCtr(calibration=cal, alphas=(0.5, 1.0), n_lambdas=20))
        pred = m.predict(X)
        r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert r2 > 0.9, f"{cal}: r2={r2}"


def test_sento_model_cv():
    y, X, _ = _synth(n=120)
    m = sento_model(y, X, ModelCtr(calibration="cv", alphas=(1.0,), n_lambdas=10, cv_train=40, cv_test=10))
    assert m.criterion < 0.1


def test_align_and_clean():
    y = pd.Series(np.arange(10, dtype=float))
    X = pd.DataFrame({"a": np.arange(10, dtype=float), "b": np.zeros(10), "c": np.arange(10, dtype=float)})
    y2, X2 = align_variables(y, X, h=2)
    assert len(y2) == 8 and len(X2) == 8
    assert y2.iloc[0] == 2.0 and X2["a"].iloc[0] == 0.0
    Xc = clean_panel(X)
    assert "b" not in Xc.columns  # all zeros
    assert list(Xc.columns) == ["a"]  # c duplicates a


def test_cv_slices():
    s = create_cv_slices(30, 10, 5)
    assert len(s) == 4
    for tr, te in s:
        assert tr.max() < te.min() and len(tr) == 10 and len(te) == 5


def test_model_iter_metrics():
    y, X, _ = _synth(n=80)
    out = sento_model_iter(y, X, ModelCtr(alphas=(1.0,), n_lambdas=10), n_windows=5, window=60)
    assert len(out) == 5
    assert out.attrs["RMSFE"] < 0.5


def test_attribution_reconciliation(spark, pages, lexicons):
    """Per-date sums of document / lag / lexicon / feature / timeweight
    attributions must all equal pred - intercept."""
    from sentometrics_spark.aggregate.doc_agg import aggregate_docs, doc_weights
    from sentometrics_spark.aggregate.kernels import setup_time_weights
    from sentometrics_spark.aggregate.time_agg import aggregate_time, measures_fill
    from sentometrics_spark.config import TimeKernelSpec
    from sentometrics_spark.lexicons import Lexicons
    from sentometrics_spark.model.attribution import (
        attributions_dims,
        attributions_docs,
        attributions_lags,
        coef_df,
    )
    from sentometrics_spark.scoring.algebraic import compute_sentiment_algebraic

    lag, by = 3, "week"
    lex = Lexicons(lex=lexicons.lex)
    sent = compute_sentiment_algebraic(pages, lex, "proportional").cache()
    docagg = aggregate_docs(sent, by=by, how="proportional", keep_partials=False)
    filled = measures_fill(
        docagg.select("bucket_ts", "lexicon", "feature", "value"), by=by, fill="zero"
    ).cache()
    kernels = setup_time_weights((TimeKernelSpec("equal_weight"), TimeKernelSpec("linear")), lag)
    measures = aggregate_time(filled, kernels, lag).cache()

    # synthetic coefficients (fixed, no fitting needed for the invariant)
    dims = measures.select("lexicon", "feature", "timeweight").distinct().collect()
    coefs = pd.Series(
        {f'{r["lexicon"]}--{r["feature"]}--{r["timeweight"]}': 0.1 * (i + 1) for i, r in enumerate(sorted(dims, key=str))}
    )
    cdf = coef_df(spark, coefs)

    pred = (
        measures.join(F.broadcast(cdf), ["lexicon", "feature", "timeweight"])
        .groupBy("bucket_ts")
        .agg(F.sum(F.col("coef") * F.col("value")).alias("total"))
        .toPandas()
        .set_index("bucket_ts")["total"]
        .sort_index()
    )

    for dim in ("lexicon", "feature", "timeweight"):
        a = (
            attributions_dims(measures, cdf, dim)
            .groupBy("bucket_ts")
            .agg(F.sum("attrib").alias("s"))
            .toPandas()
            .set_index("bucket_ts")["s"]
            .sort_index()
        )
        np.testing.assert_allclose(a.to_numpy(), pred.to_numpy(), atol=1e-9)

    lags = (
        attributions_lags(filled, cdf, kernels, lag)
        .groupBy("pred_ts")
        .agg(F.sum("attrib").alias("s"))
        .toPandas()
        .set_index("pred_ts")["s"]
        .sort_index()
    )
    np.testing.assert_allclose(lags.to_numpy(), pred.to_numpy(), atol=1e-9)

    w = doc_weights(sent, by=by, how="proportional")
    docs = (
        attributions_docs(sent, w, filled, cdf, kernels, lag, by)
        .groupBy("pred_ts")
        .agg(F.sum("attrib").alias("s"))
        .toPandas()
        .set_index("pred_ts")["s"]
        .sort_index()
    )
    np.testing.assert_allclose(docs.to_numpy(), pred.to_numpy(), atol=1e-9)
