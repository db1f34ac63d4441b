"""Driver-side sparse regression layer (R1-R7): elastic net via coordinate
descent in numpy (no sklearn in this container), information-criterion /
time-series-CV calibration, rolling re-estimation.

The measures panel is small (#buckets x #measures), so this runs on the
collected pivot — the same topology as the reference, where glmnet runs
in-process on the assembled panel (/root/reference/R/sentomodel.R:313-503).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class ModelCtr:
    """R1: model-control validation (ctr_model, /root/reference/R/sentomodel.R:86-178).
    Families: gaussian | binomial (y in {0,1}) | multinomial (y categorical,
    symmetric softmax elastic net — glmnet family='multinomial' semantics)."""

    model: str = "gaussian"
    calibration: str = "BIC"  # BIC | AIC | Cp | cv
    alphas: tuple[float, ...] = (0.0, 0.25, 0.5, 0.75, 1.0)
    n_lambdas: int = 50
    h: int = 0  # prediction horizon
    do_difference: bool = False
    cv_train: int = 20
    cv_test: int = 5

    def __post_init__(self) -> None:
        if self.model not in ("gaussian", "binomial", "multinomial"):
            raise ValueError(f"unsupported model family: {self.model}")
        if self.calibration not in ("BIC", "AIC", "Cp", "cv"):
            raise ValueError(f"unknown calibration: {self.calibration}")
        if any(a < 0 or a > 1 for a in self.alphas):
            raise ValueError("alphas must lie in [0, 1]")


def align_variables(y: pd.Series, X: pd.DataFrame, h: int = 0, do_difference: bool = False):
    """R2: shift y forward by horizon h relative to X
    (align_variables, /root/reference/R/utils.R:223-269).

    Differencing semantics follow the reference exactly: with h > 0 and
    difference=TRUE the target is diff(y, lag = h) (y_{t+h} - y_t), NOT a
    lag-1 diff shifted by h; with h == 0 the difference flag is ignored
    (the reference only differences inside the h != 0 branches)."""
    if h > 0:
        if do_difference:
            # R diff(y, lag = h): values y[h:] - y[:-h], length n - h
            y_al = y.diff(h).iloc[h:].reset_index(drop=True)
        else:
            y_al = y.iloc[h:].reset_index(drop=True)
        X_al = X.iloc[: len(y_al)].reset_index(drop=True)
    elif h < 0:
        X_al = X.iloc[-h:].reset_index(drop=True)
        if do_difference:
            y_al = y.diff(-h).iloc[-h:].reset_index(drop=True)
        else:
            y_al = y.iloc[: len(X_al)].reset_index(drop=True)
    else:
        y_al, X_al = y.reset_index(drop=True), X.reset_index(drop=True)
    n = min(len(y_al), len(X_al))
    return y_al.iloc[:n], X_al.iloc[:n]


def clean_panel(X: pd.DataFrame, threshold: float = 0.5) -> pd.DataFrame:
    """R3: drop duplicated columns and columns with > threshold zeros
    (clean_panel, /root/reference/R/utils.R:271-296)."""
    X = X.loc[:, ~X.T.duplicated()]
    frac_zero = (X == 0).mean()
    return X.loc[:, frac_zero <= threshold]


def _soft(z: float, g: float) -> float:
    if z > g:
        return z - g
    if z < -g:
        return z + g
    return 0.0


def elastic_net_cd(
    X: np.ndarray,
    y: np.ndarray,
    alpha: float,
    lam: float,
    tol: float = 1e-8,
    max_iter: int = 1000,
    warm: np.ndarray | None = None,
) -> tuple[np.ndarray, float]:
    """Standardized coordinate-descent elastic net (glmnet objective:
    1/(2n)||y - b0 - Xb||^2 + lam*(alpha*|b|_1 + (1-alpha)/2*|b|_2^2))."""
    n, p = X.shape
    xm, xs = X.mean(0), X.std(0)
    xs[xs == 0] = 1.0
    Xs = (X - xm) / xs
    ym = y.mean()
    yc = y - ym
    b = np.zeros(p) if warm is None else warm.copy()
    r = yc - Xs @ b
    for _ in range(max_iter):
        delta = 0.0
        for j in range(p):
            bj = b[j]
            z = (Xs[:, j] @ r) / n + bj
            bn = _soft(z, lam * alpha) / (1.0 + lam * (1 - alpha))
            if bn != bj:
                r += Xs[:, j] * (bj - bn)
                b[j] = bn
                delta = max(delta, abs(bn - bj))
        if delta < tol:
            break
    coefs = b / xs
    intercept = ym - float(xm @ coefs)
    return coefs, intercept


def logistic_enet_cd(
    X: np.ndarray,
    y: np.ndarray,
    alpha: float,
    lam: float,
    tol: float = 1e-7,
    max_outer: int = 50,
    max_inner: int = 200,
    warm: np.ndarray | None = None,
) -> tuple[np.ndarray, float]:
    """Binomial elastic net, glmnet-style: outer IRLS quadratic
    approximation, inner weighted coordinate descent on standardized X
    (/root/reference/R/sentomodel.R:86-178 accepts family='binomial' and
    delegates to glmnet; this is the from-scratch equivalent)."""
    n, p = X.shape
    xm, xs = X.mean(0), X.std(0)
    xs[xs == 0] = 1.0
    Xs = (X - xm) / xs
    b = np.zeros(p) if warm is None else warm.copy()
    pbar = min(max(float(y.mean()), 1e-4), 1 - 1e-4)
    b0 = float(np.log(pbar / (1 - pbar)))
    for _ in range(max_outer):
        eta = Xs @ b + b0
        pv = 1.0 / (1.0 + np.exp(-np.clip(eta, -30, 30)))
        pv = np.clip(pv, 1e-5, 1 - 1e-5)
        w = pv * (1.0 - pv)
        z = eta + (y - pv) / w
        wn = w / n
        col_den = (wn * Xs.T**2).sum(axis=1)  # sum w x_j^2 / n per column
        r = z - Xs @ b - b0
        for _ in range(max_inner):
            delta = 0.0
            for j in range(p):
                bj = b[j]
                zj = float((wn * Xs[:, j]) @ r) + col_den[j] * bj
                bn = _soft(zj, lam * alpha) / (col_den[j] + lam * (1 - alpha))
                if bn != bj:
                    r += Xs[:, j] * (bj - bn)
                    b[j] = bn
                    delta = max(delta, abs(bn - bj))
            b0_new = b0 + float((wn @ r) / wn.sum())
            r += b0 - b0_new
            b0 = b0_new
            if delta < tol:
                break
        if float(np.abs(Xs @ b + b0 - eta).max()) < 1e-6:
            break
    coefs = b / xs
    intercept = b0 - float(xm @ coefs)
    return coefs, intercept


def multinomial_enet_cd(
    X: np.ndarray,
    Y: np.ndarray,
    alpha: float,
    lam: float,
    tol: float = 1e-7,
    max_outer: int = 60,
    max_inner: int = 200,
    warm: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """SYMMETRIC multinomial elastic net, glmnet-style (Friedman, Hastie &
    Tibshirani 2010 §4 "Regularized multinomial regression"; the reference
    delegates to glmnet family='multinomial',
    /root/reference/R/sentomodel.R:313-367): full softmax likelihood over K
    class coefficient vectors, fit by block coordinate descent — cycle over
    classes, each class taking a partial quadratic (IRLS) approximation
    with probabilities from the CURRENT full softmax, then inner weighted
    coordinate descent on that class's column. This differs from
    one-vs-rest: each class's working response depends on ALL classes'
    coefficients through the softmax, so the selected supports can differ.

    The symmetric parametrization is unidentified under per-feature shifts;
    for penalized coefficients the elastic-net penalty itself picks the
    minimal-penalty representative (strictly so for alpha<1), and the
    unpenalized intercepts are centered to mean zero each outer cycle (the
    glmnet convention). Returns (B [p,K] on the original scale, b0 [K])."""
    n, p = X.shape
    K = Y.shape[1]
    xm, xs = X.mean(0), X.std(0)
    xs[xs == 0] = 1.0
    Xs = (X - xm) / xs
    if warm is not None:
        # warm carries this function's RETURN values, which are descaled to
        # the original X scale (coefs = B/xs, b0_out = b0 - coefs.T @ xm).
        # The solver iterates in standardized space (eta = Xs @ B + b0), so
        # invert the output transform; passing the returned values through
        # unscaled would warm-start from the wrong point (ADVICE r3).
        coefs_w = warm[0]
        B = coefs_w * xs[:, None]
        b0 = warm[1] + coefs_w.T @ xm
    else:
        B = np.zeros((p, K))
        pri = np.clip(Y.mean(0), 1e-4, 1.0)
        b0 = np.log(pri)
        b0 -= b0.mean()
    eta = Xs @ B + b0
    for _ in range(max_outer):
        eta_prev = eta.copy()
        m = eta.max(axis=1, keepdims=True)
        P = np.exp(eta - m)
        P /= P.sum(axis=1, keepdims=True)
        P = np.clip(P, 1e-5, 1 - 1e-5)
        for k in range(K):
            w = P[:, k] * (1.0 - P[:, k])
            z = eta[:, k] + (Y[:, k] - P[:, k]) / w
            wn = w / n
            col_den = (wn * Xs.T**2).sum(axis=1)
            b = B[:, k]
            c0 = b0[k]
            r = z - Xs @ b - c0
            for _ in range(max_inner):
                delta = 0.0
                for j in range(p):
                    bj = b[j]
                    zj = float((wn * Xs[:, j]) @ r) + col_den[j] * bj
                    bn = _soft(zj, lam * alpha) / (col_den[j] + lam * (1 - alpha))
                    if bn != bj:
                        r += Xs[:, j] * (bj - bn)
                        b[j] = bn
                        delta = max(delta, abs(bn - bj))
                c0_new = c0 + float((wn @ r) / wn.sum())
                r += c0 - c0_new
                c0 = c0_new
                if delta < tol:
                    break
            b0[k] = c0
            eta[:, k] = Xs @ b + c0
        # center the unpenalized intercepts (softmax-invariant shift)
        shift = b0.mean()
        b0 -= shift
        eta -= shift
        if float(np.abs(eta - eta_prev).max()) < 1e-6:
            break
    coefs = B / xs[:, None]
    b0_out = b0 - coefs.T @ xm
    return coefs, b0_out


def _multinomial_deviance(Y: np.ndarray, eta: np.ndarray) -> float:
    m = eta.max(axis=1, keepdims=True)
    logp = (eta - m) - np.log(np.exp(eta - m).sum(axis=1, keepdims=True))
    return float(-2.0 * (Y * logp).sum())


def _binomial_deviance(y: np.ndarray, eta: np.ndarray) -> float:
    pv = np.clip(1.0 / (1.0 + np.exp(-np.clip(eta, -30, 30))), 1e-12, 1 - 1e-12)
    return float(-2.0 * (y * np.log(pv) + (1 - y) * np.log(1 - pv)).sum())


def _lambda_path(X: np.ndarray, y: np.ndarray, alpha: float, n_lambdas: int) -> np.ndarray:
    n = len(y)
    Xs = (X - X.mean(0)) / np.where(X.std(0) == 0, 1.0, X.std(0))
    lmax = np.abs(Xs.T @ (y - y.mean())).max() / (n * max(alpha, 1e-3))
    return np.logspace(np.log10(lmax), np.log10(lmax * 1e-4), n_lambdas)


def _df_enet(X: np.ndarray, coefs: np.ndarray, lam: float, alpha: float) -> float:
    """Degrees of freedom: lasso df = |active|; ridge/enet df =
    trace(X_A (X_A'X_A + (1-alpha) lam I)^-1 X_A') = sum ss/(ss + (1-alpha)lam)
    over the squared singular values ss of the standardized active columns —
    the UNSCALED Gram, exactly as the reference (compute_df,
    /root/reference/src/compute_df.cpp:11-47, which also returns df = 1 for
    an empty active set). The reference standardizes xA with R's scale()
    (sd over n-1), so ddof=1 here."""
    active = np.flatnonzero(coefs != 0)
    if len(active) == 0:
        return 1.0
    if alpha == 1.0:
        return float(len(active))
    Xa = X[:, active]
    sd = Xa.std(0, ddof=1) if len(Xa) > 1 else np.ones(len(active))
    Xs = (Xa - Xa.mean(0)) / np.where(sd == 0, 1.0, sd)
    ridge = lam * (1 - alpha)
    try:
        ss = np.linalg.svd(Xs, compute_uv=False) ** 2
        return float((ss / (ss + ridge)).sum())
    except np.linalg.LinAlgError:
        return float(len(active))


def _criterion(kind: str, y, yhat, df, sigma2) -> float:
    """BIC/AIC/Cp-like criteria (/root/reference/R/utils.R:389-399)."""
    n = len(y)
    rss = float(((y - yhat) ** 2).sum())
    if kind == "BIC":
        return rss / (n * sigma2) + (np.log(n) / n) * df
    if kind == "AIC":
        return rss / (n * sigma2) + (2.0 / n) * df
    if kind == "Cp":
        return rss / n + (2.0 / n) * df * sigma2
    raise ValueError(kind)


def create_cv_slices(
    n: int, train: int, test: int, skip: int = 0
) -> list[tuple[np.ndarray, np.ndarray]]:
    """R4-cv: rolling-origin time-series CV slices (create_cv_slices,
    /root/reference/R/utils.R:207-221): one slice per origin position
    (step 1, not step ``test``), erroring when train + skip + test >= n
    exactly as the reference does."""
    if train + skip + test >= n:
        raise ValueError("(trainWindow + skip + testWindow) >= length(y).")
    out = []
    for stop in range(train, n - skip - test + 1):
        out.append(
            (np.arange(stop - train, stop), np.arange(stop + skip, stop + skip + test))
        )
    return out


@dataclass
class SentoModel:
    coefs: pd.Series
    intercept: float
    alpha: float
    lam: float
    criterion: float
    ctr: ModelCtr
    # multinomial: one-vs-rest per-class coefficient frame + intercepts
    classes: list | None = None
    coefs_multi: pd.DataFrame | None = None
    intercepts_multi: np.ndarray | None = None

    def predict(self, X: pd.DataFrame) -> np.ndarray:
        """gaussian: response; binomial: probability of class 1;
        multinomial: predicted class label (argmax of OvR scores)."""
        if self.ctr.model == "multinomial":
            scores = X[self.coefs_multi.index].to_numpy() @ self.coefs_multi.to_numpy()
            scores = scores + self.intercepts_multi
            return np.asarray(self.classes)[scores.argmax(axis=1)]
        eta = X[self.coefs.index].to_numpy() @ self.coefs.to_numpy() + self.intercept
        if self.ctr.model == "binomial":
            return 1.0 / (1.0 + np.exp(-np.clip(eta, -30, 30)))
        return eta

    def predict_class(self, X: pd.DataFrame) -> np.ndarray:
        if self.ctr.model == "binomial":
            return (self.predict(X) >= 0.5).astype(int)
        if self.ctr.model == "multinomial":
            return self.predict(X)
        raise ValueError("predict_class requires a classification family")


def _grid_fits(Xn: np.ndarray, yn: np.ndarray, ctr: ModelCtr, fit_fn):
    """All (alpha, lambda) fits with df + RSS, glmnet-grid style
    (/root/reference/R/sentomodel.R:420-437)."""
    fits = []
    for alpha in ctr.alphas:
        lams = _lambda_path(Xn, yn, alpha, ctr.n_lambdas)
        warm = None
        for lam in lams:
            coefs, b0 = fit_fn(Xn, yn, alpha, lam, warm=warm)
            warm = coefs * np.where(Xn.std(0) == 0, 1.0, Xn.std(0))
            eta = Xn @ coefs + b0
            df = _df_enet(Xn, coefs, lam, alpha)
            fits.append({"alpha": alpha, "lam": lam, "coefs": coefs, "b0": b0,
                         "eta": eta, "df": df})
    return fits


def sento_model(y: pd.Series, X: pd.DataFrame, ctr: ModelCtr = ModelCtr()) -> SentoModel:
    """R4: calibrate (alpha, lambda) over the grid by IC or rolling CV,
    then fit the final elastic net (run_sento_model,
    /root/reference/R/sentomodel.R:369-503).

    Gaussian IC sigma2 follows the reference's grid-based estimate: take
    the grid point with MAXIMUM degrees of freedom (the least-regularized
    fit) and set sigma2 = RSS_at_max_df / (n - min(n, df_max))
    (extract_optim_params, /root/reference/R/sentomodel.R:440-458) — NOT
    var(y), which can re-rank criteria near ties."""
    if ctr.model == "multinomial":
        return _sento_model_multinomial(y, X, ctr)
    y_al, X_al = align_variables(y, X, ctr.h, ctr.do_difference)
    X_al = clean_panel(X_al)
    Xn, yn = X_al.to_numpy(dtype=float), y_al.to_numpy(dtype=float)
    n = len(yn)
    binom = ctr.model == "binomial"
    fit_fn = logistic_enet_cd if binom else elastic_net_cd

    best = None
    if ctr.calibration == "cv":
        for alpha in ctr.alphas:
            lams = _lambda_path(Xn, yn, alpha, ctr.n_lambdas)
            warm = None
            for lam in lams:
                coefs, b0 = fit_fn(Xn, yn, alpha, lam, warm=warm)
                warm = coefs * np.where(Xn.std(0) == 0, 1.0, Xn.std(0))
                errs = []
                for tr, te in create_cv_slices(n, ctr.cv_train, ctr.cv_test):
                    c2, i2 = fit_fn(Xn[tr], yn[tr], alpha, lam)
                    eta_te = Xn[te] @ c2 + i2
                    if binom:
                        # classification error, the caret 'Accuracy' metric
                        pred = (eta_te >= 0).astype(float)
                        errs.append(float((pred != yn[te]).mean()))
                    else:
                        errs.append(float(((yn[te] - eta_te) ** 2).mean()))
                crit = float(np.mean(errs)) if errs else np.inf
                if best is None or crit < best[0]:
                    best = (crit, alpha, lam, coefs, b0)
    else:
        fits = _grid_fits(Xn, yn, ctr, fit_fn)
        if binom:
            # deviance-based IC: dev + penalty * df
            pen = {"BIC": np.log(n), "AIC": 2.0, "Cp": 2.0}[ctr.calibration]
            for f in fits:
                crit = _binomial_deviance(yn, f["eta"]) + pen * f["df"]
                if best is None or crit < best[0]:
                    best = (crit, f["alpha"], f["lam"], f["coefs"], f["b0"])
        else:
            fmax = max(fits, key=lambda f: f["df"])
            rss_max = float(((yn - fmax["eta"]) ** 2).sum())
            k = n - min(n, fmax["df"])
            sigma2 = rss_max / k if k > 0 else np.nan
            if not np.isfinite(sigma2) or sigma2 <= 0:
                sigma2 = max(float(np.var(yn)), 1e-12)
            for f in fits:
                crit = _criterion(ctr.calibration, yn, Xn @ f["coefs"] + f["b0"],
                                  f["df"], sigma2)
                if best is None or crit < best[0]:
                    best = (crit, f["alpha"], f["lam"], f["coefs"], f["b0"])
    crit, alpha, lam, coefs, b0 = best
    return SentoModel(
        coefs=pd.Series(coefs, index=X_al.columns),
        intercept=b0,
        alpha=alpha,
        lam=lam,
        criterion=crit,
        ctr=ctr,
    )


def _sento_model_multinomial(y: pd.Series, X: pd.DataFrame, ctr: ModelCtr) -> SentoModel:
    """SYMMETRIC multinomial elastic net (softmax likelihood over all K
    class columns, multinomial_enet_cd) calibrated on multinomial deviance
    + penalty*df (IC) or rolling-origin classification error (cv) — the
    glmnet family='multinomial' semantics the reference delegates to
    (/root/reference/R/sentomodel.R:313-367). One-vs-rest is NOT used: the
    per-class working responses couple through the shared softmax, so
    supports and coefficients can differ from OvR."""
    y_al, X_al = align_variables(y, X, ctr.h, ctr.do_difference)
    X_al = clean_panel(X_al)
    Xn = X_al.to_numpy(dtype=float)
    classes = sorted(pd.unique(y_al))
    n = len(y_al)
    Y = np.column_stack([(y_al == c).to_numpy(dtype=float) for c in classes])

    def path(alpha: float) -> np.ndarray:
        # glmnet-style path: lambda_max is the largest per-class screening
        # bound, taken over all K class indicators
        lmaxes = [
            _lambda_path(Xn, Y[:, k], alpha, 2)[0] for k in range(len(classes))
        ]
        lmax = max(lmaxes)
        return np.logspace(np.log10(lmax), np.log10(lmax * 1e-4), ctr.n_lambdas)

    best = None
    if ctr.calibration == "cv":
        yn_lbl = y_al.to_numpy()
        for alpha in ctr.alphas:
            for lam in path(alpha):
                B, b0 = multinomial_enet_cd(Xn, Y, alpha, lam)
                errs = []
                for tr, te in create_cv_slices(n, ctr.cv_train, ctr.cv_test):
                    B2, b02 = multinomial_enet_cd(Xn[tr], Y[tr], alpha, lam)
                    pred_idx = np.argmax(Xn[te] @ B2 + b02, axis=1)
                    pred = np.array(classes, dtype=object)[pred_idx]
                    errs.append(float((pred != yn_lbl[te]).mean()))
                crit = float(np.mean(errs)) if errs else np.inf
                if best is None or crit < best[0]:
                    best = (crit, alpha, lam, (B, b0))
    else:
        pen = {"BIC": np.log(n), "AIC": 2.0, "Cp": 2.0}[ctr.calibration]
        for alpha in ctr.alphas:
            warm = None
            for lam in path(alpha):
                B, b0 = multinomial_enet_cd(Xn, Y, alpha, lam, warm=warm)
                warm = (B, b0)
                dev = _multinomial_deviance(Y, Xn @ B + b0)
                dftot = sum(
                    _df_enet(Xn, B[:, k], lam, alpha) for k in range(len(classes))
                )
                crit = dev + pen * dftot
                if best is None or crit < best[0]:
                    best = (crit, alpha, lam, (B.copy(), b0.copy()))
    crit, alpha, lam, (B, b0) = best
    coef_df = pd.DataFrame(
        {c: B[:, i] for i, c in enumerate(classes)}, index=X_al.columns
    )
    return SentoModel(
        coefs=coef_df[classes[0]],
        intercept=float(b0[0]),
        alpha=alpha,
        lam=lam,
        criterion=crit,
        ctr=ctr,
        classes=classes,
        coefs_multi=coef_df,
        intercepts_multi=b0,
    )


def model_performance(preds: pd.DataFrame, family: str = "gaussian") -> dict[str, float]:
    """R6: out-of-sample metrics (model_performance,
    /root/reference/R/sentomodel.R:598-632). gaussian: RMSFE/MAD/MDA;
    binomial/multinomial: accuracy in percent, like the reference."""
    if family in ("binomial", "multinomial"):
        pred = preds["pred"]
        if family == "binomial" and pred.dtype.kind == "f" and not pred.isin([0.0, 1.0]).all():
            # SentoModel.predict returns class-1 probabilities for binomial;
            # threshold at 0.5 so the natural predict() -> performance
            # pipeline measures accuracy, not prob==label (always false)
            pred = (pred >= 0.5).astype(float)
        acc = (pred == preds["actual"]).astype(float)
        return {"accuracy": float(acc.mean()) * 100.0}
    err = preds["pred"] - preds["actual"]
    out = {
        "RMSFE": float(np.sqrt((err**2).mean())),
        "MAD": float(err.abs().mean()),
    }
    if len(preds) > 1:
        # MDA in percent, as the reference (mean(DA) * 100,
        # /root/reference/R/sentomodel.R:613-615)
        da = np.sign(preds["pred"].diff().dropna()) == np.sign(preds["actual"].diff().dropna())
        out["MDA"] = float(da.mean()) * 100.0
    return out


def get_loss_data(iter_results: dict[str, pd.DataFrame], loss: str = "errorSq") -> pd.DataFrame:
    """R7: loss matrix across modelIter objects for model-confidence-set
    analysis (get_loss_data, /root/reference/R/sentomodel.R:851-878)."""
    cols = {}
    for name, preds in iter_results.items():
        err = preds["pred"] - preds["actual"]
        if loss == "errorSq":
            cols[name] = (err**2).to_numpy()
        elif loss == "AD":
            cols[name] = err.abs().to_numpy()
        elif loss == "error":
            cols[name] = err.to_numpy()
        elif loss == "DA":
            # directional accuracy is defined on first DIFFERENCES (direction
            # of change), with the leading NA row dropped
            # (/root/reference/R/sentomodel.R:600,869-873)
            da = (
                np.sign(preds["pred"].diff().dropna())
                == np.sign(preds["actual"].diff().dropna())
            ).astype(float)
            cols[name] = (1.0 - da).to_numpy()
        else:
            raise ValueError(loss)
    return pd.DataFrame(cols)


def sento_model_iter(
    y: pd.Series, X: pd.DataFrame, ctr: ModelCtr = ModelCtr(), n_windows: int = 5, window: int | None = None
) -> pd.DataFrame:
    """R5: rolling re-estimation + 1-step-ahead out-of-sample predictions
    (run_sento_modelIter, /root/reference/R/sentomodel.R:506-596)."""
    n = len(y)
    window = window or max(20, n - n_windows)
    rows = []
    for t in range(window, min(window + n_windows, n)):
        m = sento_model(y.iloc[t - window : t], X.iloc[t - window : t], ctr)
        pred = float(m.predict(X.iloc[[t]])[0])
        rows.append({"t": t, "pred": pred, "actual": float(y.iloc[t])})
    out = pd.DataFrame(rows)
    if len(out):
        err = out["pred"] - out["actual"]
        out.attrs["RMSFE"] = float(np.sqrt((err**2).mean()))
        out.attrs["MAD"] = float(err.abs().mean())
        da = (np.sign(out["pred"].diff().dropna()) == np.sign(out["actual"].diff().dropna()))
        out.attrs["MDA"] = float(da.mean()) * 100.0 if len(da) else np.nan
    return out
