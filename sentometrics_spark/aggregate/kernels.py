"""Across-time weighting kernels (K1-K4), pure numpy.

Exact ports of the reference formulas:
  - weights_exponential  /root/reference/R/utils.R:22-40
  - weights_almon        /root/reference/R/utils.R:63-86
  - weights_beta         /root/reference/R/utils.R:114-135
  - setup_time_weights   /root/reference/R/utils.R:137-160

Each returns an ordered mapping {kernel_name: np.ndarray of length lag},
index 0 = most-lagged bucket (matches the reference's "first row is most
lagged value" convention), weights normalized to sum 1 where the
reference normalizes.
"""

from __future__ import annotations

import math

import numpy as np

from sentometrics_spark.config import TimeKernelSpec


def weights_exponential(
    n: int,
    alphas: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5),
    do_inverse: bool = False,
    do_normalize: bool = True,
) -> dict[str, np.ndarray]:
    if max(alphas) >= 1 or min(alphas) <= 0:
        raise ValueError("alphas must be in (0, 1)")
    vals = np.arange(1, n + 1, dtype=np.float64) / n
    out: dict[str, np.ndarray] = {}
    for a in alphas:
        alpha = 10.0 * a
        w = np.exp(alpha * (vals - 1.0))
        out[f"exponential{a:g}"] = w
        if do_inverse:
            out[f"exponential{a:g}_inv"] = np.exp(alpha * (1.0 - vals))
    if do_normalize:
        out = {k: v / v.sum() for k, v in out.items()}
    return out


def weights_almon(
    n: int,
    orders: tuple[int, ...] = (1, 2, 3),
    do_inverse: bool = True,
    do_normalize: bool = True,
) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if n == 1:
        for b in orders:
            out[f"almon{b}"] = np.ones(1)
            if do_inverse:
                out[f"almon{b}_inv"] = np.ones(1)
        return out  # reference returns before normalization when n == 1
    vals = np.arange(1, n + 1, dtype=np.float64) / n
    r_max = max(orders)
    for b in orders:
        std = 1.0 - vals
        out[f"almon{b}"] = (1.0 - std**b) * std ** (r_max - b)
        if do_inverse:
            inv = vals  # -(1 - vals) + 1
            out[f"almon{b}_inv"] = (1.0 - inv**b) * inv ** (r_max - b)
    if do_normalize:
        out = {k: v / v.sum() for k, v in out.items()}
    return out


def weights_beta(
    n: int,
    a: tuple[float, ...] = (1, 2, 3, 4),
    b: tuple[float, ...] = (1, 2, 3, 4),
    do_normalize: bool = True,
) -> dict[str, np.ndarray]:
    if any(v <= 0 for v in list(a) + list(b)):
        raise ValueError("a and b must be positive")
    vals = np.arange(1, n + 1, dtype=np.float64) / n
    out: dict[str, np.ndarray] = {}
    for aa in a:
        for bb in b:
            name = f"beta{aa:g}{bb:g}"
            if n == 1:
                out[name] = np.ones(1)
            else:
                with np.errstate(divide="ignore", invalid="ignore"):
                    w = (
                        vals ** (aa - 1.0)
                        * (1.0 - vals) ** (bb - 1.0)
                        * math.gamma(aa + bb)
                        / (math.gamma(aa) * math.gamma(bb))
                    )
                out[name] = w
    if do_normalize:
        out = {k: v / v.sum() for k, v in out.items()}
    return out


def setup_time_weights(specs: tuple[TimeKernelSpec, ...], lag: int) -> dict[str, np.ndarray]:
    """Expand kernel specs into the full named-kernel matrix (attribWeights$B)."""
    weights: dict[str, np.ndarray] = {}

    def _add(new: dict[str, np.ndarray]) -> None:
        for k, v in new.items():
            if k in weights:
                raise ValueError(f"duplicate time-weighting scheme name: {k}")
            weights[k] = np.asarray(v, dtype=np.float64)

    for spec in specs:
        if spec.how == "equal_weight":
            _add({"equal_weight": np.full(lag, 1.0 / lag)})
        elif spec.how == "linear":
            lin = np.arange(1, lag + 1, dtype=np.float64)
            _add({"linear": lin / lin.sum()})
        elif spec.how == "exponential":
            _add(weights_exponential(lag, spec.alphas_exp, spec.do_inverse_exp, True))
        elif spec.how == "almon":
            _add(weights_almon(lag, spec.orders_alm, spec.do_inverse_alm, True))
        elif spec.how == "beta":
            _add(weights_beta(lag, spec.a_beta, spec.b_beta, True))
        elif spec.how == "own":
            for name, w in spec.own:
                arr = np.asarray(w, dtype=np.float64)
                if len(arr) != lag:
                    raise ValueError(f"own kernel {name} length {len(arr)} != lag {lag}")
                _add({name: arr})
    for name, w in weights.items():
        if len(w) != lag:
            raise AssertionError(f"kernel {name} length mismatch")
    return weights
