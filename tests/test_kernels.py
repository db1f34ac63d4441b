"""Unit tests for time kernels (K1-K4) against hand-computed values
(formulas: /root/reference/R/utils.R:22-160)."""

import math

import numpy as np
import pytest

from sentometrics_spark.aggregate.kernels import (
    setup_time_weights,
    weights_almon,
    weights_beta,
    weights_exponential,
)
from sentometrics_spark.config import TimeKernelSpec


def test_exponential_hand_computed():
    w = weights_exponential(3, alphas=(0.2,), do_normalize=False)["exponential0.2"]
    vals = np.array([1 / 3, 2 / 3, 1.0])
    np.testing.assert_allclose(w, np.exp(2.0 * (vals - 1)))
    wn = weights_exponential(3, alphas=(0.2,))["exponential0.2"]
    assert wn.sum() == pytest.approx(1.0)
    np.testing.assert_allclose(wn, w / w.sum())


def test_exponential_inverse_and_validation():
    ws = weights_exponential(4, alphas=(0.1,), do_inverse=True)
    assert set(ws) == {"exponential0.1", "exponential0.1_inv"}
    np.testing.assert_allclose(ws["exponential0.1_inv"], ws["exponential0.1"][::-1])
    with pytest.raises(ValueError):
        weights_exponential(3, alphas=(1.0,))


def test_almon_hand_computed():
    ws = weights_almon(4, orders=(1, 2), do_inverse=False, do_normalize=False)
    vals = np.arange(1, 5) / 4
    std = 1 - vals
    np.testing.assert_allclose(ws["almon1"], (1 - std**1) * std ** (2 - 1))
    np.testing.assert_allclose(ws["almon2"], (1 - std**2) * std ** (2 - 2))


def test_almon_n1_all_ones():
    ws = weights_almon(1, orders=(1, 2, 3), do_inverse=True)
    for w in ws.values():
        np.testing.assert_allclose(w, [1.0])


def test_almon_inverse():
    ws = weights_almon(5, orders=(2,), do_inverse=True, do_normalize=False)
    vals = np.arange(1, 6) / 5
    np.testing.assert_allclose(ws["almon2_inv"], (1 - vals**2) * vals ** (2 - 2))


def test_beta_hand_computed():
    ws = weights_beta(3, a=(2,), b=(3,), do_normalize=False)["beta23"]
    vals = np.arange(1, 4) / 3
    expected = vals ** 1 * (1 - vals) ** 2 * math.gamma(5) / (math.gamma(2) * math.gamma(3))
    np.testing.assert_allclose(ws, expected)
    with pytest.raises(ValueError):
        weights_beta(3, a=(0,), b=(1,))


def test_beta_n1():
    ws = weights_beta(1, a=(1, 2), b=(1,))
    for w in ws.values():
        np.testing.assert_allclose(w, [1.0])


def test_setup_time_weights_composition():
    specs = (
        TimeKernelSpec("equal_weight"),
        TimeKernelSpec("linear"),
        TimeKernelSpec("almon", orders_alm=(1, 2), do_inverse_alm=True),
        TimeKernelSpec("own", own=(("mykernel", (0.5, 0.3, 0.2)),)),
    )
    ws = setup_time_weights(specs, 3)
    assert set(ws) == {"equal_weight", "linear", "almon1", "almon1_inv", "almon2", "almon2_inv", "mykernel"}
    np.testing.assert_allclose(ws["equal_weight"], [1 / 3] * 3)
    np.testing.assert_allclose(ws["linear"], np.array([1, 2, 3]) / 6)
    np.testing.assert_allclose(ws["mykernel"], [0.5, 0.3, 0.2])


def test_setup_time_weights_duplicate_names():
    specs = (
        TimeKernelSpec("equal_weight"),
        TimeKernelSpec("own", own=(("equal_weight", (1.0,)),)),
    )
    with pytest.raises(ValueError, match="duplicate"):
        setup_time_weights(specs, 1)


def test_own_kernel_length_mismatch():
    with pytest.raises(ValueError, match="length"):
        setup_time_weights((TimeKernelSpec("own", own=(("k", (0.5, 0.5)),)),), 3)
