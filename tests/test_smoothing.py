"""Kernel + EOS unit tests: analytic values, cutoffs, normalization sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.ops.smoothing import (
    PI,
    KernelCoeffs,
    d2w_visc,
    dw_spiky,
    grad_w,
    tait_eos,
    w0,
    w_poly6,
)


@pytest.fixture(scope="module")
def k():
    return KernelCoeffs.build(1.0)


def test_coefficients_match_reference(k):
    # ref: kernel/std_kernel.go:26-28 with h=1
    np.testing.assert_allclose(k.a, 315.0 / (64.0 * PI), rtol=1e-6)
    np.testing.assert_allclose(k.b, -45.0 / PI, rtol=1e-6)
    np.testing.assert_allclose(k.c, 90.0 / PI, rtol=1e-6)


def test_kernel_values(k):
    # W(0) = A, W(h) = 0, monotone decreasing on [0, h)
    np.testing.assert_allclose(float(w_poly6(0.0, k)), k.a, rtol=1e-6)
    assert float(w_poly6(1.0, k)) == 0.0
    assert float(w_poly6(1.5, k)) == 0.0
    r = jnp.linspace(0.0, 0.999, 100)
    vals = w_poly6(r, k)
    assert bool(jnp.all(jnp.diff(vals) <= 1e-6))
    np.testing.assert_allclose(float(w0(k)), k.a, rtol=1e-6)


def test_derivative_cutoffs(k):
    assert float(dw_spiky(1.0, k)) == 0.0
    assert float(dw_spiky(0.0, k)) == pytest.approx(k.b, rel=1e-6)
    assert float(d2w_visc(1.5, k)) == 0.0
    assert float(d2w_visc(0.0, k)) == pytest.approx(k.c, rel=1e-6)


def test_scaled_h():
    # Powers of h enter as documented: A ~ h^-3, B ~ h^-4, C ~ h^-5
    k1, k2 = KernelCoeffs.build(1.0), KernelCoeffs.build(2.0)
    np.testing.assert_allclose(k2.a, k1.a / 8.0, rtol=1e-6)
    np.testing.assert_allclose(k2.b, k1.b / 16.0, rtol=1e-6)
    np.testing.assert_allclose(k2.c, k1.c / 32.0, rtol=1e-6)


def test_grad_points_toward_neighbor(k):
    # grad_w = dir * -O1D, O1D < 0 inside support, so grad ∥ +dir
    direction = jnp.array([[1.0, 0.0, 0.0]])
    g = grad_w(jnp.array([0.5]), direction, k)
    assert float(g[0, 0]) > 0.0
    assert float(g[0, 1]) == 0.0


def test_grad_matches_finite_difference(k):
    # d/dx W(|x|) for a displacement along +x equals O1D(|x|) numerically?
    # The reference kernel family mixes poly6 value with spiky derivative, so
    # check our dw_spiky itself against the analytic form instead.
    r = 0.37
    q = 1.0 - r / k.h
    np.testing.assert_allclose(float(dw_spiky(r, k)), k.b * q * q, rtol=1e-6)


def test_tait_eos():
    d0 = 512.0
    # Clamped at/below rest density -> p0
    assert float(tait_eos(100.0, d0)) == pytest.approx(0.0, abs=1e-6)
    assert float(tait_eos(d0, d0)) == pytest.approx(0.0, abs=1e-6)
    # ref: model/model.go TaitEos with x/d0 = 1.1
    expected = (2.15 / 7.16) * (1.1 ** 7.16 - 1.0)
    np.testing.assert_allclose(float(tait_eos(1.1 * d0, d0)), expected, rtol=1e-5)
    # Monotone increasing above d0
    rhos = jnp.linspace(d0, 2 * d0, 50)
    ps = tait_eos(rhos, d0)
    assert bool(jnp.all(jnp.diff(ps) > 0))


def test_eos_differentiable():
    g = jax.grad(lambda rho: tait_eos(rho, 512.0))(600.0)
    assert np.isfinite(g) and g > 0
