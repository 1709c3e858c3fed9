"""Pallas dense-cell kernels vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models import field as F
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.ops.cellops import (
    DenseCellSpec,
    build_planes,
    dense_indices,
    gather_plane,
)
from dieselfluid_tpu.ops.smoothing import tait_eos
from dieselfluid_tpu.solvers.dense_step import dense_density_forces


@pytest.fixture(scope="module")
def setup():
    n3, extent = 8, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    s = dam_break_state(n3, params, extent=extent)
    key = jax.random.PRNGKey(0)
    s = s._replace(vel=jax.random.normal(key, s.vel.shape) * 0.1)
    params = params.replace(d0=float(1.1 * params.d0))
    spec = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h, capacity=16)
    return params, s, spec


class TestDenseLayout:
    def test_indices_unique_and_valid(self, setup):
        params, s, spec = setup
        flat, valid, overflow = dense_indices(s.pos, spec)
        assert int(overflow) == 0
        f = np.asarray(flat)[np.asarray(valid)]
        assert len(np.unique(f)) == len(f), "slot collision"
        assert f.min() >= 0 and f.max() < spec.rows * spec.row_len

    def test_plane_roundtrip(self, setup):
        params, s, spec = setup
        flat, valid, _ = dense_indices(s.pos, spec)
        planes = build_planes({"x": s.pos[:, 0]}, flat, valid, spec)
        back = gather_plane(planes["x"], flat)
        np.testing.assert_allclose(np.asarray(back), np.asarray(s.pos[:, 0]), atol=1e-6)
        # mask plane sums to the particle count
        assert float(planes["mask"].sum()) == s.n

    def test_capacity_overflow_counted(self, setup):
        params, s, spec = setup
        tight = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h, capacity=1)
        _, valid, overflow = dense_indices(s.pos, tight)
        assert int(overflow) > 0
        assert int(overflow) + int(np.asarray(valid).sum()) == s.n


class TestKernelsInterpreted:
    def test_density_forces_match_oracle(self, setup):
        params, s, spec = setup
        with pltpu.force_tpu_interpret_mode():
            rho, press, force, ovf = dense_density_forces(s, params, spec)
        rho, force = np.asarray(rho), np.asarray(force)

        nb = brute_force_neighborhood(s.pos, s.pos, params.h, 96)
        rho_o = F.density_with_self(s.pos, nb, params)
        press_o = tait_eos(rho_o, params.d0, params.p0, params.tait_gamma, params.tait_w)
        f_o = np.asarray(
            F.pressure_force(s.pos, rho_o, press_o, nb, params)
            + params.mu * F.laplacian_force(s.pos, s.vel, rho_o, nb, params)
        )
        np.testing.assert_allclose(rho, np.asarray(rho_o), rtol=1e-5)
        scale = np.abs(f_o).max()
        np.testing.assert_allclose(force / scale, f_o / scale, atol=1e-5)
