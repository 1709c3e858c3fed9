"""PCISPH: delta computation, incompressibility enforcement, parity mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state, init_lattice_state
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
from dieselfluid_tpu.solvers.pcisph import (
    ReferencePciState,
    compute_pci_delta,
    pcisph_step,
    reference_pcisph_step,
)
from dieselfluid_tpu.solvers.wcsph import rollout


@pytest.fixture(scope="module")
def sim():
    n3, extent = 10, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    s0 = dam_break_state(n3, params, extent=extent)
    params = calibrate_rest_density(s0.pos, params)
    delta = compute_pci_delta(params, dx)
    nfn = lambda pos: brute_force_neighborhood(pos, pos, params.h, 64)
    return params, s0, delta, nfn, dx


def test_delta_positive_and_finite(sim):
    params, _, delta, _, dx = sim
    assert np.isfinite(delta) and delta > 0


def test_delta_matches_formula(sim):
    """Independent numpy evaluation of Solenthaler eq. 8 on the template grid."""
    params, _, delta, _, dx = sim
    h = params.h
    r = int(np.ceil(h / dx))
    ax = np.arange(-r, r + 1) * dx
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
    d = np.linalg.norm(pts, axis=-1)
    sel = (d > 0) & (d < h)
    pts, d = pts[sel], d[sel]
    b = -45.0 / (np.pi * h ** 4)
    mag = -b * (1 - d / h) ** 2                  # -O1D > 0
    gw = pts / d[:, None] * mag[:, None]
    denom = -(gw.sum(0) @ gw.sum(0)) - (gw * gw).sum()
    beta = params.dt ** 2 * params.mass ** 2 * 2 / params.d0 ** 2
    np.testing.assert_allclose(delta, -1 / (beta * denom), rtol=1e-4)


def test_pcisph_runs_and_enforces_incompressibility(sim):
    params, s0, delta, nfn, _ = sim
    step = lambda st: pcisph_step(st, params, delta, neighbor_fn=nfn)
    final, traj, vmax = rollout(step, s0, 200)
    assert bool(jnp.all(jnp.isfinite(final.pos)))
    assert float(jnp.max(vmax)) < 25.0
    # Incompressibility: discrete density stays near or below rest density
    assert float(final.density.max()) / params.d0 < 1.25
    # Fluid falls
    assert float(jnp.mean(final.pos[:, 1])) < float(jnp.mean(s0.pos[:, 1])) - 0.1


def test_pcisph_differentiable_unrolled(sim):
    params, s0, delta, nfn, _ = sim

    def loss(pos0):
        st = s0._replace(pos=pos0)
        st, _ = pcisph_step(st, params, delta, neighbor_fn=nfn, unroll_for_grad=True)
        return jnp.sum(st.pos ** 2)

    g = jax.grad(loss)(s0.pos)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_reference_parity_mode_runs():
    """Reference semantics on the reference's own config (4k-class, h=1)."""
    n3 = 8
    params = FluidParams.reference_lattice(n3)
    s0 = init_lattice_state(n3, params)
    delta = compute_pci_delta(params, 2.0 / n3)
    nfn = lambda pos: brute_force_neighborhood(pos, pos, params.h, 100)
    ps = ReferencePciState.init(s0)
    for _ in range(3):
        ps, diag = reference_pcisph_step(ps, params, delta, neighbor_fn=nfn)
    assert bool(jnp.all(jnp.isfinite(ps.fluid.pos)))
    # The persistent starred buffers must have advanced (reference quirk)
    assert float(jnp.max(jnp.abs(ps.pos_star - s0.pos))) > 0
