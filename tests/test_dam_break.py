"""Physical-regime dam break regression: weak compressibility + settling.

Guards the parameter-derivation path (for_spacing + calibrate_rest_density)
against the two failure modes found during bring-up: zero-pressure collapse
(undersampled density vs hardcoded d0) and Tait-stiffness explosion (reference
w=2.15 ~ zero sound speed).
"""

import jax.numpy as jnp
import pytest

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
from dieselfluid_tpu.solvers.wcsph import rollout, wcsph_step


@pytest.fixture(scope="module")
def sim():
    n3, extent = 10, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    s0 = dam_break_state(n3, params, extent=extent)
    params = calibrate_rest_density(s0.pos, params)
    nfn = lambda pos: brute_force_neighborhood(pos, pos, params.h, 64)
    step = lambda st: wcsph_step(st, params, neighbor_fn=nfn)
    final, traj, vmax = rollout(step, s0, 400)
    return params, s0, final, vmax


def test_calibration_consistency(sim):
    params, s0, *_ = sim
    # Sound speed preserved through recalibration: c^2 = w/d0
    c2 = params.tait_w / params.d0
    assert c2 == pytest.approx(25.0 ** 2, rel=1e-5)


def test_weak_compressibility(sim):
    params, _, final, _ = sim
    # WCSPH contract: density stays within ~20% of rest density
    assert float(final.density.max()) / params.d0 < 1.2


def test_no_explosion(sim):
    params, _, final, vmax = sim
    assert bool(jnp.all(jnp.isfinite(final.pos)))
    # velocities bounded well below the sound speed
    assert float(jnp.max(vmax)) < 25.0


def test_fluid_settles_and_spreads(sim):
    _, s0, final, _ = sim
    # Column collapses: mean height drops and fluid spreads in x
    assert float(jnp.mean(final.pos[:, 1])) < float(jnp.mean(s0.pos[:, 1])) - 0.2
    spread0 = float(s0.pos[:, 0].max() - s0.pos[:, 0].min())
    spread1 = float(final.pos[:, 0].max() - final.pos[:, 0].min())
    assert spread1 > spread0 + 0.3
