"""WCSPH end-to-end: lattice init parity, stability, boundedness, differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.geometry.grid import kern_grid
from dieselfluid_tpu.models.particles import dam_break_state, init_lattice_state
from dieselfluid_tpu.solvers.wcsph import (
    default_neighbor_fn,
    reference_wcsph_step,
    rollout,
    wcsph_step,
)

N3 = 8  # 512 particles — CPU-quick


@pytest.fixture(scope="module")
def params():
    return FluidParams.reference_lattice(N3)


def test_reference_lattice_params(params):
    # ref: model/sph/fluid.go:48-63 — d0 = n^3/8 (mass=1, volume=8)
    assert params.d0 == pytest.approx(N3 ** 3 / 8.0)
    assert params.h == 1.0 and params.mass == 1.0


def test_lattice_positions_match_reference_indexing(params):
    g = kern_grid(N3)
    pos = np.asarray(g.positions())
    # ref: GridPosition(i,j,k) = min_bounds + step*(i,j,k); id = k + n*(i*n + j)
    step = 2.0 / N3
    for (i, j, k) in [(0, 0, 0), (1, 2, 3), (7, 7, 7), (3, 0, 5)]:
        idx = k + N3 * (i * N3 + j)
        expected = np.array([-1.0 + step * i, -1.0 + step * j, -1.0 + step * k])
        np.testing.assert_allclose(pos[idx], expected, atol=1e-6)


def test_initial_force_is_gravity(params):
    s = init_lattice_state(N3, params)
    np.testing.assert_allclose(
        np.asarray(s.force), np.tile([0.0, -9.81, 0.0], (N3 ** 3, 1)), atol=1e-6
    )


def test_step_runs_and_is_finite(params):
    s = init_lattice_state(N3, params)
    s2, diag = wcsph_step(s, params)
    for arr in [s2.pos, s2.vel, s2.force, s2.density, s2.pressure]:
        assert bool(jnp.all(jnp.isfinite(arr)))
    assert float(diag.max_vel) >= 0


def test_rollout_stays_in_box(params):
    s = dam_break_state(N3, params, extent=0.5)
    step = lambda st: wcsph_step(st, params)
    final, traj, max_vels = rollout(step, s, 50)
    assert bool(jnp.all(jnp.isfinite(final.pos)))
    assert float(jnp.max(jnp.abs(final.pos))) <= 1.0 + 1e-5
    # The fluid must actually move (gravity) and not blow up
    assert float(max_vels[-1]) > 0.0
    assert float(jnp.max(max_vels)) < 100.0


def test_fluid_falls_under_gravity(params):
    s = init_lattice_state(N3, params)
    step = lambda st: wcsph_step(st, params, bounds=None)
    final, _, _ = rollout(step, s, 10)
    # Mean y must decrease without a floor
    assert float(jnp.mean(final.pos[:, 1])) < float(jnp.mean(s.pos[:, 1]))


def test_reference_step_parity_freefall(params):
    """reference_wcsph_step semantics: force = gravity*mass + gravity (unscaled add),
    so dv = -9.81*2*dt per step with mass=1 (ref: wcsph.go:19 + fluid.go:192)."""
    s = init_lattice_state(N3, params)
    s2, _ = reference_wcsph_step(s, params)
    expected_dv = (9.81 * 2) * params.dt
    np.testing.assert_allclose(
        np.asarray(-s2.vel[:, 1]), np.full(N3 ** 3, expected_dv), rtol=1e-5
    )


def test_step_is_differentiable(params):
    s = init_lattice_state(N3, params)

    def loss(pos0):
        st = s._replace(pos=pos0)
        st2, _ = wcsph_step(st, params)
        return jnp.sum(st2.pos ** 2)

    g = jax.grad(loss)(s.pos)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_momentum_symmetric_forces(params):
    """Pairwise-symmetric pressure/viscous forces: total non-gravity force ~ 0."""
    from dieselfluid_tpu.solvers.wcsph import compute_forces

    s = init_lattice_state(N3, params)
    nfn = default_neighbor_fn(params)
    s = compute_forces(s, nfn(s.pos), params)
    f = np.asarray(s.force)
    gravity_total = np.array([0.0, -9.81, 0.0]) * params.mass * (N3 ** 3)
    np.testing.assert_allclose(f.sum(axis=0), gravity_total, rtol=1e-3, atol=5e-2)


class TestAoSInterop:
    """SoA<->AoS marshalling (ref: model/particle.go, particle_struct_field.go,
    particle_array.go:72-121 Get/Set)."""

    def test_roundtrip(self):
        from dieselfluid_tpu.models.particles import from_aos, to_aos

        p = FluidParams.for_spacing(0.1)
        s = dam_break_state(4, p)
        s = s._replace(density=jnp.arange(64, dtype=jnp.float32),
                       pressure=jnp.arange(64, dtype=jnp.float32) * 2)
        aos = to_aos(s)
        assert aos.shape == (64, 11)
        back = from_aos(aos)
        for a, b in zip(back[:5], s[:5]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_boundary_reads_zero_dynamics(self):
        from dieselfluid_tpu.models.particles import particle

        p = FluidParams.for_spacing(0.1)
        s = dam_break_state(4, p)
        s = s._replace(boundary_pos=jnp.ones((8, 3), jnp.float32) * 3.0)
        row = particle(s, s.n + 2)   # a boundary index
        np.testing.assert_array_equal(np.asarray(row[:3]), 3.0)   # position
        np.testing.assert_array_equal(np.asarray(row[3:]), 0.0)   # dynamics
        fluid_row = particle(s, 0)
        np.testing.assert_array_equal(np.asarray(fluid_row[:3]),
                                      np.asarray(s.pos[0]))
