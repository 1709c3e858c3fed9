"""Slab decomposition + halo exchange on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
from dieselfluid_tpu.parallel.halo import (
    SlabSpec,
    collect,
    distribute,
    make_halo_step,
)
from dieselfluid_tpu.parallel.sharding import particle_mesh
from dieselfluid_tpu.solvers.wcsph import rollout, wcsph_step

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    n3, extent = 10, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    s0 = dam_break_state(n3, params, extent=extent)
    params = calibrate_rest_density(s0.pos, params)
    spec = SlabSpec(n_dev=N_DEV, capacity=512, halo_capacity=256,
                    migrate_capacity=128, h=params.h)
    mesh = particle_mesh(N_DEV)
    return params, s0, spec, mesh


def test_distribute_collect_roundtrip(setup):
    params, s0, spec, _ = setup
    slabs = distribute(s0, spec)
    assert float(slabs.dropped) == 0.0
    pos, vel = collect(slabs)
    assert pos.shape == (s0.n, 3)
    # Same multiset of positions (order differs)
    a = np.sort(np.asarray(s0.pos), axis=0)
    b = np.sort(pos, axis=0)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_slab_assignment(setup):
    params, s0, spec, _ = setup
    slabs = distribute(s0, spec)
    pos = np.asarray(slabs.pos)
    alive = np.asarray(slabs.alive) > 0
    c = spec.capacity
    for d in range(N_DEV):
        lo = spec.lo + spec.slab_width * d
        block = slice(d * c, (d + 1) * c)
        live_x = pos[block][alive[block]][:, 0]
        if len(live_x):
            assert live_x.min() >= lo - 1e-6
            assert live_x.max() < lo + spec.slab_width + 1e-6


def test_halo_step_conserves_particles(setup):
    params, s0, spec, mesh = setup
    slabs = distribute(s0, spec)
    step = make_halo_step(mesh, spec, params, k=64)
    n0 = float(jnp.sum(slabs.alive))
    for _ in range(20):
        slabs, max_vel, n_live, per_slab = step(slabs)
    assert float(n_live) == n0
    assert float(slabs.dropped) == 0.0
    assert np.isfinite(float(max_vel))


def test_halo_matches_single_device_physics(setup):
    """Slab-decomposed trajectory matches the single-device solver.

    With owner-computed ghost rho/p the slab step's physics is identical to
    the single-device step; only float summation order differs, so 100 chaotic
    dam-break steps must still land within a small tolerance (round-1's 0.08
    mean-drift bar is now 100x tighter at trajectory level).
    """
    params, s0, spec, mesh = setup
    n_steps = 100
    nfn = lambda p: brute_force_neighborhood(p, p, params.h, 96)
    single, _, _ = rollout(
        lambda st: wcsph_step(st, params, neighbor_fn=nfn), s0, n_steps)

    slabs = distribute(s0, spec)
    step = make_halo_step(mesh, spec, params, k=96)
    for _ in range(n_steps):
        # block each step: CPU-emulation collectives deadlock when many
        # multi-collective programs queue up (see halo.py docstring)
        slabs, max_vel, _, _ = jax.block_until_ready(step(slabs))
    pos, _ = collect(slabs)

    a = np.sort(np.asarray(single.pos), axis=0)
    b = np.sort(pos, axis=0)
    np.testing.assert_allclose(a, b, atol=1e-4)   # measured: 6.6e-7 at step 100
    assert float(np.mean(pos[:, 1])) == pytest.approx(
        float(jnp.mean(single.pos[:, 1])), abs=1e-5)
    assert pos[:, 1].min() >= -1.0 - 1e-5
    assert float(max_vel) < 25.0


def test_distributed_pcisph_matches_single_device(setup):
    """Distributed PCISPH (pmax'd error exit) tracks the single-device solver."""
    from dieselfluid_tpu.parallel.halo import make_halo_pcisph_step
    from dieselfluid_tpu.solvers.pcisph import compute_pci_delta, pcisph_step

    params, s0, spec, mesh = setup
    dx = 2.0 * 0.5 / 10
    delta = compute_pci_delta(params, dx)
    n_steps = 40

    nfn = lambda p: brute_force_neighborhood(p, p, params.h, 96)
    single = s0
    for _ in range(n_steps):
        single, _ = pcisph_step(single, params, delta, neighbor_fn=nfn)

    slabs = distribute(s0, spec)
    step = make_halo_pcisph_step(mesh, spec, params, delta, k=96)
    n0 = float(jnp.sum(slabs.alive))
    for _ in range(n_steps):
        slabs, max_vel, n_live, _ = jax.block_until_ready(step(slabs))
    pos, _ = collect(slabs)

    assert float(n_live) == n0
    a = np.sort(np.asarray(single.pos), axis=0)
    b = np.sort(pos, axis=0)
    # fp noise in the density-error max can flip the while_loop's exit
    # iteration between the two runs (measured: 4/3000 elements at 1.9e-4
    # after 40 steps) — hence the slightly looser bar than the WCSPH test.
    np.testing.assert_allclose(a, b, atol=1e-3)
    assert float(np.mean(pos[:, 1])) == pytest.approx(
        float(jnp.mean(single.pos[:, 1])), abs=1e-4)
    assert np.isfinite(float(max_vel))


def test_migration_moves_particles_between_slabs(setup):
    params, s0, spec, mesh = setup
    # Give everything a strong +x velocity: particles must flow right.
    s_push = s0._replace(vel=jnp.ones_like(s0.vel) * jnp.asarray([3.0, 0.0, 0.0]))
    slabs = distribute(s_push, spec)
    c = spec.capacity

    def occupancy(sl):
        alive = np.asarray(sl.alive)
        return [float(alive[d * c:(d + 1) * c].sum()) for d in range(N_DEV)]

    occ0 = occupancy(slabs)
    step = make_halo_step(mesh, spec, params, k=32)
    for _ in range(40):
        slabs, _, n_live, _ = step(slabs)
    occ1 = occupancy(slabs)
    assert occ1 != occ0, "no migration happened"
    assert float(n_live) == sum(occ0), "particles lost during migration"
    # Mass moved rightward
    assert sum(i * o for i, o in enumerate(occ1)) > sum(i * o for i, o in enumerate(occ0))


def test_halo_wcsph_gradients_match_single_chip(setup):
    """jax.grad THROUGH the XLA halo twin (make_halo_step: ppermute face
    packs, owner-computed ghost rho/p, migration) against the single-chip
    brute-force step: matched per-particle position gradients agree to
    float noise — the distributed collective protocol transposes exactly
    (round-3 verdict, next-step #3, the halo.py side). A directional FD of
    either implementation converges ~20% away because the fixed-degree
    neighbor capping is genuinely nonsmooth — both implementations' AD
    agree with EACH OTHER to 1e-7, which is the property distribution must
    preserve."""
    from dieselfluid_tpu.parallel.halo import make_halo_step
    from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
    from dieselfluid_tpu.solvers.wcsph import wcsph_step

    params, s0, spec, mesh = setup
    # Jitter positions off the exact lattice (neighbor-selection ties).
    key = jax.random.PRNGKey(3)
    s0 = s0._replace(
        pos=s0.pos + jax.random.normal(key, s0.pos.shape, jnp.float32)
        * (1e-3 * params.h),
        vel=jax.random.normal(jax.random.PRNGKey(4), s0.vel.shape,
                              jnp.float32) * 0.05)
    slabs = distribute(s0, spec)
    step = make_halo_step(mesh, spec, params, k=48)

    def loss_sh(pos):
        out, _, _, _ = step(slabs._replace(pos=pos))
        return jnp.sum((out.alive > 0)[..., None] * jnp.sin(3.0 * out.pos))

    # jax.set_mesh: the transposed shard_map's scalar cotangents carry
    # explicit 'sp' shardings only placeable inside the mesh context.
    with jax.set_mesh(mesh):
        g_sh = jax.grad(loss_sh)(slabs.pos)
    jax.block_until_ready(g_sh)

    nfn = lambda p: brute_force_neighborhood(p, p, params.h, 48)

    def loss_single(pos):
        nxt, _ = wcsph_step(s0._replace(pos=pos), params, neighbor_fn=nfn)
        return jnp.sum(jnp.sin(3.0 * nxt.pos))

    g_s = np.asarray(jax.grad(loss_single)(s0.pos))

    alive = np.asarray(slabs.alive) > 0
    sp = np.asarray(slabs.pos)[alive]
    gp = np.asarray(g_sh)[alive]
    ref = np.asarray(s0.pos)
    d2 = ((ref[:, None, :] - sp[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(ref), "matching is not a bijection"
    scale = np.abs(g_s).max()
    assert scale > 0
    np.testing.assert_allclose(gp[match] / scale, g_s / scale, atol=1e-5)
