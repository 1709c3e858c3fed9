"""Hardware-gated tests: the dense Pallas pipeline ON A REAL TPU.

Interpret-mode green is not hardware green (round-1 and round-2 verdicts:
the forward faulted in round 1, the backward OOM'd in round 2 — both with
interpret-mode tests passing). These tests compile and run the compiled
kernels, forward AND backward, on the actual chip.

Run with:  DSLTPU_HW=1 python -m pytest tests/test_tpu_hardware.py -v
(as a background task over the axon tunnel — see
.claude/skills/verify/SKILL.md). The default CPU-forced test run skips them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs real TPU hardware (run with DSLTPU_HW=1)",
)


@pytest.fixture(scope="module")
def setup():
    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.ops.cellops import DenseCellSpec

    n3, extent = 8, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    s = dam_break_state(n3, params, extent=extent)
    key = jax.random.PRNGKey(0)
    s = s._replace(vel=jax.random.normal(key, s.vel.shape) * 0.1)
    params = params.replace(d0=float(1.1 * params.d0))
    spec = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h,
                                    capacity=16)
    return params, s, spec


@requires_tpu
class TestCompiledKernels:
    def test_wcsph_forward_matches_oracle(self, setup):
        from dieselfluid_tpu.models import field as F
        from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
        from dieselfluid_tpu.solvers.dense_step import dense_density_forces

        params, s, spec = setup
        rho, press, force, ovf = jax.jit(
            lambda st: dense_density_forces(st, params, spec))(s)
        nb = brute_force_neighborhood(s.pos, s.pos, params.h, 96)
        rho_o = np.asarray(F.density_with_self(s.pos, nb, params))
        np.testing.assert_allclose(np.asarray(rho), rho_o, rtol=1e-4)

    def test_wcsph_grad_matches_xla_path(self, setup):
        """The round-2 flagship gap: the COMPILED backward on hardware,
        pinned against the XLA gather path's autodiff."""
        from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
        from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step
        from dieselfluid_tpu.solvers.wcsph import wcsph_step

        params, s, spec = setup
        key = jax.random.PRNGKey(7)
        w_pos = jax.random.normal(key, s.pos.shape)

        def loss_dense(pos, vel):
            st = s._replace(pos=pos, vel=vel)
            nxt, _ = dense_wcsph_step(st, params, spec)
            return jnp.sum(nxt.pos * w_pos) + jnp.sum(nxt.vel**2)

        def loss_xla(pos, vel):
            st = s._replace(pos=pos, vel=vel)
            nfn = lambda p: brute_force_neighborhood(p, p, params.h, 96)
            nxt, _ = wcsph_step(st, params, neighbor_fn=nfn)
            return jnp.sum(nxt.pos * w_pos) + jnp.sum(nxt.vel**2)

        gp_d, gv_d = jax.jit(jax.grad(loss_dense, argnums=(0, 1)))(s.pos, s.vel)
        gp_x, gv_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(s.pos, s.vel)
        scale = float(jnp.abs(gp_x).max())
        np.testing.assert_allclose(np.asarray(gp_d) / scale,
                                   np.asarray(gp_x) / scale, atol=2e-4)
        vscale = float(jnp.abs(gv_x).max())
        np.testing.assert_allclose(np.asarray(gv_d) / vscale,
                                   np.asarray(gv_x) / vscale, atol=2e-4)

    def test_pcisph_materials_grad_finite(self, setup):
        """Compiled reverse-mode through the PCISPH correction scan with
        traced materials, on hardware."""
        from dieselfluid_tpu.models.materials import Materials
        from dieselfluid_tpu.solvers.dense_step import dense_pcisph_step
        from dieselfluid_tpu.solvers.pcisph import compute_pci_delta

        params, s, spec = setup
        mats = Materials.from_params(params)
        delta = compute_pci_delta(params, 2.0 / 8 * 0.5)

        def loss(m):
            nxt, _ = dense_pcisph_step(s, params, spec, delta, materials=m,
                                       unroll_for_grad=True)
            return jnp.sum(nxt.pos**2)

        g = jax.jit(jax.grad(loss))(mats)
        for f in ("mu", "d0", "mass"):
            v = float(getattr(g, f))
            assert np.isfinite(v), (f, v)
        assert float(g.mu) != 0.0

    def test_pcisph_column_skip_parity_on_chip(self, setup):
        """The SMEM-gated active sweeps (column_skip) COMPILED on hardware,
        tracking the ungated plane-resident loop. Exercises the per-patch
        activity input + conditional patch skipping on the real chip."""
        from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
        from dieselfluid_tpu.solvers.dense_step import dense_pcisph_step
        from dieselfluid_tpu.solvers.pcisph import compute_pci_delta

        _, s, spec = setup
        dx = 2.0 / 8 * 0.5
        from dieselfluid_tpu.config import FluidParams

        params = lattice_rest_density(dx, FluidParams.for_spacing(dx))
        s = s._replace(vel=s.vel + jnp.asarray([0.0, -1.0, 0.0]))
        delta = compute_pci_delta(params, dx)
        a = b = s
        for _ in range(3):
            a, da = jax.jit(lambda st: dense_pcisph_step(
                st, params, spec, delta))(a)
            b, db = jax.jit(lambda st: dense_pcisph_step(
                st, params, spec, delta, column_skip=True))(b)
        assert int(da.iters) >= 2, "loop under-exercised"
        np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                                   atol=1e-4)


@requires_tpu
class TestTiledRasterizerHW:
    def test_tiled_matches_xla_on_chip(self):
        """Compiled tile-raster kernels vs the XLA scatter splat, fwd+bwd."""
        from dieselfluid_tpu.render.camera import Camera
        from dieselfluid_tpu.render.splat import splat_particles
        from dieselfluid_tpu.render.splat_pallas import splat_particles_tiled

        cam = Camera.at((0.0, 0.0, -2.0), front=(0.0, 0.0, 1.0),
                        fov_deg=60.0, aspect=1.0)
        pos = jax.random.uniform(jax.random.PRNGKey(0), (4096, 3),
                                 jnp.float32, -0.5, 0.5)
        a = jax.jit(lambda p: splat_particles(p, 0.05, cam, 256, 256))(pos)
        b = jax.jit(lambda p: splat_particles_tiled(
            p, 0.05, cam, 256, 256, k=1024))(pos)
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                                   atol=1e-5)

        def loss(p, tiled):
            img = (splat_particles_tiled(p, 0.05, cam, 256, 256, k=1024)
                   if tiled else splat_particles(p, 0.05, cam, 256, 256))
            return jnp.sum(img.color ** 2)

        ga = jax.jit(jax.grad(loss), static_argnums=1)(pos, False)
        gb = jax.jit(jax.grad(loss), static_argnums=1)(pos, True)
        scale = float(jnp.abs(ga).max())
        # 1e-4: hardware accumulation order differs between the scatter and
        # the tile sweep (measured: 1/12288 elements at 9e-5 on v5e).
        np.testing.assert_allclose(np.asarray(gb) / scale,
                                   np.asarray(ga) / scale, atol=1e-4)
