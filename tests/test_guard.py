"""Failure detection + elastic recovery (utils/guard.py).

The reference has no runtime self-diagnosis (SURVEY §5); these tests pin the
new subsystem: device-side health reductions, rollback-to-snapshot recovery
with dt backoff, and hard failure after exhausted retries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
from dieselfluid_tpu.solvers.integrate import StepDiagnostics
from dieselfluid_tpu.solvers.wcsph import wcsph_step
from dieselfluid_tpu.utils.guard import (
    GuardedRunner,
    HealthReport,
    SimulationDiverged,
    health_check,
)


def small_sim(n3=6, dt_scale=1.0):
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = calibrate_rest_density(state.pos, params)
    params = params.replace(dt=float(params.dt * dt_scale))

    def make_step(p):
        nfn = lambda pos: brute_force_neighborhood(pos, pos, p.h, 32)
        return lambda s: wcsph_step(s, p, neighbor_fn=nfn)

    return state, params, make_step


class TestHealthCheck:
    def test_healthy_state(self):
        state, params, make_step = small_sim()
        state, diag = make_step(params)(state)
        rep = health_check(state, params, diag)
        assert bool(rep.finite)
        assert float(rep.max_vel) < np.sqrt(params.tait_w / params.d0)

    def test_flags_nan(self):
        state, params, _ = small_sim()
        bad = state._replace(pos=state.pos.at[0, 0].set(jnp.nan))
        rep = health_check(bad, params)
        assert not bool(rep.finite)

    def test_reports_overflow(self):
        state, params, _ = small_sim()
        diag = StepDiagnostics(max_vel=jnp.float32(0), max_force=jnp.float32(0),
                               overflow=jnp.int32(7))
        rep = health_check(state, params, diag)
        assert int(rep.overflow) == 7


class TestGuardedRunner:
    def test_healthy_run_advances(self):
        state, params, make_step = small_sim()
        r = GuardedRunner(state, params, make_step, check_every=10)
        rep = r.run(30)
        assert r.step_count == 30
        assert r.recoveries == 0
        assert bool(rep.finite)

    def test_recovers_from_dt_blowup(self):
        # 40x the CFL timestep makes the dam break explode within a few
        # frames; the runner must roll back, shorten dt, and finish.
        state, params, make_step = small_sim(dt_scale=40.0)
        r = GuardedRunner(state, params, make_step, check_every=10,
                          dt_backoff=0.25, max_retries=4)
        rep = r.run(30)
        assert r.recoveries >= 1
        assert r.params.dt < params.dt          # backoff applied
        assert bool(rep.finite)
        assert r.step_count == 30

    def test_raises_after_exhausted_retries(self):
        state, params, _ = small_sim()

        def always_nan(p):
            def step(s):
                s = s._replace(pos=s.pos * jnp.nan)
                return s, StepDiagnostics(max_vel=jnp.float32(0),
                                          max_force=jnp.float32(0),
                                          overflow=jnp.int32(0))
            return step

        r = GuardedRunner(state, params, always_nan, check_every=5,
                          max_retries=2)
        with pytest.raises(SimulationDiverged, match="non-finite"):
            r.run(20)
        assert r.recoveries == 2

    def test_overflow_budget_triggers_recovery_then_raises(self):
        state, params, _ = small_sim()

        def overflowing(p):
            def step(s):
                return s, StepDiagnostics(max_vel=jnp.float32(0),
                                          max_force=jnp.float32(0),
                                          overflow=jnp.int32(100))
            return step

        r = GuardedRunner(state, params, overflowing, check_every=5,
                          overflow_budget=10, max_retries=1)
        with pytest.raises(SimulationDiverged, match="overflow"):
            r.run(20)


class TestGuardedSlabRunner:
    """Failure detection + checkpoint/resume for the multi-chip slab paths
    (round-2 verdict, next-step #7)."""

    def _slab_sim(self, dt_scale=1.0):
        from dieselfluid_tpu.parallel.halo import (
            SlabSpec,
            distribute,
            make_halo_step,
        )
        from dieselfluid_tpu.parallel.sharding import particle_mesh

        n3, extent, n_dev = 8, 0.5, 4
        dx = (2.0 / n3) * extent
        params = FluidParams.for_spacing(dx)
        s0 = dam_break_state(n3, params, extent=extent)
        params = calibrate_rest_density(s0.pos, params)
        params = params.replace(dt=float(params.dt * dt_scale))
        spec = SlabSpec(n_dev=n_dev, capacity=256, halo_capacity=128,
                        migrate_capacity=64, h=params.h)
        mesh = particle_mesh(n_dev)
        slabs = distribute(s0, spec)

        def make_step(p):
            return make_halo_step(mesh, spec, p, k=48)

        return slabs, params, make_step

    def test_healthy_slab_run_advances(self):
        from dieselfluid_tpu.utils.guard import GuardedSlabRunner

        slabs, params, make_step = self._slab_sim()
        r = GuardedSlabRunner(slabs, params, make_step, check_every=5)
        max_vel, n_live = r.run(10)
        assert r.step_count == 10 and r.recoveries == 0
        assert float(n_live) == r.n0
        assert np.isfinite(float(max_vel))

    def test_slab_recovery_from_dt_blowup(self):
        from dieselfluid_tpu.utils.guard import GuardedSlabRunner

        slabs, params, make_step = self._slab_sim(dt_scale=60.0)
        r = GuardedSlabRunner(slabs, params, make_step, check_every=5,
                              max_retries=3)
        try:
            r.run(10)
        except SimulationDiverged:
            pass
        assert r.recoveries >= 1
        assert r.params.dt < params.dt

    def test_slab_checkpoint_kill_and_resume(self, tmp_path):
        from dieselfluid_tpu.io.checkpoint import (
            Checkpointer,
            load_slab_checkpoint,
        )
        from dieselfluid_tpu.utils.guard import GuardedSlabRunner

        slabs, params, make_step = self._slab_sim()
        ck = Checkpointer(str(tmp_path / "ck"), interval=5)
        r = GuardedSlabRunner(slabs, params, make_step, check_every=5,
                              checkpointer=ck)
        r.run(10)
        ref = r.slabs

        # "Kill": throw the runner away; resume from the latest checkpoint.
        import os

        steps_dirs = sorted(os.listdir(ck.root))
        assert steps_dirs, "no slab checkpoint written"
        loaded, step, lparams = load_slab_checkpoint(
            os.path.join(ck.root, steps_dirs[-1]))
        assert step == 10
        assert lparams.dt == pytest.approx(params.dt)
        np.testing.assert_allclose(np.asarray(loaded.pos),
                                   np.asarray(ref.pos), atol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded.pressure),
                                   np.asarray(ref.pressure), atol=1e-6)

        # Resumed runner continues stepping.
        r2 = GuardedSlabRunner(loaded, lparams, make_step, check_every=5)
        r2.run(5)
        assert r2.step_count == 5
