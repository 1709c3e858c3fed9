"""Sustained plane-resident WCSPH at 1M: agitated window, rebuilds counted."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
    from dieselfluid_tpu.ops.cellops import DenseCellSpec
    from dieselfluid_tpu.solvers.dense_resident import (
        dense_wcsph_resident_step, plane_state_from_fluid,
        fluid_state_from_planes)

    n3, extent = 100, 0.5
    dx = (2.0 / n3) * extent
    params = lattice_rest_density(dx, FluidParams.for_spacing(dx))
    state = dam_break_state(n3, params, extent=extent)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    for skin in (0.05, 0.2):
        ps = jax.jit(lambda s: plane_state_from_fluid(s, spec))(state)
        step = jax.jit(lambda p: dense_wcsph_resident_step(p, params, spec, skin=skin))
        sync = jax.jit(lambda p: jnp.sum(p.planes["x"]))
        ps = step(ps); float(sync(ps))
        # burn-in 100 steps into the agitated regime
        t0 = time.perf_counter()
        for _ in range(100):
            ps = step(ps)
        float(sync(ps))
        tb = time.perf_counter() - t0
        rb_burn = int(ps.rebuilds)
        t0 = time.perf_counter()
        for _ in range(30):
            ps = step(ps)
        float(sync(ps))
        dt = time.perf_counter() - t0
        rho_like = float(jax.jit(lambda p: jnp.max(jnp.abs(p.planes["vx"])))(ps))
        print(f"skin={skin}: burnin 100 steps {tb:.1f}s ({rb_burn} rebuilds), "
              f"timed 30 steps {dt/30*1e3:.1f} ms/step "
              f"({1e6*30/dt/1e6:.2f}M psteps/s), rebuilds in window "
              f"{int(ps.rebuilds)-rb_burn}, overflow {int(ps.overflow)}, "
              f"max|vx| {rho_like:.2f}", flush=True)
        out = fluid_state_from_planes(ps, state.pos.shape[0], params, spec)
        ok = bool(jax.jit(lambda p: jnp.all(jnp.isfinite(p)))(out.pos))
        print(f"  finite={ok}", flush=True)

main()
