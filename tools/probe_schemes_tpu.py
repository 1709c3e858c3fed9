"""A/B the sweep blocking schemes (half-row vs full-row ext window) at 1M."""
import time

import numpy as np


def main():
    import jax

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
    from dieselfluid_tpu.ops import pallas_sph as ps
    from dieselfluid_tpu.ops.cellops import (DenseCellSpec, build_planes,
                                             dense_indices)
    from dieselfluid_tpu.ops.smoothing import KernelCoeffs, tait_eos
    import jax.numpy as jnp

    n3, extent = 100, 0.5
    dx = (2.0 / n3) * extent
    params = lattice_rest_density(dx, FluidParams.for_spacing(dx))
    state = dam_break_state(n3, params, extent=extent)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    k = KernelCoeffs.build(params.h)
    pos, vel = state.pos, state.vel
    flat, valid, _ = jax.jit(lambda p: dense_indices(p, spec))(pos)
    planes = jax.jit(lambda p, v, f, va: build_planes(
        {"x": p[:, 0], "y": p[:, 1], "z": p[:, 2],
         "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2]}, f, va, spec))(
        pos, vel, flat, valid)
    rho_plane = jax.jit(
        lambda pl_: ps.density_planes(pl_, spec, k, params.mass))(planes)
    press_plane = jax.jit(lambda rp, m: jnp.where(
        m > 0, tait_eos(rp, params.d0, params.p0, params.tait_gamma,
                        params.tait_w), 0.0))(rho_plane, planes["mask"])

    def timeit(name, fn, *args, reps=5):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = np.asarray(jfn(*args))
        print(f"{name:34s} compile {time.perf_counter() - t0:6.1f} s",
              flush=True, end="")
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(*args)
        out = np.asarray(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {ms:8.2f} ms (check={out:.5g})", flush=True)

    for scheme in ("half", "full"):
        timeit(f"density [{scheme}]",
               lambda pl_, s=scheme: ps._sweep(
                   ps._density_pair(k), ps._D_IN, 1,
                   [pl_[n] for n in ps._D_IN], spec, scheme=s)[0].sum(),
               planes)
        timeit(f"force fused [{scheme}]",
               lambda pl_, rp, pp, s=scheme: sum(x.sum() for x in ps._sweep(
                   ps._force_pair(k, params.mass, float(params.mu)),
                   ps._F_IN, 3,
                   [dict(pl_, rho=rp, press=pp)[n] for n in ps._F_IN],
                   spec, scheme=s)),
               planes, rho_plane, press_plane)
        timeit(f"press-only [{scheme}]",
               lambda pl_, rp, pp, s=scheme: sum(x.sum() for x in ps._sweep(
                   ps._press_pair(k), ps._P_IN, 3,
                   [dict(pl_, rho=rp, press=pp)[n] for n in ps._P_IN],
                   spec, scheme=s)),
               planes, rho_plane, press_plane)


if __name__ == "__main__":
    main()
