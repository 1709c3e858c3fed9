"""Phase timing at 1M: binning, scatter-build vs map-build, sweeps, gathers."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
    from dieselfluid_tpu.ops.cellops import (DenseCellSpec, build_planes,
                                             build_planes_from_map,
                                             dense_indices, gather_planes,
                                             slot_particle_map)
    from dieselfluid_tpu.ops.pallas_sph import density_planes, force_planes
    from dieselfluid_tpu.ops.smoothing import KernelCoeffs, tait_eos

    n3, extent = 100, 0.5
    dx = (2.0 / n3) * extent
    params = lattice_rest_density(dx, FluidParams.for_spacing(dx))
    state = dam_break_state(n3, params, extent=extent)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    k = KernelCoeffs.build(params.h)
    pos, vel = state.pos, state.vel

    def timeit(name, fn, *args, reps=5):
        jfn = jax.jit(fn)
        out = np.asarray(jfn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(*args)
        out = np.asarray(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:36s} {ms:8.2f} ms (check={out:.5g})", flush=True)

    flat, valid, _ = jax.jit(lambda p: dense_indices(p, spec))(pos)
    smap = jax.jit(lambda f, v: slot_particle_map(f, v, spec))(flat, valid)

    def chans(p, v):
        return {"x": p[:, 0], "y": p[:, 1], "z": p[:, 2],
                "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2]}

    timeit("dense_indices (argsort)",
           lambda p: dense_indices(p, spec)[0].sum(), pos)
    timeit("slot_particle_map (scatter-max)",
           lambda f, v: slot_particle_map(f, v, spec).sum(), flat, valid)
    timeit("build_planes scatter x7",
           lambda p, v, f, va: sum(x.sum() for x in build_planes(
               chans(p, v), f, va, spec).values()), pos, vel, flat, valid)
    timeit("build_planes_from_map gather x7",
           lambda p, v, m: sum(x.sum() for x in build_planes_from_map(
               chans(p, v), m, spec).values()), pos, vel, smap)

    planes = jax.jit(lambda p, v, f, va: build_planes(chans(p, v), f, va,
                                                      spec))(pos, vel, flat,
                                                             valid)
    rho_plane = jax.jit(
        lambda pl_: density_planes(pl_, spec, k, params.mass))(planes)
    press_plane = jax.jit(lambda rp, m: jnp.where(
        m > 0, tait_eos(rp, params.d0, params.p0, params.tait_gamma,
                        params.tait_w), 0.0))(rho_plane, planes["mask"])
    timeit("density sweep (half-row)",
           lambda pl_: density_planes(pl_, spec, k, params.mass).sum(),
           planes)
    timeit("force sweep fused (half-row)",
           lambda pl_, rp, pp: sum(x.sum() for x in force_planes(
               pl_, rp, pp, spec, k, params.mass, float(params.mu))),
           planes, rho_plane, press_plane)
    timeit("gather_planes x5 (particles)",
           lambda rp, pp, f: gather_planes([rp, pp, rp, pp, rp], f).sum(),
           rho_plane, press_plane, flat)


if __name__ == "__main__":
    main()
