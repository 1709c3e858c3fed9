"""Break a dense WCSPH step into its phases and time each on hardware.

Usage: python tools/profile_step.py [n3]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.ops.cellops import DenseCellSpec, build_planes, dense_indices, gather_plane
from dieselfluid_tpu.ops.pallas_sph import density_planes, force_planes
from dieselfluid_tpu.ops.smoothing import KernelCoeffs, tait_eos
from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step

n3 = int(sys.argv[1]) if len(sys.argv) > 1 else 100
extent = 0.5
dx = (2.0 / n3) * extent
params = FluidParams.for_spacing(dx)
state = dam_break_state(n3, params, extent=extent)
params = params.replace(d0=float(1.1 * params.d0))
spec = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h, capacity=16)
k = KernelCoeffs.build(params.h)
print(f"n3={n3} N={n3**3} spec rows={spec.rows} sub={spec.sub}")


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)     # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {name:28s} {ms:8.2f} ms")
    return out


pos, vel = state.pos, state.vel

f_idx = jax.jit(lambda p: dense_indices(p, spec))
flat, valid, ovf = timeit("dense_indices (argsort)", f_idx, pos)
print(f"  overflow={int(ovf)}")

f_planes = jax.jit(lambda p, v, fl, va: build_planes(
    {"x": p[:, 0], "y": p[:, 1], "z": p[:, 2],
     "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2]}, fl, va, spec))
planes = timeit("build_planes (scatter x7)", f_planes, pos, vel, flat, valid)

f_dens = jax.jit(lambda pl_: density_planes(pl_, spec, k, params.mass))
rho_plane = timeit("density_planes (pallas)", f_dens, planes)

f_press = jax.jit(lambda rp, m: jnp.where(
    m > 0, tait_eos(rp, params.d0, params.p0, params.tait_gamma, params.tait_w), 0.0))
press_plane = timeit("tait_eos plane", f_press, rho_plane, planes["mask"])

f_force = jax.jit(lambda pl_, rp, pp: force_planes(
    pl_, rp, pp, spec, k, params.mass, float(params.mu)))
_ = timeit("force_planes (pallas)", f_force, planes, rho_plane, press_plane)

f_gather = jax.jit(lambda rp, fl: gather_plane(rp, fl))
_ = timeit("gather_plane x1", f_gather, rho_plane, flat)

step = jax.jit(lambda s: dense_wcsph_step(s, params, spec)[0])
timeit("full dense_wcsph_step", step, state)
