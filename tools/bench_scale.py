import time, numpy as np, jax
from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.ops.cellops import DenseCellSpec
from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step

for n3, steps in [(32, 30), (64, 20), (100, 10)]:
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = params.replace(d0=float(1.1 * params.d0))
    spec = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h, capacity=16)
    print(f"n3={n3} N={n3**3} h={params.h:.4f} plane={spec.plane_shape} "
          f"plane_MB={np.prod(spec.plane_shape)*4/1e6:.1f}")
    step = jax.jit(lambda s: dense_wcsph_step(s, params, spec)[0])
    s = step(state); np.asarray(s.pos)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = step(s)
    np.asarray(s.pos)
    dt = time.perf_counter() - t0
    n = s.pos.shape[0]
    print(f"  {n*steps/dt/1e6:.3f} M particle-steps/s  ({dt/steps*1e3:.1f} ms/step)")
