"""Dense-pipeline scale sweep on hardware: n3 in {32, 64, 100}."""
import time

import jax
import numpy as np

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
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    print(f"n3={n3} N={n3**3} h={params.h:.4f} plane={spec.plane_shape} "
          f"plane_MB={np.prod(spec.plane_shape)*4/1e6:.1f}")
    step = jax.jit(lambda s: dense_wcsph_step(s, params, spec))
    s, diag = step(state)
    np.asarray(s.pos)
    ovf = [diag.overflow]
    t0 = time.perf_counter()
    for _ in range(steps):
        s, diag = step(s)
        ovf.append(diag.overflow)
    np.asarray(s.pos)
    dt = time.perf_counter() - t0
    n = s.pos.shape[0]
    print(f"  {n*steps/dt/1e6:.3f} M particle-steps/s  ({dt/steps*1e3:.1f} ms/step)"
          f"  max_overflow={int(np.max(np.asarray(ovf)))}")
