"""TPU probe: dense WCSPH beyond 1M on one chip (HBM headroom check).

8M particles (n3=200): the dense plane set is ~7 GB — comfortably inside
the 16G HBM — so the single-chip path scales 8x past the baseline config
before the multi-chip slab decomposition is even needed.
"""

import time

import numpy as np
import jax

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
from dieselfluid_tpu.ops.cellops import DenseCellSpec
from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step


def probe(n3, steps=5):
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = lattice_rest_density(dx, params)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    step = jax.jit(lambda s: dense_wcsph_step(s, params, spec))
    s, diag = step(state)
    _ = float(np.asarray(s.pos[0, 0]))
    t0 = time.perf_counter()
    ovf = []
    for _i in range(steps):
        s, diag = step(s)
        ovf.append(int(np.asarray(diag.overflow)))
    dt = time.perf_counter() - t0
    n = s.pos.shape[0]
    print(f"n={n}: {dt/steps*1e3:.0f} ms/step ({n*steps/dt:.0f} psteps/s) "
          f"max_overflow={max(ovf)}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe(200)
