"""TPU soak: 1M-particle dense WCSPH under the failure-detection runner.

Robustness evidence at production scale: 200 frames with device-side health
checks every 25, rolling the dam break through impact. Reports wall time,
recoveries, and final health scalars.
"""

import time

import numpy as np
import jax

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.ops.cellops import DenseCellSpec
from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step
from dieselfluid_tpu.utils.guard import GuardedRunner


def main(n3=100, steps=200, check_every=25):
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density

    params = lattice_rest_density(dx, params)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)

    def make_step(p):
        return lambda s: dense_wcsph_step(s, p, spec)

    runner = GuardedRunner(state, params, make_step, check_every=check_every,
                           vel_limit=1.5)
    t0 = time.perf_counter()
    rep = runner.run(steps)
    dt = time.perf_counter() - t0
    n = state.pos.shape[0]
    print(f"soak: {steps} steps x {n} particles in {dt:.1f}s "
          f"({n*steps/dt:.0f} psteps/s incl. checks) recoveries="
          f"{runner.recoveries} max_vel={float(rep.max_vel):.3f} "
          f"rho_max/d0={float(rep.max_rho_ratio):.4f} "
          f"overflow={int(rep.overflow)} dt_now={runner.params.dt:.6f}",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
