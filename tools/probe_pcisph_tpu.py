"""TPU probe: dense PCISPH 1M cost structure — capacity 16 vs 32, per-step
overflow and correction-iteration counts (round-2 verdict, next-step #3)."""

import time

import numpy as np
import jax

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.ops.cellops import DenseCellSpec
from dieselfluid_tpu.solvers.dense_step import dense_pcisph_step
from dieselfluid_tpu.solvers.pcisph import compute_pci_delta


def probe(n3: int, capacity: int, steps: int):
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = params.replace(d0=float(1.1 * params.d0))
    delta = compute_pci_delta(params, dx)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=capacity)
    step = jax.jit(lambda s: dense_pcisph_step(s, params, spec, delta))

    s, diag = step(state)
    _ = float(np.asarray(s.pos[0, 0]))   # sync compile + first step
    rows = []
    t0 = time.perf_counter()
    for i in range(steps):
        s, diag = step(s)
        rows.append((int(np.asarray(diag.overflow)),
                     int(np.asarray(diag.iters))))
    dt = time.perf_counter() - t0
    n = s.pos.shape[0]
    print(f"cap={capacity} n={n}: {dt/steps*1e3:.1f} ms/step "
          f"({n*steps/dt:.0f} psteps/s) overflow/iters per step: {rows}",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe(100, 32, 5)
    probe(100, 16, 5)
