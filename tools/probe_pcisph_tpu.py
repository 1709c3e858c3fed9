"""TPU probe: dense PCISPH 1M with equilibrium lattice d0 — per-step
overflow/iteration behavior through the early compression phase, capacity 16
(round-2 verdict, next-step #3: >= 1M psteps/s with overflow 0)."""

import time

import numpy as np
import jax

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
from dieselfluid_tpu.ops.cellops import DenseCellSpec
from dieselfluid_tpu.solvers.dense_step import dense_pcisph_step
from dieselfluid_tpu.solvers.pcisph import compute_pci_delta


def probe(n3: int, capacity: int, steps: int, warm_start: bool = True):
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = lattice_rest_density(dx, params)
    delta = compute_pci_delta(params, dx)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=capacity)
    step = jax.jit(lambda s: dense_pcisph_step(s, params, spec, delta,
                                               warm_start=warm_start))

    s, diag = step(state)
    _ = float(np.asarray(s.pos[0, 0]))
    rows = []
    t0 = time.perf_counter()
    for i in range(steps):
        s, diag = step(s)
        rows.append((int(np.asarray(diag.overflow)),
                     int(np.asarray(diag.iters))))
    dt = time.perf_counter() - t0
    n = s.pos.shape[0]
    ovf = [r[0] for r in rows]
    its = [r[1] for r in rows]
    print(f"cap={capacity} warm={warm_start} n={n}: {dt/steps*1e3:.1f} ms/step "
          f"({n*steps/dt:.0f} psteps/s) max_overflow={max(ovf)} "
          f"iters={its}", flush=True)
    print(f"  overflow trace: {ovf}", flush=True)
    print(f"  max|v|={float(np.asarray(jnp.abs(s.vel).max())):.3f} "
          f"rho_max/d0={float(np.asarray(s.density.max()))/params.d0:.4f}",
          flush=True)


if __name__ == "__main__":
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    probe(100, 16, 60, warm_start=True)
