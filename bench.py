"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: particle-steps/sec on the Pallas dense-cell WCSPH pipeline (the
production TPU path), measured with hard host-fetch synchronization (the
axon tunnel's block_until_ready does not reliably wait — see
.claude/skills/verify/SKILL.md). The reference publishes no speed numbers
(BASELINE.md); vs_baseline normalizes against the driver's aspirational
1M particle-steps/sec/chip target.
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_PSTEPS_PER_SEC = 1.0e6


def bench_dense_wcsph(n3: int = 16, steps: int = 50, capacity: int = 16):
    import jax

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.ops.cellops import DenseCellSpec
    from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step

    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = params.replace(d0=float(1.1 * params.d0))
    spec = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h,
                                    capacity=capacity)
    step = jax.jit(lambda s: dense_wcsph_step(s, params, spec)[0])

    s = step(state)
    np.asarray(s.pos)                      # hard sync (compile + first step)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = step(s)
    np.asarray(s.pos)                      # hard sync
    dt = time.perf_counter() - t0
    n = s.pos.shape[0]
    return n, steps, dt, n * steps / dt, "dense-pallas"


def bench_cellgrid_wcsph(n3: int = 16, steps: int = 20, k: int = 64):
    """Fallback: XLA cell-grid path (runs anywhere)."""
    import jax

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.cellgrid import CellGridSpec, cell_grid_neighborhood
    from dieselfluid_tpu.solvers.wcsph import wcsph_step

    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = params.replace(d0=float(1.1 * params.d0))
    spec = CellGridSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h, capacity=24)
    nfn = lambda p: cell_grid_neighborhood(p, p, params.h, k, spec)
    step = jax.jit(lambda s: wcsph_step(s, params, neighbor_fn=nfn)[0])

    s = step(state)
    np.asarray(s.pos)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = step(s)
    np.asarray(s.pos)
    dt = time.perf_counter() - t0
    n = s.pos.shape[0]
    return n, steps, dt, n * steps / dt, "xla-cellgrid"


def main():
    try:
        n, steps, dt, v, path = bench_dense_wcsph()
    except Exception:
        n, steps, dt, v, path = bench_cellgrid_wcsph()
    print(
        json.dumps(
            {
                "metric": f"wcsph particle-steps/sec ({n} particles, {path})",
                "value": round(v, 1),
                "unit": "particle-steps/sec",
                "vs_baseline": round(v / TARGET_PSTEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
