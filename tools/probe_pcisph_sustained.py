"""Sustained PCISPH 1M: 40-step burn-in + timed window, column_skip A/B."""
import sys
import time

import numpy as np


def main():
    import jax

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
    from dieselfluid_tpu.ops.cellops import DenseCellSpec
    from dieselfluid_tpu.solvers.dense_step import dense_pcisph_step
    from dieselfluid_tpu.solvers.pcisph import compute_pci_delta

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    burnin = 40
    n3, extent = 100, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = lattice_rest_density(dx, params)
    delta = compute_pci_delta(params, dx)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    print("devices:", jax.devices(), flush=True)

    for skip in (False, True):
        step = jax.jit(lambda s, cs=skip: dense_pcisph_step(
            s, params, spec, delta, warm_start=True, column_skip=cs))
        t0 = time.perf_counter()
        s, diag = step(state)
        np.asarray(s.pos[0])
        print(f"skip={skip}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        ovf = [diag.overflow]
        for _ in range(burnin):
            s, diag = step(s)
            ovf.append(diag.overflow)
        np.asarray(s.pos[0])
        iters = []
        t0 = time.perf_counter()
        for _ in range(steps):
            s, diag = step(s)
            ovf.append(diag.overflow)
            iters.append(diag.iters)
        np.asarray(s.pos[0])
        dt = (time.perf_counter() - t0) / steps
        n = s.pos.shape[0]
        print(f"skip={skip}: {dt * 1e3:.1f} ms/step "
              f"({n / dt / 1e6:.2f}M psteps/s) mean_iters "
              f"{float(np.mean(np.asarray(iters))):.2f} "
              f"max_overflow {int(np.max(np.asarray(ovf)))} "
              f"finite {bool(np.isfinite(np.asarray(s.pos)).all())}",
              flush=True)


if __name__ == "__main__":
    main()
