"""Dense WCSPH step probe on real TPU at 1M: ms/step, overflow, finiteness.

Run as a background task (axon tunnel discipline: never kill mid-compute).
Round-4 reference points on v5e: ~190 ms/step (5.25M psteps/s)."""
import time

import numpy as np


def main():
    import jax

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
    from dieselfluid_tpu.ops.cellops import DenseCellSpec
    from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step

    print("devices:", jax.devices(), flush=True)
    n3, extent = 100, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = lattice_rest_density(dx, params)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3,
                                    params.h, capacity=16)
    print(f"spec: nx={spec.nx} ny={spec.ny} nz={spec.nz} sub={spec.sub} "
          f"rows={spec.rows} plane={spec.rows * spec.row_len * 4 / 1e6:.0f} MB",
          flush=True)
    step = jax.jit(lambda s: dense_wcsph_step(s, params, spec))
    t0 = time.perf_counter()
    s, diag = step(state)
    np.asarray(s.pos[0])
    print(f"compile+first: {time.perf_counter() - t0:.1f} s, "
          f"overflow={int(diag.overflow)}", flush=True)
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            s, diag = step(s)
        np.asarray(s.pos[0])
        dt = (time.perf_counter() - t0) / 10
        print(f"trial {trial}: {dt * 1e3:.1f} ms/step "
              f"({s.pos.shape[0] / dt / 1e6:.2f}M psteps/s) "
              f"overflow={int(diag.overflow)}", flush=True)
    ok = np.isfinite(np.asarray(s.pos)).all()
    print("finite:", ok, flush=True)


if __name__ == "__main__":
    main()
