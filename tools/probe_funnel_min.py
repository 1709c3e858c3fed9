"""Minimal funnel-kernel compile probe: tiny spec, density sweep only."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.ops.cellops import (DenseCellSpec,
                                             build_planes_from_map,
                                             dense_indices,
                                             slot_particle_map)
    from dieselfluid_tpu.ops.pallas_sph import density_planes
    from dieselfluid_tpu.ops.smoothing import KernelCoeffs

    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("devices:", jax.devices(), flush=True)
    n3, extent = 8, 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    s = dam_break_state(n3, params, extent=extent)
    spec = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h,
                                    capacity=cap)
    print(f"cap={cap} shifts={4 * cap - 1} spec nx={spec.nx} ny={spec.ny} "
          f"sub={spec.sub}", flush=True)
    k = KernelCoeffs.build(params.h)

    def rho_sum(pos):
        flat, valid, _ = dense_indices(pos, spec)
        smap = slot_particle_map(flat, valid, spec)
        planes = build_planes_from_map(
            {"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2]}, smap, spec)
        return density_planes(planes, spec, k, params.mass).sum()

    t0 = time.perf_counter()
    out = np.asarray(jax.jit(rho_sum)(s.pos))
    print(f"cap={cap}: compile+run {time.perf_counter() - t0:.1f}s "
          f"sum={out:.4f}", flush=True)


if __name__ == "__main__":
    main()
