"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: particle-steps/sec on the largest config the current build supports,
run on whatever accelerator jax.devices() provides (the driver runs this on a
real TPU chip). The reference publishes no speed numbers (BASELINE.md), so
vs_baseline is reported against the driver's aspirational 1M-particle target
config as particles*steps/sec normalized — vs_baseline = value / TARGET.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


# Aspirational normalizer: 1M particle-steps/sec/chip (BASELINE.json metric is
# particle-steps/sec/chip at 1M particles; no published reference value).
TARGET_PSTEPS_PER_SEC = 1.0e6


def bench_wcsph(n3: int = 16, k: int = 96, steps: int = 20, warmup: int = 3):
    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
    from dieselfluid_tpu.solvers.wcsph import rollout, wcsph_step

    extent = 0.5
    params = FluidParams.for_spacing((2.0 / n3) * extent)
    state = dam_break_state(n3, params, extent=extent)
    params = calibrate_rest_density(state.pos, params)
    n = state.n

    from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood

    nfn = lambda pos: brute_force_neighborhood(pos, pos, params.h, k)
    step = lambda s: wcsph_step(s, params, neighbor_fn=nfn)

    # Warmup / compile
    s, _, _ = rollout(step, state, warmup)
    jax.block_until_ready(s.pos)

    t0 = time.perf_counter()
    s, _, _ = rollout(step, s, steps)
    jax.block_until_ready(s.pos)
    dt = time.perf_counter() - t0

    psteps_per_sec = n * steps / dt
    return n, steps, dt, psteps_per_sec


def main():
    n, steps, dt, v = bench_wcsph()
    print(
        json.dumps(
            {
                "metric": f"wcsph particle-steps/sec ({n} particles, bruteforce NN)",
                "value": round(v, 1),
                "unit": "particle-steps/sec",
                "vs_baseline": round(v / TARGET_PSTEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
