"""TPU probe: does jax.grad through dense_wcsph_step compile + run on
hardware? (round-2 verdict weak #1: scoped-VMEM OOM at every size).

Run as a background task over the axon tunnel; sync via device-side scalar
reductions only (see .claude/skills/verify/SKILL.md).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.ops.cellops import DenseCellSpec
from dieselfluid_tpu.solvers.dense_step import dense_wcsph_step


def probe(n3: int):
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = params.replace(d0=float(1.1 * params.d0))
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)

    def loss(pos):
        s = state._replace(pos=pos)
        s2, _ = dense_wcsph_step(s, params, spec)
        return jnp.sum(s2.pos * jnp.sin(jnp.arange(s2.pos.size)
                                        .reshape(s2.pos.shape) * 0.37))

    g = jax.jit(jax.grad(loss))
    t0 = time.time()
    gv = g(state.pos)
    gnorm = float(np.asarray(jnp.sum(gv * gv)))   # scalar sync
    t1 = time.time()
    print(f"n3={n3} n={state.n}: grad COMPILED+RAN, |g|^2={gnorm:.6e} "
          f"finite={np.isfinite(gnorm)} ({t1-t0:.1f}s)", flush=True)
    # time steady-state
    t0 = time.time()
    for _ in range(3):
        gv = g(state.pos)
    _ = float(np.asarray(jnp.sum(gv * gv)))
    print(f"n3={n3}: 3 grad evals in {time.time()-t0:.2f}s", flush=True)
    return gnorm


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for n3 in (8, 16, 32, 80):
        try:
            probe(n3)
        except Exception as e:
            print(f"n3={n3}: FAILED: {type(e).__name__}: {str(e)[:500]}",
                  flush=True)
            sys.exit(1)
    print("ALL OK", flush=True)
