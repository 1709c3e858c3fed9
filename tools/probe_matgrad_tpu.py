"""TPU probe: bisect the config-4 gradient (PCISPH + materials + sky-lit
render) by size, and isolate the factored force backwards at scale."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.materials import Materials
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
from dieselfluid_tpu.ops.cellops import DenseCellSpec
from dieselfluid_tpu.solvers.dense_step import dense_pcisph_step, dense_wcsph_step
from dieselfluid_tpu.solvers.pcisph import compute_pci_delta


def setup(n3):
    extent = 0.5
    dx = (2.0 / n3) * extent
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=extent)
    params = lattice_rest_density(dx, params)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    return dx, params, state, spec


def probe_wcsph_materials(n3):
    """Factored pressure+viscosity backwards at scale, no scan."""
    dx, params, state, spec = setup(n3)
    mats = Materials.from_params(params)

    def loss(m):
        nxt, _ = dense_wcsph_step(state, params, spec, materials=m)
        return jnp.sum(nxt.pos ** 2)

    t0 = time.time()
    g = jax.jit(jax.grad(loss))(mats)
    v = float(np.asarray(g.mu))
    print(f"wcsph-mat n3={n3}: OK g_mu={v:.4e} finite={np.isfinite(v)} "
          f"({time.time()-t0:.0f}s)", flush=True)


def probe_pcisph_materials(n3, render=False):
    dx, params, state, spec = setup(n3)
    mats = Materials.from_params(params)
    delta = compute_pci_delta(params, dx)

    if render:
        from dieselfluid_tpu.render.camera import Camera
        from dieselfluid_tpu.render.splat import splat_particles
        from dieselfluid_tpu.sky.bake import bake_sky_cubemap

        env = bake_sky_cubemap((0.3, 0.8, 0.5), size=48)
        cam = Camera.at((0.0, 0.6, -2.8), front=(0.0, -0.35, 1.0),
                        fov_deg=55.0, aspect=1920.0 / 1080.0)

        def loss(m):
            nxt, _ = dense_pcisph_step(state, params, spec, delta,
                                       materials=m, unroll_for_grad=True)
            img = splat_particles(nxt.pos, dx * 0.7, cam, width=1920,
                                  height=1080, env_cube=env, chunk=65536)
            return jnp.sum(img.color ** 2)
    else:
        def loss(m):
            nxt, _ = dense_pcisph_step(state, params, spec, delta,
                                       materials=m, unroll_for_grad=True)
            return jnp.sum(nxt.pos ** 2)

    t0 = time.time()
    g = jax.jit(jax.grad(loss))(mats)
    v = float(np.asarray(g.mu))
    print(f"pcisph-mat n3={n3} render={render}: OK g_mu={v:.4e} "
          f"finite={np.isfinite(v)} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for step_name, fn, args in [
        ("wcsph80", probe_wcsph_materials, (80,)),
        ("pci16", probe_pcisph_materials, (16,)),
        ("pci48", probe_pcisph_materials, (48,)),
        ("pci80", probe_pcisph_materials, (80,)),
        ("pci100", probe_pcisph_materials, (100,)),
        ("pci100r", probe_pcisph_materials, (100, True)),
    ]:
        try:
            fn(*args)
        except Exception as e:
            print(f"{step_name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            sys.exit(1)
    print("ALL OK", flush=True)
