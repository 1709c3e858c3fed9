"""Phase breakdown of the tiled splat rasterizer at 512k x 1080p (v5e).

Splits the ~870 ms fwd+bwd frame into: binning (XLA argsort+scatter),
forward rasterize kernel, backward kernel + gather, and the image-space
epilogue — to find where the composite's remaining time lives."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench
bench.enable_compile_cache()
import jax, jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render import splat_pallas as SP

n3, extent = 80, 0.5
dx = (2.0 / n3) * extent
params = FluidParams.for_spacing(dx)
state = dam_break_state(n3, params, extent=extent)
cam = Camera.at((0.0, 0.6, -2.8), front=(0.0, -0.35, 1.0), fov_deg=55.0,
                aspect=1920.0/1080.0)
pos = state.pos
radius = dx * 0.7

def timed(label, jfn, *args, reps=3):
    out = jfn(*args); jax.block_until_ready(out)
    # scalar-sync via tree reduce
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    s = float(sum(jnp.sum(x) for x in jax.tree.leaves(out)))
    dt = (time.perf_counter() - t0)/reps*1e3
    print(f"{label}: {dt:.1f} ms", flush=True)
    return out

spec = SP.TileSpec(width=1920, height=1080, k=8192)
from dieselfluid_tpu.render.splat import _project

proj = jax.jit(lambda p: _project(p, radius, cam, 1920, 1080))
u, v, z, r, front = proj(pos)

binf = jax.jit(lambda u,v,z,r,f: SP.bin_tile_entries(u,v,z,r,f,spec)[0])
planes = timed("bin_tile_entries", binf, u, v, z, r, front)

rast = jax.jit(lambda pl_: SP._rasterize(pl_, spec, 6.0, 4.0, False))
timed("fwd rasterize kernel", rast, planes)

full_f = jax.jit(lambda p: SP.splat_particles_tiled(
    p, radius, cam, width=1920, height=1080, k=8192).color)
timed("full splat fwd", full_f, pos)

g = jax.jit(jax.grad(lambda p: jnp.sum(full_f(p) ** 2)))
timed("full splat fwd+bwd", g, pos)
