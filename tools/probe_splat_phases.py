"""Phase breakdown of the composite frame at 512k x 1080p (v5e).

Splits the fwd+bwd composite (bench_composite_1080p) into: scene raytrace
pass, splat binning (XLA argsort+scatter), forward rasterize kernel
(emit_normals, 9 outputs), rasterize fwd+bwd (backward kernel + mask
gating), full tiled splat fwd / fwd+bwd, and the composite loss fwd+bwd.

MEASURED (v5e, warm cache, round 5) — before -> after the unique-set
binning + pair-math diet (per-slot reciprocal/exp hoist, rsqrt normals),
then -> after dropping the explicit mask channel (r >= 0.5 is occupancy):
    bin_tile_entries fwd       156.0 -> 114.8 -> 103.5 ms
    fwd rasterize kernel (9ch) 232.0 -> 201.1 -> 207.4 ms
    rasterize fwd+bwd          516.1 -> 449.3 -> 443.3 ms
    full tiled splat fwd       360.6 -> 288.8 -> 283.8 ms
    full tiled splat fwd+bwd   987.2 -> 771.7 -> 767.5 ms
    scene raytrace fwd                           50.0 ms
    composite fwd+bwd          988.6 -> 797.3 -> 794.9 ms
The splat path IS the composite cost (scene pass + soft depth test add
<30 ms to the splat fwd+bwd). Decomposition of the 767 ms: pos->planes
fwd+bwd 117 (bin bwd is ~16 ms of gathers), rasterize fwd+bwd 443, image
epilogue fwd+bwd 27; the ~180 ms remainder is chaining overhead the
isolated-stage timings don't see (a manually inlined bin+rasterize+
epilogue loss measures the same 767 as the public wrapper, so it is
XLA scheduling of the composed program, not wrapper code)."""
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
from dieselfluid_tpu.render.splat import _project
from dieselfluid_tpu.render.composite import render_composite
from dieselfluid_tpu.render.pbr import PBRMaterial
from dieselfluid_tpu.sky.bake import bake_sky_cubemap

n3, extent = 80, 0.5
dx = (2.0 / n3) * extent
params = FluidParams.for_spacing(dx)
state = dam_break_state(n3, params, extent=extent)
cam = Camera.at((0.0, 0.6, -2.8), front=(0.0, -0.35, 1.0), fov_deg=55.0,
                aspect=1920.0 / 1080.0)
pos = state.pos
radius = dx * 0.7
W, H, K = 1920, 1080, 8192
env = bake_sky_cubemap((0.3, 0.8, 0.5), size=48)

v = np.asarray([
    [-2, -1, -2], [2, -1, -2], [2, -1, 2],
    [-2, -1, -2], [2, -1, 2], [-2, -1, 2],
    [-2, -1, 1], [2, -1, 1], [2, 2, 1],
    [-2, -1, 1], [2, 2, 1], [-2, 2, 1],
], np.float32).reshape(4, 3, 3)
tris = jnp.asarray(v)
norms = jnp.asarray([[0, 1, 0], [0, 1, 0], [0, 0, -1], [0, 0, -1]],
                    jnp.float32)
mats = jnp.zeros((4,), jnp.int32)
materials = jax.tree.map(
    lambda leaf: leaf[None],
    PBRMaterial.make(base_color=(0.55, 0.5, 0.45), metallic=0.05,
                     roughness=0.7))


def timed(label, jfn, *args, reps=3):
    # scalar-sync on device so the fetch doesn't time the tunnel; jitted so
    # the sync expression itself compiles during warmup, not inside the loop
    # (eager per-leaf sums cost a fresh tiny compile on the FIRST timed rep,
    # which inflated this probe's first numbers by whole seconds).
    sync = jax.jit(lambda o: jnp.sum(jnp.stack(
        [jnp.sum(x) for x in jax.tree.leaves(o)])))
    out = jfn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
        float(sync(out))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {dt:.1f} ms", flush=True)
    return out


spec = SP.TileSpec(width=W, height=H, k=K)

proj = jax.jit(lambda p: _project(cam, p, W, H))
u, vpix, depth, focal = proj(pos)
in_front = depth > 1e-3
pix_r = jnp.clip(jnp.broadcast_to(radius * focal, u.shape)
                 / jnp.maximum(depth, 1e-3), 0.75, spec.patch / 2.0)
zmin = jnp.min(jnp.where(in_front, depth, jnp.inf))
z_norm = depth - zmin

binf = jax.jit(lambda u_, v_, z_, r_, f_: SP.bin_tile_entries(
    u_, v_, z_, r_, f_, spec)[0])
planes = timed("bin_tile_entries fwd", binf, u, vpix, z_norm, pix_r, in_front)

rast = jax.jit(lambda pl_: SP._rasterize(pl_, spec, 12.0, 2.0, True))
timed("fwd rasterize kernel (9ch)", rast, planes)

rg = jax.jit(jax.grad(
    lambda pl_: sum(jnp.sum(o) for o in
                    SP._rasterize(pl_, spec, 12.0, 2.0, True))))
timed("rasterize fwd+bwd (plane grads)", rg, planes)

full_f = jax.jit(lambda p: SP.splat_particles_tiled(
    p, radius, cam, width=W, height=H, k=K, env_cube=env).color)
timed("full tiled splat fwd", full_f, pos)

gsplat = jax.jit(jax.grad(lambda p: jnp.sum(full_f(p) ** 2)))
timed("full tiled splat fwd+bwd", gsplat, pos)

from dieselfluid_tpu.render.raytrace import render_scene
scene_f = jax.jit(lambda: render_scene(
    tris, norms, mats, materials, cam,
    jnp.asarray((2.0, 3.0, -2.0), jnp.float32), env_cube=env,
    width=W, height=H, env_mode="sh"))
timed("scene raytrace fwd", scene_f)


def loss(p):
    img = render_composite(p, radius, cam, tris, norms, mats, materials,
                           light_pos=(2.0, 3.0, -2.0), env_cube=env,
                           width=W, height=H, tiled_splats_k=K)
    return jnp.sum(img.color ** 2)


gcomp = jax.jit(jax.grad(loss))
timed("composite fwd+bwd", gcomp, pos)
