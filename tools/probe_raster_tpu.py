"""TPU probe: Pallas tile rasterizer vs the XLA scatter splat, fwd+bwd at
the bench configs (4k and 512k particles, 1080p)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.splat import splat_particles
from dieselfluid_tpu.render.splat_pallas import splat_particles_tiled


def bench(n, pos, radius, cam, tiled, k=2048, chunk=None, frames=3):
    def loss(p):
        if tiled:
            img = splat_particles_tiled(p, radius, cam, 1920, 1080, k=k)
        else:
            img = splat_particles(p, radius, cam, 1920, 1080, chunk=chunk)
        return jnp.sum(img.color ** 2)

    g = jax.jit(jax.grad(loss))
    t0 = time.time()
    gv = g(pos)
    gn = float(np.asarray(jnp.sum(gv * gv)))
    compile_s = time.time() - t0
    assert np.isfinite(gn), gn
    t0 = time.perf_counter()
    for _ in range(frames):
        gv = g(pos)
    float(np.asarray(jnp.sum(gv * gv)))
    dt = (time.perf_counter() - t0) / frames * 1e3
    tag = f"tiled(k={k})" if tiled else f"xla(chunk={chunk})"
    print(f"n={n} {tag}: {dt:.1f} ms/frame fwd+bwd "
          f"(|g|^2={gn:.3e}, compile {compile_s:.0f}s)", flush=True)
    return dt


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    cam4 = Camera.at((0.0, 0.0, -2.5), front=(0.0, 0.0, 1.0),
                     fov_deg=60.0, aspect=1920.0 / 1080.0)
    pos4 = jax.random.uniform(jax.random.PRNGKey(0), (4096, 3), jnp.float32,
                              -0.5, 0.5)

    n3 = 80
    dx = (2.0 / n3) * 0.5
    params = FluidParams.for_spacing(dx)
    state = dam_break_state(n3, params, extent=0.5)
    cam5 = Camera.at((0.0, 0.6, -2.8), front=(0.0, -0.35, 1.0),
                     fov_deg=55.0, aspect=1920.0 / 1080.0)

    # overflow check at 512k first (cheap fwd only)
    img, ovf = jax.jit(lambda p: splat_particles_tiled(
        p, dx * 0.7, cam5, 1920, 1080, k=2048, return_overflow=True))(
            state.pos)
    print("512k overflow at k=2048:", int(np.asarray(ovf)), flush=True)

    bench(4096, pos4, 0.02, cam4, tiled=False)
    bench(4096, pos4, 0.02, cam4, tiled=True, k=1024)
    bench(512000, state.pos, dx * 0.7, cam5, tiled=False, chunk=65536)
    bench(512000, state.pos, dx * 0.7, cam5, tiled=True, k=2048)
    print("ALL OK", flush=True)
