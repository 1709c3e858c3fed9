"""Ray-traced mesh renderer: GLTF scenes with PBR shading + sky environment.

The TPU-native replacement for the reference's GL mesh pipeline
(ref: render/glr/glr.go Draw + rendersystem.go Run): instead of rasterizing
VAOs, each pixel ray intersects the scene triangle soup (Moller-Trumbore,
fully vectorized pixels x triangles, tiled to bound memory), shades with the
Cook-Torrance model (render/pbr.py) and falls back to the environment cubemap
on miss — the render path for the `materialcube` / `rendersphere` style
scenes. Differentiable in materials, lights and camera; triangle visibility
is hard (matching GL), so geometry gradients are at shading level.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.cubemap import sample_cubemap
from dieselfluid_tpu.render.pbr import PBRMaterial, reflect, shade

_EPS = 1e-7


def ray_triangle(origins, dirs, tris):
    """Moller-Trumbore: rays (R, 3) x triangles (T, 3, 3) -> (R, T) hits.

    Returns (t, hit) with t = +inf on miss.
    """
    v0 = tris[:, 0, :]                          # (T, 3)
    e1 = tris[:, 1, :] - v0
    e2 = tris[:, 2, :] - v0
    pvec = jnp.cross(dirs[:, None, :], e2[None, :, :])       # (R, T, 3)
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)            # (R, T)
    inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / jnp.where(jnp.abs(det) > _EPS, det, 1.0), 0.0)
    tvec = origins[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dirs[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (jnp.abs(det) > _EPS) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    return jnp.where(hit, t, jnp.inf), hit


class RayImage(NamedTuple):
    color: jnp.ndarray
    depth: jnp.ndarray
    hit: jnp.ndarray


@partial(jax.jit, static_argnames=("width", "height", "tile"))
def render_scene(
    tris: jnp.ndarray,                 # (T, 3, 3)
    tri_normals: jnp.ndarray,          # (T, 3)
    tri_materials: jnp.ndarray,        # (T,) int32 indices into materials
    materials: PBRMaterial,            # stacked pytree, leaves (M, ...)
    cam: Camera,
    light_pos: jnp.ndarray,
    light_color=(1.0, 1.0, 1.0),
    env_cube: Optional[jnp.ndarray] = None,    # (6, S, S, 3)
    width: int = 256,
    height: int = 256,
    tile: int = 4096,
) -> RayImage:
    """Primary-ray render with PBR shading and cubemap environment."""
    origins, dirs = cam.pixel_rays(width, height)
    if tris.shape[0] == 0:
        # Empty scene: pure environment (or flat background).
        d = dirs.reshape(-1, 3)
        bg = (sample_cubemap(env_cube, d) if env_cube is not None
              else jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.1]), d.shape))
        return RayImage(color=bg.reshape(height, width, 3),
                        depth=jnp.zeros((height, width), jnp.float32),
                        hit=jnp.zeros((height, width), bool))
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    npix = o.shape[0]

    def render_tile(args):
        ot, dt = args
        t, hit = ray_triangle(ot, dt, tris)
        best = jnp.argmin(t, axis=1)
        t_best = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        any_hit = jnp.isfinite(t_best)
        n = tri_normals[best]
        # Face normals toward the viewer (two-sided shading, GL default)
        facing = jnp.sum(n * dt, axis=-1) < 0
        n = jnp.where(facing[:, None], n, -n)
        p = ot + dt * jnp.where(any_hit, t_best, 1.0)[:, None]

        m_idx = jnp.maximum(tri_materials[best], 0)
        mat = jax.tree.map(lambda leaf: leaf[m_idx], materials)
        v = -dt
        l = light_pos - p
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-8)
        env = None
        if env_cube is not None:
            env = sample_cubemap(env_cube, reflect(-v, n))
        col = shade(n, v, l, mat, light_color=light_color, env_reflection=env)
        if env_cube is not None:
            bg = sample_cubemap(env_cube, dt)
        else:
            bg = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.1]), col.shape)
        col = jnp.where(any_hit[:, None], col, bg)
        return col, jnp.where(any_hit, t_best, 0.0), any_hit

    pad = (-npix) % tile
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    o_b = o_p.reshape(-1, tile, 3)
    d_b = d_p.reshape(-1, tile, 3)
    col, dep, hit = jax.lax.map(render_tile, (o_b, d_b))
    col = col.reshape(-1, 3)[:npix].reshape(height, width, 3)
    dep = dep.reshape(-1)[:npix].reshape(height, width)
    hit = hit.reshape(-1)[:npix].reshape(height, width)
    return RayImage(color=col, depth=dep, hit=hit)


def stack_materials(mats) -> PBRMaterial:
    """Stack a list of PBRMaterial into one leaves-(M, ...) pytree."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *mats)
