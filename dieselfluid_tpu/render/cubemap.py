"""Cubemap environment maps: direction sampling + face layout.

ref: render/glr/glr.go LoadEnvironment:355 (GL cubemap upload; faces ordered
+X -X +Y -Y +Z -Z) and material.frag:248 (texture(cube, R) reflection
lookup). The cubemap is a (6, S, S, 3) array; sampling resolves the major
axis and bilinearly filters the face — differentiable in the direction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dieselfluid_tpu.render.texture import sample_bilinear

FACE_POS_X, FACE_NEG_X, FACE_POS_Y, FACE_NEG_Y, FACE_POS_Z, FACE_NEG_Z = range(6)


def sample_cubemap(cube: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Sample (6, S, S, 3) cubemap along (..., 3) directions (GL semantics)."""
    d = direction / jnp.maximum(jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-9)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # Face selection by dominant axis (ties broken x > y > z like GL)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(is_x, jnp.where(x > 0, FACE_POS_X, FACE_NEG_X),
             jnp.where(is_y, jnp.where(y > 0, FACE_POS_Y, FACE_NEG_Y),
                       jnp.where(z > 0, FACE_POS_Z, FACE_NEG_Z)))

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-9)
    # GL cubemap face (s,t) conventions
    sc = jnp.where(is_x, jnp.where(x > 0, -z, z),
          jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
    u = (sc / ma + 1.0) * 0.5
    v = (tc / ma + 1.0) * 0.5

    uv = jnp.stack([u, v], axis=-1)
    # Gather per-face bilinear samples, then select — 6 samples per point,
    # fully vectorized (cheaper than scatter by face under jit).
    samples = jnp.stack(
        [sample_bilinear(cube[f], uv, wrap="clamp") for f in range(6)], axis=0
    )
    face_oh = jax.nn.one_hot(face, 6, axis=0, dtype=samples.dtype)
    return jnp.sum(samples * face_oh[..., None], axis=0)


def cubemap_directions(size: int) -> jnp.ndarray:
    """(6, S, S, 3) world directions at each cubemap texel center (GL layout).

    Used to bake environment maps from the sky model
    (ref: atmosphere/atmosphere.go CreateEnvBox:102 bakes 6 region textures).
    """
    t = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    s_grid, t_grid = jnp.meshgrid(t, t, indexing="xy")
    one = jnp.ones_like(s_grid)
    faces = [
        jnp.stack([one, -t_grid, -s_grid], -1),    # +X
        jnp.stack([-one, -t_grid, s_grid], -1),    # -X
        jnp.stack([s_grid, one, t_grid], -1),      # +Y
        jnp.stack([s_grid, -one, -t_grid], -1),    # -Y
        jnp.stack([s_grid, -t_grid, one], -1),     # +Z
        jnp.stack([-s_grid, -t_grid, -one], -1),   # -Z
    ]
    d = jnp.stack(faces, axis=0)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)
