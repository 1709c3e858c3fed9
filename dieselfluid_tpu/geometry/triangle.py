"""Triangle geometry: normals, barycentric coordinates, swept collision.

ref: geom/triangle/tri.go. Vectorized over arbitrary batches of triangles
and query points — the reference's per-triangle methods become broadcasting
array ops usable inside jit (particles x triangles narrow phase).
Triangles are (..., 3, 3) arrays (vertex, xyz).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def normal(tri):
    """Unit normal cross(v1-v0, v2-v0). ref: tri.go Normal:23."""
    n = jnp.cross(tri[..., 1, :] - tri[..., 0, :], tri[..., 2, :] - tri[..., 0, :])
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)


def barycentric(tri, p):
    """Barycentric coords (u, v, w) of p and inside-mask. ref: tri.go:79-108."""
    v0 = tri[..., 1, :] - tri[..., 0, :]
    v1 = tri[..., 2, :] - tri[..., 0, :]
    v2 = p - tri[..., 0, :]
    d00 = jnp.sum(v0 * v0, axis=-1)
    d01 = jnp.sum(v0 * v1, axis=-1)
    d11 = jnp.sum(v1 * v1, axis=-1)
    d20 = jnp.sum(v2 * v0, axis=-1)
    d21 = jnp.sum(v2 * v1, axis=-1)
    denom = d00 * d11 - d01 * d01
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    u = (d11 * d20 - d01 * d21) / safe
    v = (d00 * d21 - d01 * d20) / safe
    w = 1.0 - v - u
    coords = jnp.stack([u, v, w], axis=-1)
    inside = (
        (u >= 0) & (v >= 0) & (w >= 0)
        & (u <= 1) & (v <= 1) & (w <= 1)
        & (u + v + w <= 1.0 + 1e-6)
        & (jnp.abs(denom) > _EPS)
    )
    return coords, inside


def swept_collision(tri, n, p, vel, dt, radius):
    """Sphere-vs-triangle-plane swept test: (hit, plane_dist, coords).

    ref: tri.go BarycentricCollision:37-77 — project the point-plane distance
    along the velocity, flag a hit when the plane distance is within the
    particle radius and the projection lands inside the triangle.
    """
    v0 = tri[..., 0, :] - p
    n_dot_ray = jnp.sum(n * vel, axis=-1)
    n_dot_ray = jnp.where(jnp.abs(n_dot_ray) < 1e-4, 1e-4, n_dot_ray)
    d = jnp.sum(v0 * n, axis=-1)
    k = d / n_dot_ray
    p0 = p + vel * k[..., None]                     # projection onto the plane
    dist = jnp.linalg.norm(p - p0, axis=-1)
    coords, inside = barycentric(tri, p)
    moving = jnp.sum(vel * vel, axis=-1) > 0
    hit = (dist <= radius) & inside & moving
    return hit, dist, coords


def closest_point(tri, p):
    """Closest point on a triangle to p (exact region-based test).

    A capability upgrade over the reference's plane-projection heuristic —
    needed for robust particle-mesh contact with edge/vertex cases.
    """
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    ab, ac, ap = b - a, c - a, p - a
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom = jnp.maximum(va + vb + vc, _EPS)
    v = vb / denom
    w = vc / denom
    face = a + ab * v[..., None] + ac * w[..., None]

    # Edge AB
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, _EPS), 0.0, 1.0)
    on_ab = a + ab * t_ab[..., None]
    # Edge AC
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, _EPS), 0.0, 1.0)
    on_ac = a + ac * t_ac[..., None]
    # Edge BC
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), _EPS), 0.0, 1.0)
    on_bc = b + (c - b) * t_bc[..., None]

    out = face
    out = jnp.where((vc <= 0)[..., None] & (d1 >= 0)[..., None] & (d3 <= 0)[..., None], on_ab, out)
    out = jnp.where((vb <= 0)[..., None] & (d2 >= 0)[..., None] & (d6 <= 0)[..., None], on_ac, out)
    out = jnp.where((va <= 0)[..., None] & ((d4 - d3) >= 0)[..., None] & ((d5 - d6) >= 0)[..., None], on_bc, out)
    out = jnp.where((d1 <= 0)[..., None] & (d2 <= 0)[..., None], a, out)
    out = jnp.where((d3 >= 0)[..., None] & (d4 <= d3)[..., None], b, out)
    out = jnp.where((d6 >= 0)[..., None] & (d5 <= d6)[..., None], c, out)
    return out
