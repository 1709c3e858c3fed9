"""Ray types and geometric ray-sphere intersection.

ref: geom/ray.go (type stubs) + math/vector/vector.go RaySphereIntersection:463
(the geometric projection form, distinct from the quadratic form in
mathx.polar.ray_sphere_intersect; both are provided for parity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Ray(NamedTuple):
    origin: jnp.ndarray     # (..., 3)
    direction: jnp.ndarray  # (..., 3), need not be normalized


def _proj(a, b):
    """Project a onto b. ref: vector.go Proj."""
    bb = jnp.sum(b * b, axis=-1, keepdims=True)
    return b * (jnp.sum(a * b, axis=-1, keepdims=True) / jnp.maximum(bb, 1e-20))


def ray_sphere_intersection(r0, d0, center, radius):
    """Geometric ray-sphere test: returns (point, hit).

    ref: vector.go RaySphereIntersection:463-511. Vectorized re-derivation:
    closest approach of the (normalized d0) ray to the center decides the hit;
    entry distance di = |pc - r0| -+ sqrt(r^2 - |pc - c|^2) depending on
    whether the origin is outside/inside the sphere; behind-origin centers
    only hit if the origin is inside the sphere.
    """
    d = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    vpc = center - r0
    vmag = jnp.linalg.norm(vpc, axis=-1)
    tc = jnp.sum(vpc * d, axis=-1)                  # center along ray
    pc = r0 + d * tc[..., None]                     # closest point to center
    d2 = jnp.sum((pc - center) ** 2, axis=-1)
    inside = vmag < radius
    behind = tc < 0
    reachable = d2 <= radius * radius
    half = jnp.sqrt(jnp.maximum(radius * radius - d2, 0.0))
    t_entry = tc - half
    t_exit = tc + half
    t = jnp.where(inside, t_exit, t_entry)
    hit = reachable & (~behind | inside)
    point = r0 + d * t[..., None]
    return jnp.where(hit[..., None], point, jnp.zeros_like(point)), hit
