"""Spherical coordinates and ray-sphere intersections.

ref: math/polar/polar.go. Polar triples are (..., 3) arrays
(radius, azimuth, inclination); conversions preserve the reference's
conventions, including its azimuth = atan2(x, y) quirk (PolarAzimuth,
ref: polar.go:115-120 — note the argument order).
"""

from __future__ import annotations

import jax.numpy as jnp

DEG2RAD = 0.01745329251994444444


def azimuth_of(v):
    """ref: polar.go PolarAzimuth — atan2(x, y), NOT atan2(y, x)."""
    return jnp.arctan2(v[..., 0], v[..., 1])


def vec_to_sphere(v):
    """Cartesian -> (r, azimuth, inclination). ref: polar.go Vec2Sphere."""
    r = jnp.linalg.norm(v, axis=-1)
    az = azimuth_of(v)
    incl = jnp.arccos(jnp.clip(v[..., 2] / jnp.maximum(r, 1e-20), -1.0, 1.0))
    return jnp.stack([r, az, incl], axis=-1)


def sphere_to_vec(s):
    """(r, azimuth, inclination) -> Cartesian. ref: polar.go Sphere2Vec."""
    r, az, incl = s[..., 0], s[..., 1], s[..., 2]
    return jnp.stack([
        r * jnp.sin(incl) * jnp.cos(az),
        r * jnp.sin(incl) * jnp.sin(az),
        r * jnp.cos(incl),
    ], axis=-1)


def add_azimuth(s, angle, degrees=False):
    """ref: polar.go AddAzimuth / AddAzimuthDegrees."""
    a = angle * DEG2RAD if degrees else angle
    return s.at[..., 1].add(a) if hasattr(s, "at") else s + jnp.asarray([0.0, a, 0.0])


def add_polar(s, angle, degrees=False):
    """ref: polar.go AddPolar / AddPolarDegrees."""
    a = angle * DEG2RAD if degrees else angle
    return s.at[..., 2].add(a) if hasattr(s, "at") else s + jnp.asarray([0.0, 0.0, a])


def ray_sphere_intersect(ray_dir, ray_origin, sphere_origin, radius):
    """Quadratic ray-sphere: returns (t1, t2, hit_mask).

    ref: polar.go RaySphereIntersect:124-146 — t = (-b -+ sqrt(disc)) / 2a.
    Vectorized: all inputs broadcast; misses yield hit=False with t=0.
    """
    oc = ray_origin - sphere_origin
    a = jnp.sum(ray_dir * ray_dir, axis=-1)
    b = 2.0 * jnp.sum(ray_dir * oc, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    hit = disc >= 0
    # where-trick: substitute 1.0 (not 0) on miss lanes so sqrt'(0)=inf can't
    # leak NaN into gradients through the masked branch.
    sq = jnp.sqrt(jnp.where(hit, jnp.maximum(disc, 1e-12), 1.0))
    sq = jnp.where(hit, sq, 0.0)
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    zero = jnp.zeros_like(t1)
    return jnp.where(hit, t1, zero), jnp.where(hit, t2, zero), hit


def priority(ts, hits):
    """Min-|t| intersection. ref: polar.go Priority:100-114 (min by t^2)."""
    t2 = jnp.where(hits, ts * ts, jnp.inf)
    idx = jnp.argmin(t2, axis=-1)
    return jnp.take_along_axis(ts, idx[..., None], axis=-1)[..., 0]
