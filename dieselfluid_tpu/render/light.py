"""Light sources in SI units (watts/lumens) and area-light rigs.

ref: render/light/light.go (Attenuated / Directional / Area with Source
{RGB, Flux, Unit}) + integral_light.go (RectLight grid of virtual area
lights). Lights are pytrees so positions/colors/fluxes are traced and
differentiable; per-point irradiance evaluation is vectorized for the
renderers instead of the reference's shader-uniform plumbing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

ATTENUATED_LIGHT = 1
DIRECTIONAL_LIGHT = 2
AREA_LIGHT = 3
WATTS = 0
LUMENS = 1


class Source(NamedTuple):
    """Luminous flux + RGB color. ref: light.go Source:45-50."""

    rgb: jnp.ndarray
    flux: jnp.ndarray
    unit: int = WATTS

    @staticmethod
    def make(rgb=(1.0, 1.0, 1.0), flux=1.0, unit=WATTS):
        return Source(jnp.asarray(rgb, jnp.float32), jnp.asarray(flux, jnp.float32), unit)


class Attenuated(NamedTuple):
    """Point light with inverse-square falloff. ref: light.go Attenuated:55-58."""

    pos: jnp.ndarray
    lum: Source

    def irradiance(self, points):
        """(N,) scalar irradiance + (N, 3) direction point->light."""
        d = self.pos - points
        r2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-8)
        direction = d / jnp.sqrt(r2)[..., None]
        e = self.lum.flux / (4.0 * jnp.pi * r2)
        return e, direction


class Directional(NamedTuple):
    """Infinite light. ref: light.go Directional:63-67."""

    pos: jnp.ndarray
    direction: jnp.ndarray
    lum: Source

    def irradiance(self, points):
        d = -self.direction / jnp.linalg.norm(self.direction)
        e = jnp.broadcast_to(self.lum.flux, points.shape[:-1])
        return e, jnp.broadcast_to(d, points.shape)


class Area(NamedTuple):
    """Attenuated light restricted to a solid-angle cone about its normal.
    ref: light.go Area:72-77."""

    pos: jnp.ndarray
    normal: jnp.ndarray
    cutoff: jnp.ndarray           # max angle (radians) from the normal
    lum: Source

    def irradiance(self, points):
        d = self.pos - points
        r2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-8)
        to_point = -d / jnp.sqrt(r2)[..., None]
        cos_a = jnp.sum(to_point * self.normal, axis=-1)
        inside = cos_a >= jnp.cos(self.cutoff)
        e = jnp.where(inside, self.lum.flux / (4.0 * jnp.pi * r2), 0.0)
        return e, d / jnp.sqrt(r2)[..., None]


class RectLight(NamedTuple):
    """Rectangular area light sampled as a w x h grid of virtual Area lights.

    ref: integral_light.go RectLight/NewRectLight/Lights:11-104 — total flux
    split evenly over the grid, edge samples get the tighter EdgeCutoff.
    """

    pos: jnp.ndarray
    normal: jnp.ndarray
    width: float
    height: float
    num_w: int
    num_h: int
    lum: Source
    edge_cutoff: float = jnp.pi / 4

    def lights(self) -> Area:
        """Vectorized grid of virtual area lights (stacked Area pytree)."""
        i = jnp.arange(self.num_w, dtype=jnp.float32)
        j = jnp.arange(self.num_h, dtype=jnp.float32)
        x = -self.width / 2.0 + i * (self.width / self.num_w)
        y = -self.height / 2.0 + j * (self.height / self.num_h)
        gx, gy = jnp.meshgrid(x, y, indexing="ij")
        n = self.normal / jnp.linalg.norm(self.normal)
        # Orthonormal tangent frame around the normal
        helper = jnp.where(jnp.abs(n[0]) < 0.9,
                           jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
        t = jnp.cross(n, helper)
        t = t / jnp.linalg.norm(t)
        b = jnp.cross(n, t)
        positions = (self.pos + gx.ravel()[:, None] * t + gy.ravel()[:, None] * b)
        k = self.num_w * self.num_h
        flux = jnp.full((k,), self.lum.flux / k)
        edge = (
            (jnp.arange(k) % self.num_h == 0)
            | (jnp.arange(k) // self.num_h == 0)
        )
        cutoff = jnp.where(edge, self.edge_cutoff, jnp.pi / 2)
        return Area(
            pos=positions,
            normal=jnp.broadcast_to(n, positions.shape),
            cutoff=cutoff,
            lum=Source(jnp.broadcast_to(self.lum.rgb, (k, 3)), flux, self.lum.unit),
        )

    def luminance(self, point) -> jnp.ndarray:
        """ref: integral_light.go Luminance (placeholder total)."""
        return self.lum.flux
