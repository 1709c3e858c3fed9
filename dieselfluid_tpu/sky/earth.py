"""Earth/atmosphere geometry for the sky model.

ref: atmosphere/earth.go — observer on a z-up earth of radius 6370 (km),
atmosphere shell at EARTH_RAD + HR, sample "depth" approximated by the
z-coordinate (GetSampleDepth:59-62). The reference mixes km shell geometry
with the 8000/1500 (meter-named) scale heights; the visual behavior depends
on that pairing, so it is preserved exactly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from dieselfluid_tpu.mathx import polar as P

EARTH_RAD = 6370.0
HM = 1500.0     # aerosol (Mie) scale height (ref: atmosphere.go:31)
HR = 8000.0     # Rayleigh scale height (ref: atmosphere.go:32)
DEG2RAD = 0.01745329251994444444
PI_REF = 3.141529  # ref: atmosphere.go:26 (note: the reference's truncated pi)


@dataclasses.dataclass(frozen=True)
class EarthCoords:
    latitude: float = 65.0 * DEG2RAD
    longitude: float = 0.0

    @property
    def radius(self) -> float:
        return EARTH_RAD

    @property
    def shell_radius(self) -> float:
        """GreaterSphere radius. ref: earth.go NewEarth — EARTH_RAD + HR."""
        return EARTH_RAD + HR

    def position(self) -> jnp.ndarray:
        """Observer position: Sphere2Vec((EARTH_RAD, 0, 0)) = (0, 0, R).

        ref: earth.go GetPosition — polar (r, az=0, incl=0) maps to +z.
        """
        return jnp.asarray([0.0, 0.0, EARTH_RAD], jnp.float32)

    @staticmethod
    def sample_depth(sample: jnp.ndarray) -> jnp.ndarray:
        """Altitude approximation = z-coordinate. ref: earth.go GetSampleDepth."""
        return sample[..., 2]

    def shell_exit_distance(self, origins: jnp.ndarray, dirs: jnp.ndarray):
        """Min-|t| ray/shell intersection (ref pairs RaySphereIntersect with
        polar.Priority). Returns (t, hit)."""
        t1, t2, hit = P.ray_sphere_intersect(
            dirs, origins, jnp.zeros(3, jnp.float32), self.shell_radius
        )
        ts = jnp.stack([t1, t2], axis=-1)
        hits = jnp.stack([hit, hit], axis=-1)
        return P.priority(ts, hits), hit
