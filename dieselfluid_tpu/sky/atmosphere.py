"""Rayleigh + Mie single-scattering sky, fully vectorized and differentiable.

ref: atmosphere/atmosphere.go VolumetricScatterRay:243-357 — 25 view-path
samples x 25 light-path samples with exponential Ease spacing, beta_R/beta_M
extinction, Rayleigh + Henyey-Greenstein-like Mie phase (g=0.76), sun-z
asymptotic scaling, and the reference's cumulative-optical-depth formulation
(tau at view sample i uses the depth accumulated through i — a prefix sum
here instead of the reference's running scalar).

The per-texel Go loop becomes a tensor program over (..., VIEW, LIGHT)
sample axes; texel batches are processed in chunks to bound memory.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from dieselfluid_tpu.mathx import polar as P
from dieselfluid_tpu.render.light import Directional, Source
from dieselfluid_tpu.render.spectrum import init_sunlight
from dieselfluid_tpu.sky.earth import HM, HR, PI_REF, EarthCoords

RAYLEIGH_SAMPLES = 25      # ref: atmosphere.go:28
LIGHT_PATH_SAMPLES = 25    # ref: atmosphere.go:29
AU = 150000000.0
DEG2RAD = 0.01745329251994444444

BETA_R = jnp.asarray([0.0000058, 0.0000135, 0.0000331], jnp.float32)  # ref:267
BETA_M = jnp.asarray([0.00210, 0.0021, 0.0021], jnp.float32)          # ref:268


def _safe_norm(v, eps=1e-12):
    """Norm with the where-trick: grad-safe at exactly-zero vectors (the last
    view sample sits exactly on the shell, making its light ray zero)."""
    d2 = jnp.sum(v * v, axis=-1)
    ok = d2 > eps
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, d2, 1.0)), 0.0)


def ease(x, w=1.0):
    """Exponential ease exp(w*x - w) on [0,1]. ref: sampler_utilities.go Ease:27-30."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.exp(w * x - w)


def reference_sun_direction(abs_day: float = 1.5,
                            inclination_offset: float = 45.0 * DEG2RAD) -> jnp.ndarray:
    """Initial sun direction, reference semantics preserved.

    ref: atmosphere.go InitPosition:70-80 — `theta := (1 / 2 * PI) * absDay`
    uses Go untyped-integer division, so theta == 0 for every absDay; the
    "position" is Vec2Sphere of the literal VECTOR (1, theta, pi - offset),
    i.e. the tuple is treated as cartesian, then converted back. Faithful
    quirk-for-quirk.
    """
    theta = 0.0 * abs_day
    vec = jnp.asarray([1.0, theta, PI_REF - inclination_offset], jnp.float32)
    sph = P.vec_to_sphere(vec)
    d = P.sphere_to_vec(sph)
    return d / jnp.linalg.norm(d)


def sun_direction(azimuth: float, elevation: float) -> jnp.ndarray:
    """Clean z-up sun direction (capability API alongside the parity one)."""
    az, el = jnp.float32(azimuth), jnp.float32(elevation)
    return jnp.asarray([
        jnp.cos(el) * jnp.cos(az), jnp.cos(el) * jnp.sin(az), jnp.sin(el)
    ], jnp.float32)


@dataclasses.dataclass(frozen=True)
class Atmosphere:
    """Sky environment. ref: atmosphere.go Atmosphere:49-56."""

    earth: EarthCoords = EarthCoords()
    flux: float = 20.5                       # ref: NewAtmosphere light flux
    light_rgb: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    spd_samples: int = 20                    # ref: InitSunlight(20)

    def light(self, sun_dir) -> Directional:
        return Directional(jnp.zeros(3), -sun_dir, Source.make(self.light_rgb, self.flux))

    def spd(self):
        return init_sunlight(self.spd_samples)

    def update_position(self, sun_sphere, delta_deg: float):
        """Rotate the sun's polar angle. ref: atmosphere.go UpdatePosition:82-92."""
        sph = P.add_polar(sun_sphere, delta_deg, degrees=True)
        d = P.sphere_to_vec(sph)
        return sph, d / jnp.linalg.norm(d)


def scatter_rgb(sample_dirs: jnp.ndarray, sun_dir: jnp.ndarray,
                earth: EarthCoords = EarthCoords(),
                flux: float = 20.5, light_rgb=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """RGB sky radiance for (..., 3) unit view directions (z-up hemisphere).

    Vectorized VolumetricScatterRay (ref:243-357). Directions with z < 0
    return black, as does a sun whose light path misses the shell.
    """
    shape = sample_dirs.shape[:-1]
    d = sample_dirs.reshape(-1, 3)
    n = d.shape[0]

    origin = earth.position()
    t_exit, hit = earth.shell_exit_distance(jnp.broadcast_to(origin, d.shape), d)
    view_ray = d * t_exit[:, None]                           # (N, 3)
    view_mag = _safe_norm(view_ray)

    # Phase functions (ref:272-277)
    mu = jnp.sum(d * sun_dir, axis=-1)
    phase_r = 3.0 / (16.0 * PI_REF) * (1.0 + mu * mu)
    g = 0.76
    phase_m = (3.0 / (8.0 * PI_REF) * ((1.0 - g * g) * (1.0 + mu * mu))
               / ((2.0 + g * g) * jnp.power(jnp.maximum(1.0 + g * g - 2.0 * g * mu, 1e-6), 1.1)))

    # Sun-z asymptotic scaling (ref:283-293)
    scale_factor = 7.0
    sz = sun_dir[2]
    lfactor = jnp.where(sz > 0, jnp.minimum(1.0 / jnp.maximum(jnp.abs(sz), 1e-6),
                                            scale_factor), scale_factor)

    # View-path samples i = 1..S with Ease spacing (ref:296-303). NOTE the
    # reference feeds i*sampleStep (an absolute km distance) into Ease, which
    # clamps its input to [0,1] — so for rays longer than S km the spacing
    # saturates; preserved via the same expression.
    i = jnp.arange(1, RAYLEIGH_SAMPLES + 1, dtype=jnp.float32)
    sample_step = view_mag[:, None] / RAYLEIGH_SAMPLES        # (N, 1)
    sample_scale = ease(i[None, :] * sample_step)             # (N, S)
    view_samples = view_ray[:, None, :] * sample_scale[..., None]  # (N, S, 3)
    depth = view_samples[..., 2]                              # GetSampleDepth

    vmag = view_mag[:, None] * sample_scale
    vds = jnp.diff(vmag, axis=1, prepend=jnp.zeros_like(vmag[:, :1]))
    hr = jnp.exp(-depth / HR) * vds                           # (N, S)
    hm = jnp.exp(-depth / HM) * vds
    od_r = jnp.cumsum(hr, axis=1)                             # running view depth
    od_m = jnp.cumsum(hm, axis=1)

    # Light paths from each view sample (ref:305-345). The reference scales
    # viRay = viewSampleOrigin - sunDir by the min-|t| of the intersection of
    # ray(-sunDir) from viewSampleOrigin with the shell.
    vso = view_samples + origin                               # (N, S, 3)
    lt1, lt2, lhit = P.ray_sphere_intersect(
        -sun_dir, vso, jnp.zeros(3, jnp.float32), earth.shell_radius
    )
    lts = jnp.stack([lt1, lt2], axis=-1)
    lpri = P.priority(lts, jnp.stack([lhit, lhit], axis=-1))  # (N, S)
    vi_ray = vso - sun_dir                                    # (N, S, 3) (ref viRay)
    light_ray = vi_ray * lpri[..., None]
    light_mag = _safe_norm(light_ray)                         # (N, S)

    j = jnp.arange(LIGHT_PATH_SAMPLES, dtype=jnp.float32)
    lstep = light_mag[..., None] / LIGHT_PATH_SAMPLES         # (N, S, 1)
    pscale = ease(lstep * j)                                  # (N, S, L)
    lmag = light_mag[..., None] * pscale
    lds = jnp.diff(lmag, axis=-1, prepend=jnp.zeros_like(lmag[..., :1]))
    lpos = view_samples[..., None, :] + light_ray[..., None, :] * pscale[..., None]
    ldepth = lpos[..., 2]
    od_lr = jnp.sum(jnp.exp(-ldepth / HR) * lds, axis=-1)     # (N, S)
    od_lm = jnp.sum(jnp.exp(-ldepth / HM) * lds, axis=-1)

    # Attenuation + accumulation (ref:347-352)
    tau = (BETA_R[None, None, :] * (lfactor * (od_r + od_lr))[..., None]
           + (BETA_M * 1.25)[None, None, :] * (od_m + od_lm)[..., None])
    atten = jnp.exp(-tau)                                     # (N, S, 3)
    sum_r = jnp.sum(atten * hr[..., None], axis=1)            # (N, 3)
    sum_m = jnp.sum(atten * hm[..., None], axis=1)

    rgb = (sum_r * BETA_R * phase_r[:, None]
           + sum_m * BETA_M * phase_m[:, None]) * flux * jnp.asarray(light_rgb)
    rgb = jnp.where((d[:, 2] >= 0.0)[:, None] & hit[:, None]
                    & jnp.all(jnp.isfinite(rgb), axis=-1, keepdims=True),
                    rgb, 0.0)
    return rgb.reshape(*shape, 3)


def texel_directions(width: int, height: int) -> jnp.ndarray:
    """Fisheye texel -> hemisphere direction map. ref: ComputeAtmosphere:197-217."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    u = 2.0 * (x + 0.5) / (width - 1.0) - 1.0
    v = 2.0 * (y + 0.5) / (height - 1.0) - 1.0
    uu, vv = jnp.meshgrid(u, v, indexing="ij")                # ref: x outer, y inner
    z2 = uu * uu + vv * vv
    phi = jnp.arctan2(vv, uu)
    theta = jnp.arccos(jnp.clip(1.0 - z2, -1.0, 1.0))
    return jnp.stack([
        jnp.sin(theta) * jnp.cos(phi),
        jnp.sin(theta) * jnp.sin(phi),
        jnp.cos(theta),
    ], axis=-1)                                               # (W, H, 3)


@partial(jax.jit, static_argnames=("width", "height", "chunk"))
def compute_atmosphere(sun_dir, width: int = 512, height: int = 512,
                       chunk: int = 8192, flux: float = 20.5) -> jnp.ndarray:
    """Bake the full-sky fisheye texture. ref: ComputeAtmosphere:197-217.

    Texels are marched in `chunk`-sized batches via lax.map to bound the
    (chunk, 25, 25) intermediate tensors.
    """
    dirs = texel_directions(width, height).reshape(-1, 3)
    pad = (-dirs.shape[0]) % chunk
    dirs_p = jnp.pad(dirs, ((0, pad), (0, 0)))
    batches = dirs_p.reshape(-1, chunk, 3)
    rgb = jax.lax.map(lambda b: scatter_rgb(b, sun_dir, flux=flux), batches)
    rgb = rgb.reshape(-1, 3)[: dirs.shape[0]]
    return rgb.reshape(width, height, 3)


def compute_region(sun_dir, u_domain: int, v_domain: int, x_corner: int,
                   y_corner: int, width: int, height: int, flux: float = 20.5):
    """Sub-region bake for env-box faces. ref: ComputeRegion:220-241."""
    x = jnp.arange(x_corner, x_corner + width, dtype=jnp.float32)
    y = jnp.arange(y_corner, y_corner + height, dtype=jnp.float32)
    u = 2.0 * (x + 0.5) / (u_domain - 1.0) - 1.0
    v = 2.0 * (y + 0.5) / (v_domain - 1.0) - 1.0
    uu, vv = jnp.meshgrid(u, v, indexing="ij")
    z2 = uu * uu + vv * vv
    phi = jnp.arctan2(vv, uu)
    theta = jnp.arccos(jnp.clip(1.0 - z2, -1.0, 1.0))
    dirs = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                      jnp.sin(theta) * jnp.sin(phi),
                      jnp.cos(theta)], axis=-1)
    return scatter_rgb(dirs, sun_dir, flux=flux)
