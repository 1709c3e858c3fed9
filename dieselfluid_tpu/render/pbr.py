"""Cook-Torrance PBR shading as pure jnp — differentiable material model.

Formula-level re-implementation of the reference's metallic-roughness
fragment shader (ref: data/shaders/glsl/render/material/material.frag):
GGX distribution (D_CGX, material.frag:77-83), reference G term
(G_term:98-104), Schlick Fresnel (fresnel_factor:49-52), the gold-derived F0
constant, blinn/phong/beckmann alternates, phong diffuse + ambient, and
cubemap reflection lookup. Everything broadcasts over (..., 3) shading points
and differentiates to material parameters (BASELINE config 4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

PI = 3.1415926
# ref: material.frag FRESNEL_GOLD
FRESNEL_GOLD = (1.0002 - 0.273) / (1.0002 + 0.273)


class PBRMaterial(NamedTuple):
    """Metallic-roughness material (ref: render/material/material.go:12-25 and
    GLTF pbrMetallicRoughness). Fields are traced scalars/arrays so gradients
    flow to them."""

    base_color: jnp.ndarray       # (..., 3)
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    fresnel_rim: jnp.ndarray

    @staticmethod
    def make(base_color=(0.8, 0.8, 0.8), metallic=0.0, roughness=0.5,
             fresnel_rim=0.0) -> "PBRMaterial":
        f = lambda x: jnp.asarray(x, jnp.float32)
        return PBRMaterial(f(base_color), f(metallic), f(roughness), f(fresnel_rim))


def fresnel_schlick(f0, ndv):
    """F = F0 + (1-F0)(1-NdV)^5. ref: material.frag fresnel_factor:49-52."""
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - ndv, 0.0, 1.0), 5.0)


def d_ggx(roughness, ndh):
    """GGX/Trowbridge-Reitz NDF. ref: material.frag D_CGX:77-83."""
    m = roughness * roughness
    m2 = m * m
    d = (ndh * ndh) * (m2 - 1.0) + 1.0
    return m2 / (PI * d * d)


def d_blinn(roughness, ndh):
    """ref: material.frag D_blinn:57-63."""
    m2 = (roughness * roughness) ** 2
    n = 2.0 / m2 - 2.0
    return (n + 2.0) / (2.0 * PI) * jnp.power(jnp.maximum(ndh, 1e-6), n)


def d_beckmann(roughness, ndh):
    """ref: material.frag D_beckmann:66-72."""
    m2 = (roughness * roughness) ** 2
    ndh2 = jnp.maximum(ndh * ndh, 1e-6)
    return jnp.exp((ndh2 - 1.0) / (m2 * ndh2)) / (PI * m2 * ndh2 * ndh2)


def g_schlick(roughness, ndv, ndl):
    """ref: material.frag G_schlick:88-94."""
    k = roughness * roughness * 0.5
    v = ndv * (1.0 - k) + k
    l = ndl * (1.0 - k) + k
    return 0.25 / jnp.maximum(v * l, 1e-6)


def g_term(hdn, vdn, vdh, ldn, roughness):
    """Reference geometric attenuation. ref: material.frag G_term:98-104."""
    m3 = roughness * roughness
    a = 2.0 * hdn * vdn * m3
    b = 2.0 * hdn * ldn * m3
    vdh_s = jnp.maximum(vdh, 1e-6)
    return jnp.minimum(jnp.minimum(1.0, a / vdh_s), b / vdh_s)


def cooktorrance_specular(hdn, vdn, vdh, ldn, ndh, ndv, ndl, roughness, fresnel):
    """ref: material.frag cooktorrance_specular:121-127 (incl. the P rim term)."""
    d = d_ggx(roughness, ndh)
    g = g_term(hdn, vdn, vdh, ldn, roughness)
    p = 1.0 / ((1.0 - roughness * 0.9) * (1.0 - ndv) + ndv)  # 1/mix(1-r*0.9, 1, NdV)
    return (d * fresnel * g * p) / (PI * jnp.maximum(vdn * ndl, 1e-6))


def phong_diffuse():
    """ref: material.frag phong_diffuse — 1/pi."""
    return 1.0 / PI


def shade(
    normal: jnp.ndarray,            # (..., 3) world/view-space unit normals
    view_dir: jnp.ndarray,          # (..., 3) surface -> eye unit vectors
    light_dir: jnp.ndarray,         # (..., 3) surface -> light unit vectors
    material: PBRMaterial,
    light_color=(1.0, 1.0, 1.0),
    env_reflection: Optional[jnp.ndarray] = None,   # (..., 3) cubemap sample
    ambient: float = 0.1,
):
    """Full shading main() of the reference material shader.

    ref: material.frag main:180-251 — specular color mix(base*(1-rough),
    white, metallic)*lightColor, gold F0 squared, cook-torrance power squared,
    phong = |lightColor| * NdL + ka, result = mix(0, base, phong) + specular.
    env_reflection, if given, is added like the cubemap reflection sample.
    """
    light_color = jnp.asarray(light_color, jnp.float32)
    n, v, l = normal, view_dir, light_dir
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)

    ndl = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    ndv = jnp.maximum(jnp.sum(n * v, axis=-1), 1e-3)
    ndh = jnp.maximum(jnp.sum(n * h, axis=-1), 1e-3)
    vdh = jnp.maximum(jnp.sum(v * h, axis=-1), 1e-6)

    rough = jnp.clip(material.roughness, 0.01, 1.0)
    metal = jnp.clip(material.metallic, 0.0, 1.0)

    sp_color = (
        material.base_color * (1.0 - rough[..., None])
        * (1.0 - metal[..., None]) + metal[..., None]
    ) * light_color
    f0 = FRESNEL_GOLD ** 2
    fresnel = fresnel_schlick(f0, ndv)
    power = jnp.maximum(
        cooktorrance_specular(ndh, ndv, vdh, ndl, ndh, ndv, ndl, rough, fresnel), 0.0
    )
    specular = (power[..., None] * sp_color) ** 2   # ref squares the product

    phong = jnp.linalg.norm(light_color) * ndl + ambient
    color = material.base_color * phong[..., None] + specular
    if env_reflection is not None:
        # ref: material.frag:248 samples the cubemap along reflect(-V, N); the
        # sample modulates by metallic reflectivity here (the ref computes the
        # sample but folds it into specular via the irradiance path).
        color = color + env_reflection * metal[..., None] * (1.0 - rough[..., None])
    return color


def reflect(incident, normal):
    """GLSL-style reflect(I, N) = I - 2 dot(N, I) N."""
    return incident - 2.0 * jnp.sum(normal * incident, axis=-1, keepdims=True) * normal


def tonemap_exposure(hdr, exposure=1.0):
    """Simple exponential tone map (the sky baker uses a related curve,
    ref: atmosphere/atmosphere.go ImageFromPixels:142-193)."""
    return 1.0 - jnp.exp(-hdr * exposure)


def gamma_encode(linear, gamma=2.2):
    return jnp.power(jnp.clip(linear, 0.0, 1.0), 1.0 / gamma)
