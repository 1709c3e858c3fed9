"""Traced material parameters — the differentiable subset of FluidParams.

FluidParams is static (hashable, closed over by jit); Materials is a pytree of
jnp scalars so viscosity/stiffness/EOS parameters can receive gradients
(BASELINE config 4: "grads to viscosity/stiffness/material params"). The
reference exposes viscosity mutably (ref: model/sph/fluid.go SetViscosity) and
hardcodes Tait constants (ref: model/model.go TaitEos g=7.16, w=2.15).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams


class Materials(NamedTuple):
    mu: jnp.ndarray           # dynamic viscosity
    d0: jnp.ndarray           # rest density
    tait_gamma: jnp.ndarray   # Tait stiffness exponent
    tait_w: jnp.ndarray       # Tait pressure scale
    mass: jnp.ndarray         # particle mass

    @staticmethod
    def from_params(p: FluidParams) -> "Materials":
        f = lambda x: jnp.asarray(x, jnp.float32)
        return Materials(
            mu=f(p.mu), d0=f(p.d0), tait_gamma=f(p.tait_gamma),
            tait_w=f(p.tait_w), mass=f(p.mass),
        )
