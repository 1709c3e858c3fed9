"""SPH discrete field operators over fixed-degree neighborhoods.

TPU-native re-implementation of the reference's SPHField operator suite
(ref: model/field/sph_field.go:124-294). Each operator is a fully vectorized
gather + masked reduction over the (N, K) neighbor table — the reference's
per-particle Go loops become one fused XLA program; no Python loops anywhere.

Every operator takes *query* arrays (the N particles being updated) and
optional *source* arrays (the M particles the neighbor table indexes into,
defaulting to the query arrays). Under spatial sharding the query axis is the
local shard and the source arrays are the all-gathered (or halo-exchanged)
neighbor pool — the same code path serves single-chip and SPMD execution.

Conventions matched to the reference:
  * density excludes the self term (ref: sph_field.go:163 `i != pIndex`);
    density_at (continuous DensityF) *includes* W0 (ref: sph_field.go:139).
  * gradient uses the symmetric (f_i/rho_i^2 + f_j/rho_j^2) form scaled by
    rho_i * mass (ref: sph_field.go:175-200).
  * kernel gradient direction is normalize(x_j - x_i) with magnitude -O1D
    (ref: sph_field.go:190-191 + kernel/std_kernel.go Grad).
  * viscosity laplacian-force: sum_j mass * (v_j - v_i)/rho_j * O2D(r)
    (ref: sph_field.go:251-269; the reference multiplies the accumulator by
    mass *inside* the loop — a bug that is identity at its mass=1 operating
    point; we apply mass once).

Masked lanes use the where-trick on denominators/sqrt so no NaN/Inf leaks into
gradients through masked-out slots.
"""

from __future__ import annotations

import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.neighbors.types import Neighborhood
from dieselfluid_tpu.ops.smoothing import (
    KernelCoeffs,
    d2w_visc,
    grad_w,
    w0,
    w_poly6,
)

_EPS = 1e-12


def _src(source, query):
    return query if source is None else source


def _geometry(query_pos, source_pos, nb: Neighborhood):
    """Per-slot displacement, distance and unit direction (query -> neighbor)."""
    xj = source_pos[nb.idx]                       # (N, K, 3)
    diff = xj - query_pos[:, None, :]             # (N, K, 3)
    d2 = jnp.sum(diff * diff, axis=-1)
    # where-trick: sqrt'(0) = inf would leak NaN into gradients through
    # masked self-slots (invalid slots alias index 0), so guard the operand.
    nonzero = d2 > _EPS
    safe_sqrt = jnp.sqrt(jnp.where(nonzero, d2, 1.0))
    dist = jnp.where(nonzero, safe_sqrt, 0.0)
    direction = diff / jnp.where(nonzero, safe_sqrt, 1.0)[..., None]
    return diff, dist, direction


def density(pos, nb: Neighborhood, params: FluidParams, source_pos=None):
    """rho_i = sum_{j != i} m W(r_ij). ref: sph_field.go:155-173 (self excluded)."""
    _, dist, _ = _geometry(pos, _src(source_pos, pos), nb)
    w = w_poly6(dist, KernelCoeffs.build(params.h))
    return params.mass * jnp.sum(w * nb.mask, axis=-1)


def density_with_self(pos, nb: Neighborhood, params: FluidParams, source_pos=None):
    """Physically-standard summation density INCLUDING the m W(0) self term.

    The physical solvers use this everywhere so the rest state is consistent:
    an isolated particle has rho = m W0, not 0. (The reference excludes self
    in the discrete density but adds an unscaled W0 in the continuous one —
    `density`/`density_at` preserve those parity semantics.)
    """
    k = KernelCoeffs.build(params.h)
    return density(pos, nb, params, source_pos) + params.mass * w0(k)


def density_at(query_pos, source_pos, nb: Neighborhood, params: FluidParams):
    """Continuous density at arbitrary positions, *with* the W0 self term.

    ref: sph_field.go DensityF:137-153 — density starts at kern.W0() and
    accumulates m W(r) over samples (self-exclusion does NOT apply here).
    """
    k = KernelCoeffs.build(params.h)
    _, dist, _ = _geometry(query_pos, source_pos, nb)
    w = w_poly6(dist, k)
    return w0(k) + params.mass * jnp.sum(w * nb.mask, axis=-1)


def interpolate(query_pos, source_pos, source_density, values, nb: Neighborhood,
                params: FluidParams):
    """Scalar field interpolation sum_j (m/rho_j) W f_j. ref: sph_field.go:124-135."""
    k = KernelCoeffs.build(params.h)
    _, dist, _ = _geometry(query_pos, source_pos, nb)
    rho_j = source_density[nb.idx]
    weight = params.mass / jnp.maximum(rho_j, _EPS) * w_poly6(dist, k)
    return jnp.sum(weight * values[nb.idx] * nb.mask, axis=-1)


def gradient(pos, rho, values, nb: Neighborhood, params: FluidParams,
             source_pos=None, source_rho=None, source_values=None):
    """Symmetric SPH gradient of a scalar field (pressure-force form).

    grad_i = rho_i m sum_{j != i} (f_i/rho_i^2 + f_j/rho_j^2) gradW(r_ij, dir_ij)
    ref: sph_field.go Gradient:175-200.
    """
    k = KernelCoeffs.build(params.h)
    _, dist, direction = _geometry(pos, _src(source_pos, pos), nb)
    rho_i = jnp.maximum(rho, _EPS)
    rho_j = jnp.maximum(_src(source_rho, rho)[nb.idx], _EPS)
    f_i = values[:, None]
    f_j = _src(source_values, values)[nb.idx]
    coeff = f_i / (rho_i * rho_i)[:, None] + f_j / (rho_j * rho_j)
    gw = grad_w(dist, direction, k)                       # (N, K, 3)
    acc = jnp.sum(gw * (coeff * nb.mask)[..., None], axis=1)
    return acc * (rho * params.mass)[:, None]


def pressure_force(pos, rho, pressure, nb: Neighborhood, params: FluidParams,
                   source_pos=None, source_rho=None, source_pressure=None):
    """Standard symmetric SPH pressure force (momentum-conserving).

    F_i = -m^2 sum_{j != i} (p_i/rho_i^2 + p_j/rho_j^2) gradW(r_ij)

    The reference's Gradient operator instead scales the sum by rho_i * mass
    (ref: sph_field.go:199) — ~rho/m times the physical force; fine there
    because its WCSPH never applies it (ref: solver/wcsph/wcsph.go:14-26) and
    PCISPH's delta absorbs scaling. The physical solver uses this form.
    """
    k = KernelCoeffs.build(params.h)
    _, dist, direction = _geometry(pos, _src(source_pos, pos), nb)
    rho_i = jnp.maximum(rho, _EPS)
    rho_j = jnp.maximum(_src(source_rho, rho)[nb.idx], _EPS)
    p_i = pressure[:, None]
    p_j = _src(source_pressure, pressure)[nb.idx]
    coeff = p_i / (rho_i * rho_i)[:, None] + p_j / (rho_j * rho_j)
    gw = grad_w(dist, direction, k)
    acc = jnp.sum(gw * (coeff * nb.mask)[..., None], axis=1)
    return -(params.mass ** 2) * acc


def divergence(pos, rho, vec_values, nb: Neighborhood, params: FluidParams,
               source_pos=None, source_rho=None, source_values=None):
    """div_i = sum_{j != i} (m/rho_j) v_j . gradW. ref: sph_field.go Div:203-228."""
    k = KernelCoeffs.build(params.h)
    _, dist, direction = _geometry(pos, _src(source_pos, pos), nb)
    rho_j = jnp.maximum(_src(source_rho, rho)[nb.idx], _EPS)
    vj = _src(source_values, vec_values)[nb.idx] * (params.mass / rho_j)[..., None]
    gw = grad_w(dist, direction, k)
    return jnp.sum(jnp.sum(vj * gw, axis=-1) * nb.mask, axis=-1)


def laplacian(pos, rho, values, nb: Neighborhood, params: FluidParams,
              source_pos=None, source_rho=None, source_values=None):
    """lap_i = sum_{j != i} m (f_j - f_i)/rho_j O2D(r). ref: sph_field.go:230-249."""
    k = KernelCoeffs.build(params.h)
    _, dist, _ = _geometry(pos, _src(source_pos, pos), nb)
    rho_j = jnp.maximum(_src(source_rho, rho)[nb.idx], _EPS)
    df = _src(source_values, values)[nb.idx] - values[:, None]
    contrib = params.mass * df / rho_j * d2w_visc(dist, k)
    return jnp.sum(contrib * nb.mask, axis=-1)


def laplacian_force(pos, vel, rho, nb: Neighborhood, params: FluidParams,
                    source_pos=None, source_vel=None, source_rho=None):
    """Viscosity force sum_j m (v_j - v_i)/rho_j O2D(r). ref: sph_field.go:251-269."""
    k = KernelCoeffs.build(params.h)
    _, dist, _ = _geometry(pos, _src(source_pos, pos), nb)
    rho_j = jnp.maximum(_src(source_rho, rho)[nb.idx], _EPS)
    dv = _src(source_vel, vel)[nb.idx] - vel[:, None, :]
    contrib = dv * (d2w_visc(dist, k) / rho_j * nb.mask)[..., None]
    return params.mass * jnp.sum(contrib, axis=1)


def curl(pos, rho, vec_values, nb: Neighborhood, params: FluidParams,
         source_pos=None, source_rho=None, source_values=None):
    """Non-symmetric curl sum_j cross(v_j m/rho_j, gradW). ref: sph_field.go:272-294."""
    k = KernelCoeffs.build(params.h)
    _, dist, direction = _geometry(pos, _src(source_pos, pos), nb)
    rho_j = jnp.maximum(_src(source_rho, rho)[nb.idx], _EPS)
    vj = _src(source_values, vec_values)[nb.idx] * (params.mass / rho_j)[..., None]
    gw = grad_w(dist, direction, k)
    return jnp.sum(jnp.cross(vj, gw) * nb.mask[..., None], axis=1)
