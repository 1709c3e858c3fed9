"""WCSPH/PCISPH steps on the dense cell pipeline (Pallas hot loops).

The production TPU path: scatter particles into dense cell planes
(ops/cellops.py), run the Pallas density/force kernels (ops/pallas_sph.py),
gather per-particle results, integrate with the shared integrator. Forward
semantics match the XLA gather path (field.density_with_self + pressure_force
+ laplacian_force) — tested against it — while avoiding its sort/top_k/gather
costs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import FluidState
from dieselfluid_tpu.ops.cellops import DenseCellSpec, build_planes, dense_indices, gather_plane
from dieselfluid_tpu.ops.pallas_sph import density_planes, force_planes
from dieselfluid_tpu.ops.smoothing import KernelCoeffs, tait_eos
from dieselfluid_tpu.solvers.integrate import StepDiagnostics, box_collide, semi_implicit_euler


def dense_density_forces(state: FluidState, params: FluidParams,
                         spec: DenseCellSpec):
    """(rho, pressure, force, overflow) for the current positions.

    Note: the Pallas kernels bake mass/mu/h as compile-time constants, so
    traced Materials overrides are not supported on this path — use the XLA
    gather path (solvers.wcsph) when differentiating material parameters.
    """
    d0, gamma, w = params.d0, params.tait_gamma, params.tait_w

    flat, valid, overflow = dense_indices(state.pos, spec)
    planes = build_planes(
        {"x": state.pos[:, 0], "y": state.pos[:, 1], "z": state.pos[:, 2],
         "vx": state.vel[:, 0], "vy": state.vel[:, 1], "vz": state.vel[:, 2]},
        flat, valid, spec,
    )
    k = KernelCoeffs.build(params.h)
    rho_plane = density_planes(planes, spec, k, params.mass)
    press_plane = jnp.where(
        planes["mask"] > 0,
        tait_eos(rho_plane, d0, params.p0, gamma, w),
        0.0,
    )
    fx_p, fy_p, fz_p = force_planes(planes, rho_plane, press_plane, spec, k,
                                    params.mass, float(params.mu))

    rho = gather_plane(rho_plane, flat)
    pressure = gather_plane(press_plane, flat)
    force = jnp.stack([
        gather_plane(fx_p, flat),
        gather_plane(fy_p, flat),
        gather_plane(fz_p, flat),
    ], axis=-1)
    # Overflowed particles fall back to zero interaction (gravity only);
    # overflow is returned so callers can size capacity.
    rho = jnp.where(valid, rho, d0)
    pressure = jnp.where(valid, pressure, 0.0)
    force = jnp.where(valid[:, None], force, 0.0)
    return rho, pressure, force, overflow


@partial(jax.jit, static_argnames=("params", "spec", "bounds"))
def dense_wcsph_step(
    state: FluidState,
    params: FluidParams,
    spec: DenseCellSpec,
    bounds: Optional[Tuple] = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
) -> Tuple[FluidState, StepDiagnostics]:
    """One WCSPH frame on the Pallas pipeline."""
    rho, pressure, f, _ = dense_density_forces(state, params, spec)
    gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
    state = state._replace(density=rho, pressure=pressure, force=gravity + f)
    state, diag = semi_implicit_euler(state, params)
    if bounds is not None:
        state = box_collide(state, *bounds)
    return state, diag
