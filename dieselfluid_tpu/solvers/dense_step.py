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
    """One WCSPH frame on the Pallas pipeline. diag.overflow reports dropped
    particles (cell-capacity) — nonzero means resize the spec's capacity."""
    rho, pressure, f, overflow = dense_density_forces(state, params, spec)
    gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
    state = state._replace(density=rho, pressure=pressure, force=gravity + f)
    state, diag = semi_implicit_euler(state, params)
    diag = diag._replace(overflow=overflow)
    if bounds is not None:
        state = box_collide(state, *bounds)
    return state, diag


@partial(jax.jit, static_argnames=("params", "spec", "delta", "bounds"))
def dense_pcisph_step(
    state: FluidState,
    params: FluidParams,
    spec: DenseCellSpec,
    delta: float,
    bounds: Optional[Tuple] = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
) -> Tuple[FluidState, StepDiagnostics]:
    """One PCISPH frame on the Pallas pipeline.

    The cell binning is frozen for the frame (computed at the pre-step
    positions) while predicted positions update the plane *values* each
    correction iteration — the dense-layout analog of the reference's frozen
    LSH sampler within a frame (ref: solver/pcisph/pcisph_darwin.go keeps its
    table until the next SAMPLER_UPDATE).
    """
    from dieselfluid_tpu.solvers.pcisph import _Carry

    k = KernelCoeffs.build(params.h)
    flat, valid, overflow = dense_indices(state.pos, spec)

    def planes_at(pos, vel):
        return build_planes(
            {"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
             "vx": vel[:, 0], "vy": vel[:, 1], "vz": vel[:, 2]},
            flat, valid, spec,
        )

    planes = planes_at(state.pos, state.vel)
    rho_plane = density_planes(planes, spec, k, params.mass)
    rho = gather_plane(rho_plane, flat)
    # External forces: gravity + viscosity at the unpredicted state (zero
    # pressure plane -> force kernel yields viscosity only).
    zero_press = jnp.zeros(spec.plane_shape, jnp.float32)
    vx_p, vy_p, vz_p = force_planes(planes, rho_plane, zero_press, spec, k,
                                    params.mass, float(params.mu))
    visc = jnp.stack([gather_plane(vx_p, flat), gather_plane(vy_p, flat),
                      gather_plane(vz_p, flat)], axis=-1)
    gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
    ext_force = gravity + visc


    def body(c):
        accel = (ext_force + c.f_p) / params.mass
        vel_star = state.vel + accel * params.dt
        pos_star = state.pos + vel_star * params.dt
        p_star = planes_at(pos_star, vel_star)
        rho_star_plane = density_planes(p_star, spec, k, params.mass)
        rho_star = gather_plane(rho_star_plane, flat)
        err = rho_star - params.d0
        pressure = jnp.maximum(c.pressure + delta * err, 0.0)
        press_plane = jnp.zeros(spec.plane_shape, jnp.float32).reshape(-1).at[
            jnp.where(valid, flat, 0)
        ].add(jnp.where(valid, pressure, 0.0)).reshape(spec.plane_shape)
        rho_for_force = jnp.maximum(rho_star, 0.5 * params.d0)
        rff_plane = jnp.zeros(spec.plane_shape, jnp.float32).reshape(-1).at[
            jnp.where(valid, flat, 0)
        ].add(jnp.where(valid, rho_for_force, 0.0)).reshape(spec.plane_shape)
        fx_p, fy_p, fz_p = force_planes(planes, rff_plane, press_plane, spec, k,
                                        params.mass, 0.0)
        f_p = jnp.stack([gather_plane(fx_p, flat), gather_plane(fy_p, flat),
                         gather_plane(fz_p, flat)], axis=-1)
        max_ratio = jnp.max(err) / params.d0
        return _Carry(c.it + 1, max_ratio, pressure, f_p)

    init = _Carry(it=jnp.int32(0), err=jnp.float32(jnp.inf),
                  pressure=jnp.zeros_like(state.pressure),
                  f_p=jnp.zeros_like(state.force))
    cond = lambda c: (c.it < params.pci_max_iters) & (
        c.err > params.pci_max_density_error_ratio)
    carry = jax.lax.while_loop(cond, body, init)

    state = state._replace(density=rho, pressure=carry.pressure,
                           force=ext_force + carry.f_p)
    state, diag = semi_implicit_euler(state, params)
    diag = diag._replace(overflow=overflow)
    if bounds is not None:
        state = box_collide(state, *bounds)
    return state, diag
