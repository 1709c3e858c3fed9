"""WCSPH — weakly compressible SPH with the Tait equation of state.

Two step functions:

* ``wcsph_step`` — the physically complete solver this framework ships:
  density -> Tait pressure -> pressure-gradient + viscosity + gravity forces ->
  symplectic Euler -> box collision. This is what the reference *describes*
  (its per-op building blocks all exist) but never assembles: the reference's
  WCSPH loop computes pressures and then integrates without ever calling
  GradientPressureForce or ViscousAll (ref: solver/wcsph/wcsph.go:14-26).

* ``reference_wcsph_step`` — exact parity with the reference loop for oracle
  trajectory comparison, quirks preserved: gravity force applied twice (the
  force buffer is reset to gravity*mass by Update, then ExternalAll adds an
  *unscaled* gravity vector on top, ref: wcsph.go:19 + model/sph/fluid.go:192),
  and no pressure/viscous forces.

Both are pure FluidState -> FluidState functions, jit/grad/vmap/shard-safe.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models import field as F
from dieselfluid_tpu.models.particles import FluidState
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.neighbors.types import Neighborhood
from dieselfluid_tpu.ops.smoothing import tait_eos
from dieselfluid_tpu.solvers.integrate import StepDiagnostics, box_collide, semi_implicit_euler

NeighborFn = Callable[[jnp.ndarray], Neighborhood]


def default_neighbor_fn(params: FluidParams, k: int = 64) -> NeighborFn:
    return lambda pos: brute_force_neighborhood(pos, pos, params.h, k)


def compute_forces(
    state: FluidState, nb: Neighborhood, params: FluidParams, materials=None
) -> FluidState:
    """Density, Tait pressure, and total force (gravity + viscosity + pressure).

    `materials` (models.materials.Materials) optionally supplies *traced*
    mu/d0/gamma/w so gradients can flow to material parameters; when absent the
    static FluidParams values are baked in.
    """
    mu = params.mu if materials is None else materials.mu
    d0 = params.d0 if materials is None else materials.d0
    gamma = params.tait_gamma if materials is None else materials.tait_gamma
    w = params.tait_w if materials is None else materials.tait_w
    rho = F.density_with_self(state.pos, nb, params)
    pressure = tait_eos(rho, d0, params.p0, gamma, w)
    visc = mu * F.laplacian_force(state.pos, state.vel, rho, nb, params)
    f_p = F.pressure_force(state.pos, rho, pressure, nb, params)
    gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
    force = gravity + f_p + visc
    return state._replace(density=rho, pressure=pressure, force=force)


def extend_with_boundary(state: FluidState) -> FluidState:
    """Append boundary particles as frozen fluid: they carry mass (density
    sources) and exert symmetric pressure forces, with zero velocity — the
    working version of the reference's dead plumbing (ref:
    model/particle_array.go AddBoundaryParticles:123 appends positions that
    the GPU sampler then feeds to every kernel, pcisph.h get_sample; the
    CPU wiring is commented out at model/sph/fluid.go:70)."""
    b = state.boundary_pos
    n_b = b.shape[0]
    z3 = jnp.zeros((n_b, 3), state.pos.dtype)
    z1 = jnp.zeros((n_b,), state.pos.dtype)
    return FluidState(
        pos=jnp.concatenate([state.pos, b], axis=0),
        vel=jnp.concatenate([state.vel, z3], axis=0),
        force=jnp.concatenate([state.force, z3], axis=0),
        density=jnp.concatenate([state.density, z1], axis=0),
        pressure=jnp.concatenate([state.pressure, z1], axis=0),
        boundary_pos=None,
    )


def _slice_fluid(ext: FluidState, n: int, state: FluidState) -> FluidState:
    return state._replace(
        density=ext.density[:n], pressure=ext.pressure[:n], force=ext.force[:n]
    )


@partial(jax.jit, static_argnames=("params", "neighbor_fn", "bounds"))
def wcsph_step(
    state: FluidState,
    params: FluidParams,
    neighbor_fn: Optional[NeighborFn] = None,
    bounds: Optional[Tuple[Tuple[float, float, float], Tuple[float, float, float]]] = (
        (-1.0, -1.0, -1.0),
        (1.0, 1.0, 1.0),
    ),
    materials=None,
    collider=None,
) -> Tuple[FluidState, StepDiagnostics]:
    """One complete WCSPH frame. BASELINE config 1 driver.

    With `state.boundary_pos` set, boundary particles join the source pool as
    frozen fluid (see extend_with_boundary). `collider` (geometry.mesh.Mesh)
    adds mesh narrow-phase collision response after integration — the wiring
    the reference declares but never connects (ref: model/sph/fluid.go:41
    takes []*mesh.Mesh, :70 commented out).
    """
    nfn = neighbor_fn or default_neighbor_fn(params)
    if state.boundary_pos is not None:
        n = state.pos.shape[0]
        ext = extend_with_boundary(state)
        nb = nfn(ext.pos)
        ext = compute_forces(ext, nb, params, materials)
        state = _slice_fluid(ext, n, state)
    else:
        nb = nfn(state.pos)
        state = compute_forces(state, nb, params, materials)
    state, diag = semi_implicit_euler(state, params)
    if bounds is not None:
        state = box_collide(state, *bounds)
    if collider is not None:
        from dieselfluid_tpu.geometry.mesh import mesh_collide

        state = mesh_collide(state, collider, params.dt, 0.5 * params.h)
    return state, diag


@partial(jax.jit, static_argnames=("params", "neighbor_fn"))
def reference_wcsph_step(
    state: FluidState,
    params: FluidParams,
    neighbor_fn: Optional[NeighborFn] = None,
) -> Tuple[FluidState, StepDiagnostics]:
    """Exact reference WCSPH frame (quirks preserved) for oracle parity.

    ref: solver/wcsph/wcsph.go Run:14-26 —
      DensityAll; ExternalAll((0,-9.81,0)); PressureAll; Update.
    """
    nfn = neighbor_fn or default_neighbor_fn(params)
    nb = nfn(state.pos)
    rho = F.density(state.pos, nb, params)
    force = state.force + jnp.asarray(params.gravity, jnp.float32)  # unscaled add
    pressure = tait_eos(rho, params.d0, params.p0, params.tait_gamma, params.tait_w)
    state = state._replace(density=rho, pressure=pressure, force=force)
    return semi_implicit_euler(state, params)


def rollout(step_fn, state: FluidState, n_steps: int):
    """lax.scan a step function; returns final state + stacked position history."""

    def body(s, _):
        s, diag = step_fn(s)
        return s, (s.pos, diag.max_vel)

    final, (traj, max_vels) = jax.lax.scan(body, state, None, length=n_steps)
    return final, traj, max_vels
