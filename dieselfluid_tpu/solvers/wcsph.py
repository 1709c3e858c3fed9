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
) -> Tuple[FluidState, StepDiagnostics]:
    """One complete WCSPH frame. BASELINE config 1 driver."""
    nfn = neighbor_fn or default_neighbor_fn(params)
    nb = nfn(state.pos)
    state = compute_forces(state, nb, params, materials)
    state, diag = semi_implicit_euler(state, params)
    if bounds is not None:
        state = box_collide(state, *bounds)
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
