"""PCISPH — predictive-corrective incompressible SPH.

Re-implements the reference's CPU PCISPH loop (ref: solver/pcisph/
pcisph_darwin.go:24-118) as a jit-compiled lax.while_loop with the reference's
iteration policy: at most 5 correction iterations, early exit when the max
density-error ratio falls to <= 1% (ref: pcisph_darwin.go:49-50, 95-98).

Two variants:

* ``pcisph_step`` — the physical solver (Solenthaler-Pajarola 2009 scheme):
  per iteration, predict positions from external+pressure forces, evaluate
  predicted density, accumulate pressure via the precomputed delta, and
  *recompute* the pressure force from the accumulated pressure.
* ``reference_pcisph_step`` — parity mode preserving the reference quirks:
  the predicted pos/vel buffers persist across iterations *and frames*
  (ref: pcisph_darwin.go:35-43 — `_pos/_vel` initialized once outside the
  frame loop and integrated every iteration without reset, so predictions
  compound), density at predicted positions includes the W0 term (DensityF,
  ref: sph_field.go:139), the pressure force uses the rho*m-scaled Gradient
  operator, and forces accumulate across iterations (GradientPressureForce
  calls AddForce without reset, ref: model/sph/fluid.go:160-171).

The backward pass differentiates the while_loop via a fixed-iteration scan
(`unroll_for_grad=True`) since lax.while_loop is not reverse-differentiable.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models import field as F
from dieselfluid_tpu.models.particles import FluidState
from dieselfluid_tpu.neighbors.types import Neighborhood
from dieselfluid_tpu.ops.smoothing import KernelCoeffs, grad_w
from dieselfluid_tpu.solvers.integrate import StepDiagnostics, box_collide, semi_implicit_euler


# --------------------------------------------------------------------------
# PCISPH delta (pressure-correction scale)
# --------------------------------------------------------------------------


def compute_pci_delta(params: FluidParams, dx: float) -> float:
    """delta = -1 / (beta * (-|sum gradW|^2 - sum |gradW|^2)).

    Template-grid evaluation of the PCISPH correction scale: sum kernel
    gradients over a filled lattice neighborhood of spacing dx around the
    origin. ref: model/sph/fluid.go pcidelta:221-273 builds an 8^3 grid and
    sums Grad(W) for template particles within h of the center; beta =
    dt^2 m^2 2/d0^2 (ref: fluid.go computeBeta:275-277). Matches
    Solenthaler-Pajarola 2009 eq. 8.
    """
    k = KernelCoeffs.build(params.h)
    r = int(np.ceil(params.h / dx))
    axis = np.arange(-r, r + 1) * dx
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    d = np.linalg.norm(pts, axis=-1)
    sel = (d > 0) & (d < params.h)
    pts, d = pts[sel], d[sel]
    dirs = pts / d[:, None]
    gw = np.asarray(grad_w(jnp.asarray(d), jnp.asarray(dirs), k))
    denom1 = gw.sum(axis=0)
    denom2 = float((gw * gw).sum())
    denom = -float(denom1 @ denom1) - denom2
    beta = (params.dt ** 2) * (params.mass ** 2) * (2.0 / (params.d0 ** 2))
    if denom == 0.0:
        return float(params.h)  # ref fallback: delta := h (fluid.go:79-81)
    return float(-1.0 / (beta * denom))


# --------------------------------------------------------------------------
# Physical PCISPH
# --------------------------------------------------------------------------


class _Carry(NamedTuple):
    it: jnp.ndarray
    err: jnp.ndarray
    pressure: jnp.ndarray
    f_p: jnp.ndarray


def _pressure_iteration(state, nb, params, delta, ext_force, carry: _Carry,
                        frozen=None, d0=None):
    """One predict-correct iteration (physical form). `frozen` (bool mask)
    pins boundary particles: they never move in the prediction."""
    d0 = params.d0 if d0 is None else d0
    accel = (ext_force + carry.f_p) / params.mass
    vel_star = state.vel + accel * params.dt
    if frozen is not None:
        vel_star = jnp.where(frozen[:, None], 0.0, vel_star)
    pos_star = state.pos + vel_star * params.dt
    # Predicted density with the same neighbor *indices* (the reference keeps
    # its LSH table frozen within a frame too) but distances at predicted pos;
    # self term included for consistency with the calibrated d0.
    rho_star = F.density_with_self(pos_star, nb, params)
    err = rho_star - d0
    pressure = jnp.maximum(carry.pressure + delta * err, 0.0)
    rho_for_force = jnp.maximum(rho_star, 0.5 * d0)
    f_p = F.pressure_force(state.pos, rho_for_force, pressure, nb, params)
    max_ratio = jnp.max(err) / d0
    return _Carry(carry.it + 1, max_ratio, pressure, f_p)


def pcisph_step_core(
    state: FluidState,
    nb: Neighborhood,
    params: FluidParams,
    delta: float,
    unroll_for_grad: bool = False,
    frozen=None,
    materials=None,
):
    """Density + viscosity + gravity, then the pressure-projection loop.

    `materials` optionally supplies traced mu/d0 (mass stays baked in the
    field operators — same contract as wcsph.compute_forces)."""
    mu = params.mu if materials is None else materials.mu
    d0 = params.d0 if materials is None else materials.d0
    rho = F.density_with_self(state.pos, nb, params)
    visc = mu * F.laplacian_force(state.pos, state.vel, rho, nb, params)
    gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
    ext_force = gravity + visc

    # Iteration zero accumulates onto state.pressure (ref: pcisph_darwin.go:86
    # adds onto the aliased field.Pressures() slice). NOTE the reference's
    # Update resets Press to 0 every frame (fluid.go:192 `particle.Press=0`),
    # and so does semi_implicit_euler — so by default every frame COLD-starts,
    # exactly like the reference. A caller opting into a cross-frame warm
    # start (fewer correction iterations) keeps the accumulated pressure in
    # the output state via `warm_start=True` on the step functions.
    init = _Carry(
        it=jnp.int32(0),
        err=jnp.float32(jnp.inf),
        pressure=state.pressure,
        f_p=jnp.zeros_like(state.force),
    )

    body = lambda c: _pressure_iteration(state, nb, params, delta, ext_force,
                                         c, frozen, d0=d0)

    if unroll_for_grad:
        # Reverse-mode-safe: fixed pci_max_iters iterations via scan.
        def scan_body(c, _):
            return body(c), None

        carry, _ = jax.lax.scan(scan_body, init, None, length=params.pci_max_iters)
    else:
        cond = lambda c: (c.it < params.pci_max_iters) & (
            c.err > params.pci_max_density_error_ratio
        )
        carry = jax.lax.while_loop(cond, body, init)

    force = ext_force + carry.f_p
    return state._replace(density=rho, pressure=carry.pressure, force=force), carry.err


@partial(jax.jit, static_argnames=("params", "neighbor_fn", "delta", "bounds",
                                   "unroll_for_grad", "warm_start"))
def pcisph_step(
    state: FluidState,
    params: FluidParams,
    delta: float,
    neighbor_fn: Optional[Callable] = None,
    bounds: Optional[Tuple] = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
    unroll_for_grad: bool = False,
    collider=None,
    materials=None,
    warm_start: bool = False,
) -> Tuple[FluidState, StepDiagnostics]:
    """One PCISPH frame (BASELINE config 2 driver). Boundary particles in
    `state.boundary_pos` join the correction loop as frozen fluid; `collider`
    adds mesh narrow-phase response (see wcsph_step); `materials` supplies
    traced mu/d0 for material-parameter gradients. `warm_start=True` keeps
    the accumulated pressure in the returned state (next frame's correction
    loop starts from it — fewer iterations; deviates from the reference's
    per-frame Press=0 reset, fluid.go:192)."""
    from dieselfluid_tpu.solvers.wcsph import (
        _slice_fluid,
        default_neighbor_fn,
        extend_with_boundary,
    )

    nfn = neighbor_fn or default_neighbor_fn(params)
    if state.boundary_pos is not None:
        n = state.pos.shape[0]
        ext = extend_with_boundary(state)
        frozen = jnp.arange(ext.pos.shape[0]) >= n
        nb = nfn(ext.pos)
        ext, _ = pcisph_step_core(ext, nb, params, delta, unroll_for_grad,
                                  frozen=frozen, materials=materials)
        state = _slice_fluid(ext, n, state)
    else:
        nb = nfn(state.pos)
        state, _ = pcisph_step_core(state, nb, params, delta, unroll_for_grad,
                                    materials=materials)
    accum_press = state.pressure
    state, diag = semi_implicit_euler(state, params)
    if warm_start:
        state = state._replace(pressure=accum_press)
    if bounds is not None:
        state = box_collide(state, *bounds)
    if collider is not None:
        from dieselfluid_tpu.geometry.mesh import mesh_collide

        state = mesh_collide(state, collider, params.dt, 0.5 * params.h)
    return state, diag


# --------------------------------------------------------------------------
# Reference-parity PCISPH
# --------------------------------------------------------------------------


class ReferencePciState(NamedTuple):
    """Frame-persistent predicted buffers (ref: pcisph_darwin.go:30-43)."""

    fluid: FluidState
    pos_star: jnp.ndarray
    vel_star: jnp.ndarray

    @staticmethod
    def init(fluid: FluidState) -> "ReferencePciState":
        return ReferencePciState(fluid, fluid.pos, fluid.vel)


@partial(jax.jit, static_argnames=("params", "neighbor_fn", "delta"))
def reference_pcisph_step(
    pstate: ReferencePciState,
    params: FluidParams,
    delta: float,
    neighbor_fn: Optional[Callable] = None,
) -> Tuple[ReferencePciState, StepDiagnostics]:
    """Exact reference frame: quirks preserved (see module docstring)."""
    from dieselfluid_tpu.solvers.wcsph import default_neighbor_fn

    state = pstate.fluid
    nfn = neighbor_fn or default_neighbor_fn(params)
    nb = nfn(state.pos)
    rho = F.density(state.pos, nb, params)
    visc = params.mu * F.laplacian_force(state.pos, state.vel, rho, nb, params)
    # ref: DensityAll + ViscousAll only — gravity already sits in the force
    # buffer from the previous Update (fluid.go:192).
    force = state.force + visc
    state = state._replace(density=rho, force=force)

    class C(NamedTuple):
        it: jnp.ndarray
        err: jnp.ndarray
        pos_star: jnp.ndarray
        vel_star: jnp.ndarray
        pressure: jnp.ndarray
        force: jnp.ndarray

    def body(c: C) -> C:
        # Predict from the *persistent* starred buffers (reference quirk).
        accel = c.force / params.mass
        vel_star = c.vel_star + accel * params.dt
        pos_star = c.pos_star + vel_star * params.dt
        # DensityF at predicted positions against predicted pool, with W0.
        rho_star = F.density_at(pos_star, pos_star, nb, params)
        err = rho_star - params.d0
        pressure = c.pressure + err * delta
        max_ratio = jnp.max(err / params.d0)
        # GradientPressureForce: rho*m-scaled Gradient, *accumulated* onto force.
        grad = F.gradient(state.pos, rho, pressure, nb, params)
        return C(c.it + 1, max_ratio, pos_star, vel_star, pressure, c.force + grad)

    init = C(jnp.int32(0), jnp.float32(jnp.inf), pstate.pos_star, pstate.vel_star,
             state.pressure, state.force)
    cond = lambda c: (c.it < params.pci_max_iters) & (
        c.err > params.pci_max_density_error_ratio
    )
    c = jax.lax.while_loop(cond, body, init)

    state = state._replace(pressure=c.pressure, force=c.force)
    state, diag = semi_implicit_euler(state, params)
    return ReferencePciState(state, c.pos_star, c.vel_star), diag
