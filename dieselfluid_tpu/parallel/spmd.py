"""Explicit SPMD WCSPH over a device mesh via shard_map.

Each device owns a contiguous shard of the particle axis; per frame it
all-gathers the source pool over ICI (the round-1 communication pattern;
the sorted-cell-grid halo exchange replaces the all-gather at scale), computes
forces for its local particles with the shared field operators, and integrates
locally. Global reductions (max velocity / max force — the reference computes
these as global sequential maxima, ref: model/sph/fluid.go:184-191) become
lax.pmax over the mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models import field as F
from dieselfluid_tpu.models.materials import Materials
from dieselfluid_tpu.models.particles import FluidState
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.ops.smoothing import tait_eos
from dieselfluid_tpu.solvers.integrate import StepDiagnostics, box_collide, semi_implicit_euler

AXIS = "sp"


def local_wcsph_frame(
    state: FluidState,
    params: FluidParams,
    materials: Optional[Materials] = None,
    k: int = 64,
    axis: str = AXIS,
):
    """One WCSPH frame on the local particle shard (call inside shard_map).

    `state` holds this device's shard; source positions/fields are
    all-gathered over `axis`.
    """
    mu = params.mu if materials is None else materials.mu
    d0 = params.d0 if materials is None else materials.d0
    gamma = params.tait_gamma if materials is None else materials.tait_gamma
    w = params.tait_w if materials is None else materials.tait_w

    n_local = state.pos.shape[0]
    offset = jax.lax.axis_index(axis) * n_local
    all_pos = jax.lax.all_gather(state.pos, axis, tiled=True)
    nb = brute_force_neighborhood(state.pos, all_pos, params.h, k, self_offset=offset)

    rho = F.density_with_self(state.pos, nb, params, source_pos=all_pos)
    pressure = tait_eos(rho, d0, params.p0, gamma, w)
    all_rho = jax.lax.all_gather(rho, axis, tiled=True)
    all_pressure = jax.lax.all_gather(pressure, axis, tiled=True)
    all_vel = jax.lax.all_gather(state.vel, axis, tiled=True)

    visc = mu * F.laplacian_force(
        state.pos, state.vel, rho, nb, params,
        source_pos=all_pos, source_vel=all_vel, source_rho=all_rho,
    )
    f_p = F.pressure_force(
        state.pos, rho, pressure, nb, params,
        source_pos=all_pos, source_rho=all_rho, source_pressure=all_pressure,
    )
    gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
    state = state._replace(
        density=rho, pressure=pressure, force=gravity + f_p + visc
    )
    state, diag = semi_implicit_euler(state, params)
    state = box_collide(state)
    # The integrator resets force/pressure to device-invariant constants
    # (gravity / zeros); mark them varying over the mesh axis so scan carries
    # keep a consistent type under shard_map.
    def ensure_varying(x):
        if axis in getattr(jax.typeof(x), "vma", ()):
            return x
        return jax.lax.pvary(x, axis)

    state = state._replace(
        force=ensure_varying(state.force),
        pressure=ensure_varying(state.pressure),
    )
    # Diagnostics are monitoring-only: stop_gradient so pmax (no diff rule)
    # never sits on the autodiff path.
    diag = StepDiagnostics(
        max_vel=jax.lax.pmax(jax.lax.stop_gradient(diag.max_vel), axis),
        max_force=jax.lax.pmax(jax.lax.stop_gradient(diag.max_force), axis),
    )
    return state, diag


def make_spmd_rollout(mesh, params: FluidParams, n_steps: int, k: int = 64):
    """shard_map'ed multi-frame rollout: (sharded state, materials) -> state, diags."""
    state_spec = FluidState(
        pos=P(AXIS, None), vel=P(AXIS, None), force=P(AXIS, None),
        density=P(AXIS), pressure=P(AXIS), boundary_pos=None,
    )
    mat_spec = jax.tree.map(lambda _: P(), Materials.from_params(params))

    def rollout_local(state: FluidState, materials: Materials):
        def body(s, _):
            s, diag = local_wcsph_frame(s, params, materials, k=k)
            return s, diag.max_vel

        final, max_vels = jax.lax.scan(body, state, None, length=n_steps)
        return final, max_vels

    return jax.shard_map(
        rollout_local,
        mesh=mesh,
        in_specs=(state_spec, mat_spec),
        out_specs=(state_spec, P()),
    )
