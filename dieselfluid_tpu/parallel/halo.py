"""Spatial domain decomposition: slab sharding + ppermute halo exchange.

The scalable multi-chip strategy (SURVEY.md §5 "TPU equivalent"): the domain
is split into x-axis slabs, one per device on the ``sp`` mesh axis. Each
device owns the particles inside its slab (fixed-capacity SoA with an alive
mask — XLA needs static shapes), and per step:

  1. packs the particles within one kernel radius of each slab face into
     fixed-size halo buffers and ppermutes them to the adjacent devices
     (ghost particles ride the ICI torus, not an all-gather);
  2. computes forces against local + halo sources with the shared field
     operators;
  3. integrates locally, then migrates particles whose x crossed a slab
     boundary to the neighbor via a second (fixed-size) ppermute, compacting
     free slots.

Communication is O(surface) per step instead of the all-gather's O(N) — the
difference between DP-over-particles (parallel/spmd.py) and true spatial
parallelism. Fixed capacities make overflow measurable, not silent:
`SlabState.dropped` counts particles that didn't fit (psum'd).

CPU-EMULATION CAVEAT: on the virtual multi-device CPU backend
(xla_force_host_platform_device_count), dispatching many steps without
blocking can deadlock XLA's in-process collective rendezvous (worker threads
oversubscribed across enqueued programs; observed at ~150 queued steps).
Call jax.block_until_ready periodically when driving loops on CPU; real TPU
meshes use hardware collectives and do not need this.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models import field as F
from dieselfluid_tpu.models.particles import FluidState
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.ops.smoothing import tait_eos
from dieselfluid_tpu.solvers.integrate import box_collide, semi_implicit_euler

AXIS = "sp"


@dataclasses.dataclass(frozen=True)
class SlabSpec:
    """Static decomposition config: n_dev x-slabs over [lo, hi]."""

    n_dev: int
    capacity: int            # live-particle slots per device
    halo_capacity: int       # slots per face halo buffer
    migrate_capacity: int    # slots per face migration buffer
    lo: float = -1.0
    hi: float = 1.0
    h: float = 0.2           # halo width = kernel radius

    @property
    def slab_width(self) -> float:
        return (self.hi - self.lo) / self.n_dev

    def slab_bounds(self, dev_idx):
        lo = self.lo + self.slab_width * dev_idx
        return lo, lo + self.slab_width


class SlabState(NamedTuple):
    """Per-device fixed-capacity particle store (leaves sharded over sp)."""

    pos: jnp.ndarray       # (C, 3)
    vel: jnp.ndarray       # (C, 3)
    alive: jnp.ndarray     # (C,) float32 {0,1}
    dropped: jnp.ndarray   # () running count of capacity overflows


def _compact(mask: jnp.ndarray, *arrays):
    """Stable-partition rows with mask=1 to the front; returns packed arrays
    + packed mask. Uses argsort of (1-mask) with stable iota tiebreak."""
    order = jnp.argsort(1.0 - mask, stable=True)
    return tuple(a[order] for a in arrays) + (mask[order],)


def _pack_first(mask: jnp.ndarray, count: int, *arrays):
    """Select up to `count` rows where mask=1, packed to a fixed-size buffer."""
    packed = _compact(mask, *arrays)
    out_arrays, out_mask = packed[:-1], packed[-1]
    return tuple(a[:count] for a in out_arrays) + (out_mask[:count],)


def distribute(state: FluidState, spec: SlabSpec) -> SlabState:
    """Host-side: bin a global FluidState into the sharded slab layout.

    Returns a SlabState whose arrays have leading dim n_dev*capacity,
    ordered device-major (shard with P('sp') over axis 0).
    """
    import numpy as np

    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    slab = np.clip(((pos[:, 0] - spec.lo) / spec.slab_width).astype(int),
                   0, spec.n_dev - 1)
    c = spec.capacity
    out_pos = np.zeros((spec.n_dev * c, 3), np.float32)
    out_vel = np.zeros((spec.n_dev * c, 3), np.float32)
    alive = np.zeros((spec.n_dev * c,), np.float32)
    dropped = 0
    for d in range(spec.n_dev):
        idx = np.where(slab == d)[0]
        take = idx[:c]
        dropped += len(idx) - len(take)
        out_pos[d * c:d * c + len(take)] = pos[take]
        out_vel[d * c:d * c + len(take)] = vel[take]
        alive[d * c:d * c + len(take)] = 1.0
    return SlabState(
        pos=jnp.asarray(out_pos), vel=jnp.asarray(out_vel),
        alive=jnp.asarray(alive),
        dropped=jnp.asarray(float(dropped)),
    )


def collect(slabs: SlabState):
    """Gather all live particles back to host order (for IO/render)."""
    import numpy as np

    alive = np.asarray(slabs.alive) > 0
    return np.asarray(slabs.pos)[alive], np.asarray(slabs.vel)[alive]


# ---------------------------------------------------------------------------
# shard_map internals
# ---------------------------------------------------------------------------


def _exchange_halos(pos, vel, alive, spec: SlabSpec, axis=AXIS):
    """Pack boundary particles and ppermute to neighbors.

    Returns (halo_pos (2Hc, 3), halo_vel, halo_mask) — left+right ghosts.
    Non-periodic: edge devices receive zeroed masks from the wrap-around
    (their out-of-domain neighbor's send is masked off).
    """
    me = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    slab_lo = spec.lo + spec.slab_width * me
    slab_hi = slab_lo + spec.slab_width

    near_lo = (alive > 0) & (pos[:, 0] < slab_lo + spec.h)
    near_hi = (alive > 0) & (pos[:, 0] >= slab_hi - spec.h)

    hc = spec.halo_capacity
    lo_pos, lo_vel, lo_mask = _pack_first(near_lo.astype(jnp.float32), hc, pos, vel)
    hi_pos, hi_vel, hi_mask = _pack_first(near_hi.astype(jnp.float32), hc, pos, vel)

    # Send my low-face particles to the left neighbor (they become its right
    # halo) and my high-face ones to the right neighbor.
    right_perm = [(i, (i + 1) % n) for i in range(n)]   # data flows to rank+1
    left_perm = [(i, (i - 1) % n) for i in range(n)]

    from_left = [jax.lax.ppermute(x, axis, right_perm) for x in (hi_pos, hi_vel, hi_mask)]
    from_right = [jax.lax.ppermute(x, axis, left_perm) for x in (lo_pos, lo_vel, lo_mask)]

    # Mask the non-periodic wrap: device 0's "from_left" came from device n-1.
    is_first = (me == 0)
    is_last = (me == n - 1)
    fl_mask = jnp.where(is_first, 0.0, from_left[2])
    fr_mask = jnp.where(is_last, 0.0, from_right[2])

    halo_pos = jnp.concatenate([from_left[0], from_right[0]], axis=0)
    halo_vel = jnp.concatenate([from_left[1], from_right[1]], axis=0)
    halo_mask = jnp.concatenate([fl_mask, fr_mask], axis=0)
    return halo_pos, halo_vel, halo_mask


def _migrate(pos, vel, alive, dropped, spec: SlabSpec, axis=AXIS):
    """Move particles that left the slab to the adjacent device."""
    me = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    slab_lo = spec.lo + spec.slab_width * me
    slab_hi = slab_lo + spec.slab_width

    live = alive > 0
    go_left = live & (pos[:, 0] < slab_lo) & (me > 0)
    go_right = live & (pos[:, 0] >= slab_hi) & (me < n - 1)
    stay = alive * (1.0 - go_left.astype(jnp.float32)) * (1.0 - go_right.astype(jnp.float32))

    mc = spec.migrate_capacity
    l_pos, l_vel, l_mask = _pack_first(go_left.astype(jnp.float32), mc, pos, vel)
    r_pos, r_vel, r_mask = _pack_first(go_right.astype(jnp.float32), mc, pos, vel)
    # Overflow: emigrants beyond capacity are lost — count them.
    lost = (jnp.sum(go_left) - jnp.sum(l_mask)) + (jnp.sum(go_right) - jnp.sum(r_mask))

    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    in_from_left = [jax.lax.ppermute(x, axis, right_perm) for x in (r_pos, r_vel, r_mask)]
    in_from_right = [jax.lax.ppermute(x, axis, left_perm) for x in (l_pos, l_vel, l_mask)]
    ifl_mask = jnp.where(me == 0, 0.0, in_from_left[2])
    ifr_mask = jnp.where(me == n - 1, 0.0, in_from_right[2])

    # Compact stayers to the front, then fill free slots with immigrants.
    pos_c, vel_c, stay_c = _compact(stay, pos, vel)
    n_stay = jnp.sum(stay_c).astype(jnp.int32)

    imm_pos = jnp.concatenate([in_from_left[0], in_from_right[0]], axis=0)
    imm_vel = jnp.concatenate([in_from_left[1], in_from_right[1]], axis=0)
    imm_mask = jnp.concatenate([ifl_mask, ifr_mask], axis=0)
    imm_pos, imm_vel, imm_mask = _pack_first(imm_mask, 2 * mc, imm_pos, imm_vel)
    n_imm = jnp.sum(imm_mask).astype(jnp.int32)

    cap = pos.shape[0]
    slot = jnp.arange(cap, dtype=jnp.int32)
    imm_slot = slot - n_stay                     # immigrant index per free slot
    can_place = (imm_slot >= 0) & (imm_slot < jnp.minimum(n_imm, 2 * mc))
    safe_slot = jnp.clip(imm_slot, 0, 2 * mc - 1)
    new_pos = jnp.where(can_place[:, None], imm_pos[safe_slot], pos_c)
    new_vel = jnp.where(can_place[:, None], imm_vel[safe_slot], vel_c)
    new_alive = jnp.where(can_place, 1.0, stay_c)
    # Immigrants that didn't fit (capacity full) are lost too.
    lost = lost + jnp.maximum(n_stay + n_imm - cap, 0)
    return new_pos, new_vel, new_alive, dropped + lost


def make_halo_step(mesh, spec: SlabSpec, params: FluidParams, k: int = 64):
    """Build the jitted shard_map'ed WCSPH step over slab-decomposed state."""

    def local_step(pos, vel, alive, dropped):
        halo_pos, halo_vel, halo_mask = _exchange_halos(pos, vel, alive, spec)

        src_pos = jnp.concatenate([pos, halo_pos], axis=0)
        src_vel = jnp.concatenate([vel, halo_vel], axis=0)
        src_live = jnp.concatenate([alive, halo_mask], axis=0)
        # Park dead source slots far outside the domain so they can't be
        # within the kernel radius of anything.
        parked = jnp.where(src_live[:, None] > 0, src_pos, 1e6)
        qpos = jnp.where(alive[:, None] > 0, pos, -1e6)

        nb = brute_force_neighborhood(qpos, parked, params.h, k, self_offset=0)
        rho = F.density_with_self(qpos, nb, params, source_pos=parked)
        pressure = tait_eos(rho, params.d0, params.p0, params.tait_gamma, params.tait_w)
        src_rho = jnp.concatenate([rho, jnp.full((halo_pos.shape[0],), params.d0)], axis=0)
        # Halo pressure: recompute from halo densities is a second exchange;
        # round-1 approximation uses rest density for ghosts' own rho/p terms
        # — asymmetric only within the halo band. TODO(r2): exchange rho.
        src_p = jnp.concatenate([pressure, jnp.zeros((halo_pos.shape[0],))], axis=0)

        visc = params.mu * F.laplacian_force(
            qpos, vel, rho, nb, params,
            source_pos=parked, source_vel=src_vel, source_rho=src_rho)
        f_p = F.pressure_force(
            qpos, rho, pressure, nb, params,
            source_pos=parked, source_rho=src_rho, source_pressure=src_p)
        gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
        force = gravity + f_p + visc

        state = FluidState(pos=pos, vel=vel, force=force,
                           density=rho, pressure=pressure)
        state, diag = semi_implicit_euler(state, params)
        state = box_collide(state, (spec.lo,) * 3, (spec.hi,) * 3)
        # Freeze dead slots
        new_pos = jnp.where(alive[:, None] > 0, state.pos, pos)
        new_vel = jnp.where(alive[:, None] > 0, state.vel, vel)

        new_pos, new_vel, new_alive, new_dropped = _migrate(
            new_pos, new_vel, alive, dropped, spec)
        max_vel = jax.lax.pmax(jax.lax.stop_gradient(diag.max_vel), AXIS)
        new_dropped = jax.lax.psum(new_dropped, AXIS)
        n_live = jax.lax.psum(jnp.sum(new_alive), AXIS)
        return new_pos, new_vel, new_alive, new_dropped / spec.n_dev, (max_vel, n_live)

    sm = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS), (P(), P())),
    )

    @jax.jit
    def step(slabs: SlabState):
        dropped_sh = jnp.broadcast_to(slabs.dropped / spec.n_dev, (spec.n_dev,))
        pos, vel, alive, dropped, (max_vel, n_live) = sm(
            slabs.pos, slabs.vel, slabs.alive, dropped_sh)
        return SlabState(pos=pos, vel=vel, alive=alive,
                         dropped=jnp.sum(dropped)), max_vel, n_live

    return step
