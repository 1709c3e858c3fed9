"""Multi-chip dense pipeline: the Pallas production path under shard_map.

parallel/halo.py distributes the XLA cell-grid solver; this module
distributes the *dense-cell Pallas* solver (ops/cellops.py +
ops/pallas_sph.py) — the path the single-chip benchmarks run — so the
flagship kernels scale over the ICI torus:

  * The domain is split into x-slabs of WHOLE CELL COLUMNS (slab width =
    nxd * h exactly, so every shard's lattice is a window of one global
    lattice — cross-face pair geometry is identical to the single-chip
    binning).
  * The dense layout already carries a one-column ghost ring
    (cellops.DenseCellSpec px = nx + 2). Here the ghost ring is FILLED:
    each shard ppermutes its boundary cell-columns — (py, sub, 128) plane
    slabs per channel — to its neighbors. Halos are regular arrays, not
    packed particle lists: no argsort-packing, no fixed halo capacity, no
    ghost overflow. Edge shards keep zero ghosts (ppermute zero-fills
    destinations nobody addresses).
  * After the density sweep, one more column exchange ships owner-computed
    rho/pressure, so the symmetric force sweep is exact across faces
    (the same two-round protocol as halo.py, at plane granularity).
  * Migration + fixed-capacity particle stores are shared with halo.py
    (SlabState, _migrate); global diagnostics ride pmax/psum.

ref: this is the TPU answer to the reference's single-device GPU solve
(solver/pcisph/pcisph_gpu_darwin.go) — the reference has no multi-device
story at all (SURVEY §2.11).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import FluidState
from dieselfluid_tpu.ops.cellops import (
    DenseCellSpec,
    build_planes,
    dense_indices,
    gather_planes,
)
from dieselfluid_tpu.ops.pallas_sph import density_planes, force_planes
from dieselfluid_tpu.ops.smoothing import KernelCoeffs, tait_eos
from dieselfluid_tpu.parallel.halo import AXIS, SlabState, _migrate
from dieselfluid_tpu.solvers.integrate import box_collide, semi_implicit_euler


@dataclasses.dataclass(frozen=True)
class DenseSlabSpec:
    """Cell-aligned slab decomposition for the dense pipeline.

    The global x-extent is DERIVED: hi_x = lo + n_dev * nxd * cell, so slab
    faces coincide with cell faces on one global lattice.
    """

    n_dev: int
    capacity: int              # particle slots per device
    migrate_capacity: int      # slots per face migration buffer
    cell: float                # cell edge == kernel radius h
    nxd: int                   # x cell columns per device
    lo: float = -1.0
    hi_yz: float = 1.0
    cell_capacity: int = 16

    @staticmethod
    def build(n_dev: int, h: float, capacity: int, migrate_capacity: int,
              lo: float = -1.0, hi: float = 1.0,
              cell_capacity: int = 16) -> "DenseSlabSpec":
        nxd = max(1, int(-(-((hi - lo) / n_dev) // h)))
        return DenseSlabSpec(n_dev=n_dev, capacity=capacity,
                             migrate_capacity=migrate_capacity, cell=float(h),
                             nxd=nxd, lo=lo, hi_yz=hi,
                             cell_capacity=cell_capacity)

    @property
    def slab_width(self) -> float:
        return self.nxd * self.cell

    @property
    def hi_x(self) -> float:
        return self.lo + self.n_dev * self.slab_width

    @property
    def local_spec(self) -> DenseCellSpec:
        """Per-shard dense layout: nxd owned columns (+ ghost ring from the
        base layout) over the full y/z extent, plus a sacrificial z band
        (2 cells of gap + 1 cell) where dead particle slots park without any
        real cell's stencil reaching them."""
        base = DenseCellSpec.for_domain(
            (0.0, self.lo, self.lo),
            (self.slab_width, self.hi_yz, self.hi_yz + 3.0 * self.cell),
            self.cell, capacity=self.cell_capacity)
        return dataclasses.replace(base, nx=self.nxd)

    @property
    def park_z(self) -> float:
        """z that bins into the last (sacrificial) cell layer."""
        return self.hi_yz + 2.5 * self.cell


# ---------------------------------------------------------------------------
# plane-column halo exchange
# ---------------------------------------------------------------------------


def _exchange_ghost_columns(plane, spec: DenseCellSpec, axis=AXIS):
    """Fill the x ghost columns of a local plane from the neighbors' owned
    boundary columns. plane: (rows, sub, 128) with rows = (nx+2) * py.

    Send right-owned column -> right neighbor's low ghost; left-owned
    column -> left neighbor's high ghost. Non-wrapping permutations leave
    edge ghosts zero (ppermute zero-fills unaddressed outputs).
    """
    py = spec.py
    n = jax.lax.axis_size(axis)
    nx = spec.nx
    to_right = [(i, i + 1) for i in range(n - 1)]
    to_left = [(i + 1, i) for i in range(n - 1)]
    from_left = jax.lax.ppermute(plane[nx * py:(nx + 1) * py], axis, to_right)
    from_right = jax.lax.ppermute(plane[py:2 * py], axis, to_left)
    return jnp.concatenate(
        [from_left, plane[py:(nx + 1) * py], from_right], axis=0)


def _exchange_all(planes: dict, spec: DenseCellSpec, names, axis=AXIS):
    return {n: (_exchange_ghost_columns(planes[n], spec, axis)
                if n in names else planes[n])
            for n in planes}


# ---------------------------------------------------------------------------
# the sharded WCSPH step
# ---------------------------------------------------------------------------


def make_dense_halo_wcsph_step(mesh, spec: DenseSlabSpec, params: FluidParams):
    """Jitted shard_map'ed WCSPH step over slab state, on the Pallas dense
    kernels with plane-column halo exchange. Returns step(SlabState) ->
    (SlabState, max_vel, n_live) like halo.make_halo_step.
    """
    lspec = spec.local_spec
    k = KernelCoeffs.build(params.h)
    d0, gamma, w = params.d0, params.tait_gamma, params.tait_w

    def local_step(pos, vel, alive, dropped):
        me = jax.lax.axis_index(AXIS)
        x0 = spec.lo + spec.slab_width * me.astype(jnp.float32)

        # Local coordinates; dead slots park in the sacrificial z band.
        local = pos - jnp.stack([x0, 0.0, 0.0])
        live = alive > 0
        lpos = jnp.where(live[:, None], local,
                         jnp.asarray([0.5 * spec.slab_width, 0.0,
                                      spec.park_z]))
        flat, valid, _ = dense_indices(lpos, lspec)
        overflow = jnp.sum((~valid) & live)    # parked slots overflow freely
        valid = valid & live

        planes = build_planes(
            {"x": lpos[:, 0], "y": lpos[:, 1], "z": lpos[:, 2],
             "vx": vel[:, 0], "vy": vel[:, 1], "vz": vel[:, 2]},
            flat, valid, lspec)
        # Ghost ring: neighbors' boundary columns. x is LOCAL per shard —
        # shift received columns by +-slab_width so distances stay global.
        planes = _exchange_all(planes, lspec,
                               ("x", "y", "z", "vx", "vy", "vz", "mask"))
        py, sw = lspec.py, spec.slab_width
        ghost_mask_lo = planes["mask"][:py]
        ghost_mask_hi = planes["mask"][(lspec.nx + 1) * py:]
        planes["x"] = jnp.concatenate([
            planes["x"][:py] - jnp.where(ghost_mask_lo > 0, sw, 0.0),
            planes["x"][py:(lspec.nx + 1) * py],
            planes["x"][(lspec.nx + 1) * py:]
            + jnp.where(ghost_mask_hi > 0, sw, 0.0),
        ], axis=0)

        rho_plane = density_planes(planes, lspec, k, params.mass)
        press_plane = jnp.where(planes["mask"] > 0,
                                tait_eos(rho_plane, d0, params.p0, gamma, w),
                                0.0)
        # Owner-computed rho/pressure for the ghost columns (round 2).
        rho_plane = _exchange_ghost_columns(rho_plane, lspec)
        press_plane = _exchange_ghost_columns(press_plane, lspec)

        fx, fy, fz = force_planes(planes, rho_plane, press_plane, lspec, k,
                                  params.mass, float(params.mu))
        vals = gather_planes([rho_plane, press_plane, fx, fy, fz], flat)
        rho = jnp.where(valid, vals[:, 0], d0)
        pressure = jnp.where(valid, vals[:, 1], 0.0)
        f = jnp.where(valid[:, None], vals[:, 2:5], 0.0)
        gravity = jnp.asarray(params.gravity, jnp.float32) * params.mass
        force = gravity + f

        state = FluidState(pos=pos, vel=vel, force=force, density=rho,
                           pressure=pressure)
        state, diag = semi_implicit_euler(state, params)
        state = box_collide(state, (spec.lo,) * 3,
                            (spec.hi_x, spec.hi_yz, spec.hi_yz))
        new_pos = jnp.where(live[:, None], state.pos, pos)
        new_vel = jnp.where(live[:, None], state.vel, vel)

        # Migration over slab faces (shared with the cell-grid halo path).
        # `dropped` counts particles permanently LOST (migration-buffer /
        # store overflow); transient cell-capacity overflow is a separate
        # per-step diagnostic (interactions under-resolved, nothing lost).
        slab = _SlabView(spec)
        new_pos, new_vel, new_alive, new_dropped = _migrate(
            new_pos, new_vel, alive, dropped, slab)
        max_vel = jax.lax.pmax(jax.lax.stop_gradient(diag.max_vel), AXIS)
        new_dropped = jax.lax.psum(new_dropped, AXIS)
        n_live = jax.lax.psum(jnp.sum(new_alive), AXIS)
        overflow = jax.lax.psum(overflow, AXIS)
        return (new_pos, new_vel, new_alive, new_dropped / spec.n_dev,
                (max_vel, n_live, overflow))

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the vma checker rejects any kernel launch inside
    # shard_map (jax 0.8 pallas_call.py:1196).
    sm = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                   (P(), P(), P())),
        check_vma=False,
    )

    @jax.jit
    def step(slabs: SlabState):
        """-> (slabs, max_vel, n_live, cell_overflow). dropped (in slabs)
        = particles lost; cell_overflow = under-resolved this step."""
        dropped_sh = jnp.broadcast_to(slabs.dropped / spec.n_dev,
                                      (spec.n_dev,))
        pos, vel, alive, dropped, (max_vel, n_live, overflow) = sm(
            slabs.pos, slabs.vel, slabs.alive, dropped_sh)
        return SlabState(pos=pos, vel=vel, alive=alive,
                         dropped=jnp.sum(dropped)), max_vel, n_live, overflow

    return step


class _SlabView:
    """Adapter giving halo._migrate the SlabSpec surface it expects."""

    def __init__(self, spec: DenseSlabSpec):
        self.lo = spec.lo
        self.slab_width = spec.slab_width
        self.migrate_capacity = spec.migrate_capacity


def distribute_dense(state: FluidState, spec: DenseSlabSpec) -> SlabState:
    """Host-side: bin a global FluidState into the dense slab layout."""
    from dieselfluid_tpu.parallel.halo import SlabSpec, distribute

    view = SlabSpec(n_dev=spec.n_dev, capacity=spec.capacity,
                    halo_capacity=1, migrate_capacity=spec.migrate_capacity,
                    lo=spec.lo, hi=spec.hi_x, h=spec.cell)
    return distribute(state, view)
