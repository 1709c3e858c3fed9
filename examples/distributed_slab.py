"""Multi-chip dense PCISPH over an 8-device mesh (virtual CPU or real TPUs).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/distributed_slab.py

Slab domain decomposition with plane-column halo exchange on the Pallas
pipeline, guarded stepping with rollback, per-slab load diagnostics, and a
sharded checkpoint — the production multi-chip recipe in ~50 lines.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

try:
    _on_tpu = jax.default_backend() == "tpu"
except RuntimeError:            # e.g. an unregistered platform in env
    _on_tpu = False
if not _on_tpu:
    jax.config.update("jax_platforms", "cpu")

from contextlib import nullcontext

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.io.checkpoint import load_slab_checkpoint, save_slab_checkpoint
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
from dieselfluid_tpu.parallel.dense_halo import (
    DenseSlabSpec,
    distribute_dense,
    make_dense_halo_pcisph_step,
)
from dieselfluid_tpu.parallel.sharding import particle_mesh
from dieselfluid_tpu.solvers.pcisph import compute_pci_delta

n_dev = len(jax.devices())
n3, extent = 8, 0.5   # demo scale: CPU interpret mode is slow; real TPUs fly
dx = (2.0 / n3) * extent
params = FluidParams.for_spacing(dx)
state = dam_break_state(n3, params, extent=extent)
params = calibrate_rest_density(state.pos, params)
delta = compute_pci_delta(params, dx)

mesh = particle_mesh(n_dev)
spec = DenseSlabSpec.build(n_dev, params.h, capacity=512,
                           migrate_capacity=128, cell_capacity=32)
slabs = distribute_dense(state, spec)
step = make_dense_halo_pcisph_step(mesh, spec, params, delta, warm_start=True)

interp = (nullcontext if jax.default_backend() == "tpu"
          else pltpu.force_tpu_interpret_mode)
with interp():
    for frame in range(4):
        slabs, max_vel, n_live, ovf, per_slab = step(slabs)
        jax.block_until_ready(slabs.pos)   # required on CPU-emulated meshes
        if frame % 2 == 0:
            occ = np.asarray(per_slab).astype(int)
            print(f"frame {frame}: n_live={int(n_live)} max|v|={float(max_vel):.3f} "
                  f"overflow={int(ovf)} per-slab={occ.tolist()} "
                  f"imbalance={occ.max() / max(occ.mean(), 1):.2f}")

save_slab_checkpoint("out/slab_ckpt", slabs, 4, params)
restored, frame, _ = load_slab_checkpoint("out/slab_ckpt")
assert frame == 4 and float(np.abs(
    np.asarray(restored.pos) - np.asarray(slabs.pos)).max()) < 1e-6
print("checkpoint round-trip OK — resume with the same step function")
