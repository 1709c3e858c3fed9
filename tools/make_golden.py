"""Generate golden-trajectory fixtures for the reference-parity solvers.

Round-1 verdict weak #7: the parity modes (reference_wcsph_step /
reference_pcisph_step) encode the reference's quirks from READING the Go
source, but nothing pinned their output — a refactor could silently change
the parity semantics. These fixtures freeze the trajectories; the regression
test (tests/test_golden.py) replays them on CPU.

Run: python tools/make_golden.py   (writes tests/fixtures/golden_*.npz)
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dieselfluid_tpu.config import FluidParams  # noqa: E402
from dieselfluid_tpu.models.particles import init_lattice_state  # noqa: E402
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood  # noqa: E402
from dieselfluid_tpu.solvers.pcisph import (  # noqa: E402
    ReferencePciState,
    compute_pci_delta,
    reference_pcisph_step,
)
from dieselfluid_tpu.solvers.wcsph import reference_wcsph_step  # noqa: E402

N3 = 8
STEPS = 30
EVERY = 5
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def main():
    os.makedirs(OUT, exist_ok=True)
    params = FluidParams.reference_lattice(N3)
    s0 = init_lattice_state(N3, params)
    nfn = lambda pos: brute_force_neighborhood(pos, pos, params.h, 100)

    # WCSPH parity rollout
    s, frames = s0, []
    for i in range(1, STEPS + 1):
        s, _ = reference_wcsph_step(s, params, neighbor_fn=nfn)
        if i % EVERY == 0:
            frames.append(np.asarray(s.pos))
    np.savez(os.path.join(OUT, "golden_wcsph_ref.npz"),
             pos=np.stack(frames), n3=N3, steps=STEPS, every=EVERY)
    print("wcsph:", np.stack(frames).shape)

    # PCISPH parity rollout (persistent starred buffers included)
    delta = compute_pci_delta(params, 2.0 / N3)
    ps, frames, stars = ReferencePciState.init(s0), [], []
    for i in range(1, STEPS + 1):
        ps, _ = reference_pcisph_step(ps, params, delta, neighbor_fn=nfn)
        if i % EVERY == 0:
            frames.append(np.asarray(ps.fluid.pos))
            stars.append(np.asarray(ps.pos_star))
    np.savez(os.path.join(OUT, "golden_pcisph_ref.npz"),
             pos=np.stack(frames), pos_star=np.stack(stars),
             delta=delta, n3=N3, steps=STEPS, every=EVERY)
    print("pcisph:", np.stack(frames).shape, "delta", delta)


if __name__ == "__main__":
    main()
