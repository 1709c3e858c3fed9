"""The fixed-degree neighborhood structure every sampler produces.

The reference's sampler abstraction (ref: sampler/sampler.go:4-18) hands each
particle a variable-length list of candidate indices (LSH buckets truncated at
100-150 samples, ref: sampler/lsh/lsh.go:136-181, pcisph.h:172). Under XLA we
need static shapes, so every neighbor provider emits an (N, K) index table plus
a validity mask — the principled version of the reference's fixed sample cap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Neighborhood(NamedTuple):
    """Fixed-degree neighbor lists for N query particles.

    idx:  (N, K) int32 — indices into the source position array. Invalid slots
          hold an arbitrary in-range index (masked out downstream).
    mask: (N, K) float32 {0,1} — 1 where the slot holds a real neighbor
          (within the kernel radius, not the query particle itself).
    """

    idx: jnp.ndarray
    mask: jnp.ndarray

    @property
    def k(self) -> int:
        return self.idx.shape[-1]

    def gather(self, values: jnp.ndarray) -> jnp.ndarray:
        """Gather per-source values to (N, K, ...) slots."""
        return values[self.idx]
