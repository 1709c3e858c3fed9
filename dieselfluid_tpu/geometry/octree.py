"""Octal-tree point classifier: vectorized octant-path encoding.

ref: geom/octal.go — the reference encodes each point as a depth*3 uint8
octant path (one x/y/z bit triplet per level) into a string-keyed map. Here
the encoding is a (N, depth, 3) uint8 array computed for all points at once
(one fused XLA program), with the same semantics: bit=1 when the coordinate
exceeds the running centroid, centroid shifts by +-bounds/2 each level.
A host-side dict classifier (OctalTree) mirrors the reference's map API.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def encode_points(points, bounds, origin=(0.0, 0.0, 0.0), depth: int = 6):
    """(N, depth, 3) uint8 octant paths. ref: octal.go EncodePoint:82-113.

    Note the reference halves the bounds *before* the first centroid shift is
    applied for the next level but uses the full bounds for level 0's shift —
    matched here by scaling the shift by bounds / 2^level.
    """
    points = jnp.asarray(points, jnp.float32)
    bounds = jnp.asarray(bounds, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)

    def level(carry, i):
        centroid = carry
        bit = points > centroid                       # (N, 3)
        shift = (bounds / (2.0 ** (i + 1.0)))[None, :] * 2.0  # full bounds at level 0
        centroid = centroid + jnp.where(bit, 0.5, -0.5) * shift
        return centroid, bit.astype(jnp.uint8)

    init = jnp.broadcast_to(origin, points.shape)
    _, bits = jax.lax.scan(level, init, jnp.arange(depth, dtype=jnp.float32))
    return jnp.moveaxis(bits, 0, 1)                   # (N, depth, 3)


def depth_similarity(a, b) -> int:
    """Shared-prefix depth of two encodings. ref: octal.go DepthSimilarity:157-186."""
    a = np.asarray(a).reshape(-1, 3)
    b = np.asarray(b).reshape(-1, 3)
    d = min(len(a), len(b))
    for i in range(d):
        if not np.array_equal(a[i], b[i]):
            return i
    return d


def group_encoding(encodings) -> np.ndarray:
    """Longest common octant prefix of a point group (+ first dissimilar level).

    ref: octal.go EncodePointGroup:115-155 — the reference always emits at
    least the first non-similar triplet using the first point's bits.
    """
    enc = np.asarray(encodings)
    n, depth, _ = enc.shape
    out_depth = 0
    for i in range(depth):
        if np.all(enc[:, i, :] == enc[0, i, :]):
            out_depth = i + 1
        else:
            break
    return enc[0, :out_depth, :]


def centroid_of(encoding, bounds, origin=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Decode an octant path to its cell centroid. ref: octal.go GetCentroid:24-40."""
    c = np.asarray(origin, np.float64).copy()
    b = np.asarray(bounds, np.float64).copy()
    for bit in np.asarray(encoding).reshape(-1, 3):
        c += (bit.astype(np.float64) - 0.5) * b
        b /= 2.0
    return c.astype(np.float32)


@dataclasses.dataclass
class OctalTree:
    """Host-side classifier mirroring the reference's map API.

    ref: octal.go OctalTree{Bounds, Origin, MaxDepth, Map}. Keys are byte
    tuples of the flattened path.
    """

    bounds: Tuple[float, float, float]
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    max_depth: int = 6

    def __post_init__(self):
        self.table: Dict[bytes, List[int]] = {}

    def _key(self, encoding) -> bytes:
        return bytes(np.asarray(encoding, np.uint8).ravel().tolist())

    def insert_points(self, points, ids=None):
        """Batch insert: encode all points on device, bin on host."""
        enc = np.asarray(encode_points(points, self.bounds, self.origin, self.max_depth))
        ids = range(len(enc)) if ids is None else ids
        for e, i in zip(enc, ids):
            self.table.setdefault(self._key(e), []).append(int(i))

    def remove_point(self, encoding, unique_id: int):
        key = self._key(encoding)
        lst = self.table.get(key, [])
        if unique_id in lst:
            lst.remove(unique_id)

    def parent_key(self, encoding) -> bytes:
        e = np.asarray(encoding, np.uint8).reshape(-1, 3)
        return self._key(e[:-1]) if len(e) >= 1 else self._key(e)

    def neighbors(self, encoding) -> List[int]:
        """Cell-mates + parent-cell-mates. ref: octal.go GetNeighbors:52-57."""
        return list(self.table.get(self._key(encoding), [])) + list(
            self.table.get(self.parent_key(encoding), [])
        )
