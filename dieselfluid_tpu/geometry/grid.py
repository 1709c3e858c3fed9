"""Structured IJK lattice grid (ref: geom/grid/point-grid.go).

Used to initialize particle lattices (AlignWithGrid analog) and as the template
grid for the PCISPH delta computation. Pure-Python construction, jnp position
generation — the whole lattice is produced as one (N,3) array instead of the
reference's triple loop (ref: model/field/sph_field.go:87-106).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """IJK lattice: origin-translated, scaled unit cube split into divisions.

    ref: geom/grid/point-grid.go Grid{Div, origin, scale, min_bounds, step}.
    """

    div: Tuple[int, int, int]
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @property
    def min_bounds(self) -> np.ndarray:
        # ref: BuildGrid — min = origin - scale
        return np.asarray(self.origin, np.float32) - np.asarray(self.scale, np.float32)

    @property
    def step(self) -> np.ndarray:
        # ref: BuildKernGrid — step = -2*min_bounds_unit / div = 2*scale/div
        return 2.0 * np.asarray(self.scale, np.float32) / np.asarray(self.div, np.float32)

    def volume(self) -> float:
        # ref: Grid.Volume — (2sx)(2sy)(2sz)
        s = np.asarray(self.scale, np.float32)
        return float(8.0 * s[0] * s[1] * s[2])

    def index(self, i, j, k) -> int:
        """3D -> 1D flattening. ref: Grid.Index — k + Div0*(i*Div1 + j)."""
        return k + self.div[0] * (i * self.div[1] + j)

    def positions(self) -> jnp.ndarray:
        """All lattice positions as (prod(div), 3), ordered by self.index.

        ref: Grid.GridPosition(i,j,k) = min_bounds + step*(i,j,k), enumerated by
        AlignWithGrid's i/j/k loops with id = Index(i,j,k) = k + Div0*(i*Div1+j).
        For cubic grids this means the linear id enumerates (i, j, k) with k
        fastest — identical to a C-order meshgrid over (i, j, k).
        """
        nx, ny, nz = self.div
        ii, jj, kk = jnp.meshgrid(
            jnp.arange(nx, dtype=jnp.float32),
            jnp.arange(ny, dtype=jnp.float32),
            jnp.arange(nz, dtype=jnp.float32),
            indexing="ij",
        )
        ijk = jnp.stack([ii.ravel(), jj.ravel(), kk.ravel()], axis=-1)
        return jnp.asarray(self.min_bounds) + ijk * jnp.asarray(self.step)


def kern_grid(n3: int, origin=(0.0, 0.0, 0.0)) -> Grid:
    """Kernel-spaced cubic grid over [-1,1]^3+origin. ref: BuildKernGrid via sph.Init."""
    return Grid(div=(n3, n3, n3), origin=tuple(origin), scale=(1.0, 1.0, 1.0))
