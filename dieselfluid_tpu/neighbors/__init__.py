"""Neighbor search: fixed-degree neighborhoods from brute force, cell grids, or LSH."""

from dieselfluid_tpu.neighbors.types import Neighborhood  # noqa: F401
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood  # noqa: F401
