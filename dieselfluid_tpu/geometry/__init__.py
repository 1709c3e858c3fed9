"""Geometry: structured grids, triangles, meshes, octree encoding, colliders."""

from dieselfluid_tpu.geometry.grid import Grid  # noqa: F401
