"""Tile-sharded differentiable rendering over the device mesh.

BASELINE config 5's render half: the image's rows are sharded over the mesh
axis; every device rasterizes the full (replicated or all-gathered) particle
set into its own row tile with render/splat.py in tile mode, and a pixel loss
reduces with psum. Because the weighted-blended OIT composite is a pure
per-pixel function of per-tile scatters, tiles need no cross-device blending
pass — the sharded image IS the single-device image, and shard_map's
transpose psums the position/color gradients automatically.

The reference's analog is the single-GPU GL framebuffer (ref: render/glr/
glr_darwin.go Draw + SwapBuffers); there is no multi-device rendering in the
reference at all — this is capability the TPU build adds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.splat import SplatImage, splat_particles

AXIS = "sp"


def make_tiled_splat(mesh, width: int, height: int, n_particles: int,
                     patch: int = 9, axis: str = AXIS, gather_axis: bool = False,
                     **splat_kw):
    """Build a jitted tile-sharded splat renderer.

    Returns render(pos, radius, cam, colors=None) -> SplatImage whose arrays
    are row-sharded over `axis`. With gather_axis=True, `pos` (and `colors`)
    are particle-sharded over `axis` and all-gathered inside the shard_map
    (the sim->render handoff: slab-decomposed solver output feeds straight
    into the tiled renderer); otherwise they are replicated.
    """
    n_dev = mesh.shape[axis]
    assert height % n_dev == 0, (height, n_dev)
    tile_h = height // n_dev

    def local(pos, radius, cam, colors):
        if gather_axis:
            pos = jax.lax.all_gather(pos, axis, tiled=True)
            if colors is not None:
                colors = jax.lax.all_gather(colors, axis, tiled=True)
        me = jax.lax.axis_index(axis)
        img = splat_particles(
            pos, radius, cam, width=width, height=tile_h, colors=colors,
            patch=patch, full_height=height, y_offset=me * tile_h, **splat_kw)
        return img

    part = P(axis, None) if gather_axis else P()
    in_specs = (part, P(), P(), part if gather_axis else P())
    out_specs = SplatImage(color=P(axis, None, None), alpha=P(axis, None),
                           depth=P(axis, None))
    sm = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs)

    def render(pos, radius, cam: Camera, colors: Optional[jnp.ndarray] = None):
        return sm(pos, jnp.asarray(radius, jnp.float32), cam, colors)

    return render


