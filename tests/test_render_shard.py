"""Tile-sharded differentiable render on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.parallel.render_shard import make_tiled_splat
from dieselfluid_tpu.parallel.sharding import particle_mesh
from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.splat import splat_particles

N_DEV = 8
W, H = 96, 64
RADIUS = 0.05


@pytest.fixture(scope="module")
def setup():
    mesh = particle_mesh(N_DEV)
    cam = Camera.at((0.0, 0.0, -2.5), front=(0.0, 0.0, 1.0),
                    fov_deg=60.0, aspect=W / H)
    key = jax.random.PRNGKey(3)
    pos = jax.random.uniform(key, (256, 3), jnp.float32, -0.6, 0.6)
    return mesh, cam, pos


def test_tiled_image_matches_single_device(setup):
    mesh, cam, pos = setup
    render = make_tiled_splat(mesh, W, H, pos.shape[0])
    tiled = render(pos, RADIUS, cam)
    single = splat_particles(pos, RADIUS, cam, width=W, height=H)
    np.testing.assert_allclose(np.asarray(tiled.color),
                               np.asarray(single.color), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tiled.alpha),
                               np.asarray(single.alpha), atol=1e-5)


def test_tiled_gradients_match_single_device(setup):
    """Pixel-loss gradients psum correctly across image tiles."""
    mesh, cam, pos = setup
    render = make_tiled_splat(mesh, W, H, pos.shape[0])
    target = jnp.zeros((H, W, 3), jnp.float32)

    def loss_tiled(p):
        return jnp.sum((render(p, RADIUS, cam).color - target) ** 2)

    def loss_single(p):
        img = splat_particles(p, RADIUS, cam, width=W, height=H)
        return jnp.sum((img.color - target) ** 2)

    g_t = jax.jit(jax.grad(loss_tiled))(pos)
    g_s = jax.grad(loss_single)(pos)
    scale = float(jnp.abs(g_s).max())
    np.testing.assert_allclose(np.asarray(g_t) / scale,
                               np.asarray(g_s) / scale, atol=1e-5)


def test_sim_to_render_sharded_pipeline(setup):
    """BASELINE config 5 shape: slab-decomposed sim feeds the tiled renderer
    through an in-mesh all_gather; gradients flow back to the (sharded)
    particle state and match the single-device computation."""
    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
    from dieselfluid_tpu.parallel.halo import SlabSpec, distribute, make_halo_step

    mesh, cam, _ = setup
    n3, extent = 8, 0.5
    params = FluidParams.for_spacing((2.0 / n3) * extent)
    s0 = dam_break_state(n3, params, extent=extent)
    params = calibrate_rest_density(s0.pos, params)
    spec = SlabSpec(n_dev=N_DEV, capacity=128, halo_capacity=64,
                    migrate_capacity=32, h=params.h)
    slabs = distribute(s0, spec)
    step = make_halo_step(mesh, spec, params, k=48)
    for _ in range(5):
        slabs, _, _, _ = jax.block_until_ready(step(slabs))

    behind = cam.position - cam.front          # depth < 0 -> zero coverage
    # Materialize to host-committed arrays: the comparison path runs the
    # same data through the single-device renderer.
    slab_pos = jnp.asarray(np.asarray(slabs.pos))
    alive_col = jnp.asarray(np.asarray(slabs.alive))[:, None] > 0
    render = make_tiled_splat(mesh, W, H, slab_pos.shape[0],
                              gather_axis=True)
    target = jnp.zeros((H, W, 3), jnp.float32)

    def loss_tiled(p):
        parked = jnp.where(alive_col, p, behind)
        return jnp.sum((render(parked, RADIUS, cam).color - target) ** 2)

    def loss_single(p):
        parked = jnp.where(alive_col, p, behind)
        img = splat_particles(parked, RADIUS, cam, width=W, height=H)
        return jnp.sum((img.color - target) ** 2)

    l_t = float(jax.jit(loss_tiled)(slab_pos))
    l_s = float(loss_single(slab_pos))
    assert l_t == pytest.approx(l_s, rel=1e-5)
    g_t = jax.jit(jax.grad(loss_tiled))(slab_pos)
    g_s = jax.grad(loss_single)(slab_pos)
    scale = float(jnp.abs(g_s).max())
    assert scale > 0
    np.testing.assert_allclose(np.asarray(g_t) / scale,
                               np.asarray(g_s) / scale, atol=1e-5)
