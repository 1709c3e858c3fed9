"""Texture/normal mapping + depth-composited fluid-in-scene rendering."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.composite import render_composite
from dieselfluid_tpu.render.pbr import PBRMaterial
from dieselfluid_tpu.render.raytrace import render_scene, tangent_frames

W = H = 64


def quad_scene(z=0.5, half=1.2):
    """Two triangles spanning x/y at depth z, facing -z (toward the camera)."""
    v = np.asarray([
        [-half, -half, z], [half, -half, z], [half, half, z],
        [-half, -half, z], [half, half, z], [-half, half, z],
    ], np.float32)
    tris = jnp.asarray(v.reshape(2, 3, 3))
    normals = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    mats = jnp.zeros((2,), jnp.int32)
    uv = np.asarray([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float32)
    return tris, normals, mats, jnp.asarray(uv)


@pytest.fixture(scope="module")
def cam():
    return Camera.at((0.0, 0.0, -2.0), front=(0.0, 0.0, 1.0),
                     fov_deg=60.0, aspect=1.0)


def checker(res=32, n=4):
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    c = (((yy * n // res) + (xx * n // res)) % 2).astype(np.float32)
    return jnp.asarray(np.stack([c, c, c], axis=-1)[None])   # (1, res, res, 3)


def white_material():
    return jax.tree.map(lambda leaf: leaf[None],
                        PBRMaterial.make(base_color=(1.0, 1.0, 1.0),
                                         metallic=0.0, roughness=0.8))


def test_base_color_texture_sampling(cam):
    tris, normals, mats, uvs = quad_scene()
    img = render_scene(
        tris, normals, mats, white_material(), cam,
        jnp.asarray([0.0, 0.0, -3.0]), width=W, height=H,
        tri_uvs=uvs, textures=checker(),
        mat_base_tex=jnp.asarray([0], jnp.int32),
        mat_normal_tex=jnp.asarray([-1], jnp.int32),
    )
    col = np.asarray(img.color)
    assert np.asarray(img.hit)[H // 2, W // 2]
    # Compare two pixels symmetric about the screen center: shading there is
    # symmetric, but they land in adjacent checker cells — only the sampled
    # texture can make them differ.
    c = H // 2
    lum = col.mean(-1)
    assert abs(lum[c, c - 8] - lum[c, c + 8]) > 0.3, "texture not sampled"
    img_flat = render_scene(tris, normals, mats, white_material(), cam,
                            jnp.asarray([0.0, 0.0, -3.0]), width=W, height=H)
    lum_flat = np.asarray(img_flat.color).mean(-1)
    assert abs(lum_flat[c, c - 8] - lum_flat[c, c + 8]) < 0.05


def test_normal_mapping_perturbs_shading(cam):
    tris, normals, mats, uvs = quad_scene()
    light = jnp.asarray([1.5, 1.5, -1.0])
    flat_nm = jnp.full((1, 16, 16, 3), 0.5).at[..., 2].set(1.0)
    # Tilted normal map: constant offset in x
    tilt_nm = jnp.full((1, 16, 16, 3), 0.5).at[..., 0].set(0.9).at[..., 2].set(1.0)

    def render(nm, idx):
        return np.asarray(render_scene(
            tris, normals, mats, white_material(), cam, light,
            width=W, height=H, tri_uvs=uvs, textures=nm,
            mat_base_tex=jnp.asarray([-1], jnp.int32),
            mat_normal_tex=jnp.asarray([idx], jnp.int32)).color)

    base = render(flat_nm, -1)           # mapping disabled
    flat = render(flat_nm, 0)            # flat map: ~= disabled
    tilted = render(tilt_nm, 0)
    np.testing.assert_allclose(flat, base, atol=2e-2)
    assert np.abs(tilted - base).max() > 0.05, "normal map had no effect"


def test_tangent_frames_orthogonal(cam):
    tris, _, _, uvs = quad_scene()
    t, b = tangent_frames(tris, uvs)
    t, b = np.asarray(t), np.asarray(b)
    assert np.abs((t * b).sum(-1)).max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)


class TestComposite:
    def _frame(self, cam, particle_z):
        tris, normals, mats, _ = quad_scene(z=0.5)
        pos = jnp.asarray([[0.0, 0.0, particle_z]])
        return render_composite(
            pos, 0.15, cam, tris, normals, mats, white_material(),
            light_pos=(0.0, 2.0, -2.0), width=W, height=H)

    def test_fluid_in_front_is_visible(self, cam):
        out = self._frame(cam, particle_z=-0.5)     # between camera and wall
        a = np.asarray(out.fluid_alpha)
        assert a[H // 2, W // 2] > 0.5

    def test_fluid_behind_wall_is_occluded(self, cam):
        out = self._frame(cam, particle_z=1.5)      # behind the quad
        a = np.asarray(out.fluid_alpha)
        assert a.max() < 1e-3
        np.testing.assert_allclose(np.asarray(out.color),
                                   np.asarray(out.scene.color), atol=1e-6)

    def test_composite_differentiable_in_pos_and_material(self, cam):
        tris, normals, mats, _ = quad_scene(z=0.5)
        base_mat = white_material()
        light = (0.0, 2.0, -2.0)
        pos0 = jnp.asarray([[0.1, 0.0, -0.4]])
        target = jnp.zeros((H, W, 3), jnp.float32)

        def loss(pos, base_color):
            m = base_mat._replace(base_color=base_color)
            out = render_composite(pos, 0.15, cam, tris, normals, mats, m,
                                   light_pos=light, width=W, height=H)
            return jnp.sum((out.color - target) ** 2)

        gp, gc = jax.grad(loss, argnums=(0, 1))(pos0, base_mat.base_color)
        assert np.isfinite(np.asarray(gp)).all()
        assert float(jnp.abs(gp).max()) > 0, "no gradient to particle position"
        assert np.isfinite(np.asarray(gc)).all()
        assert float(jnp.abs(gc).max()) > 0, "no gradient to material"
