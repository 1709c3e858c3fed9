"""GLTF round-trip, scene loading, textures, cubemaps, sky, ray renderer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.geometry.mesh import box
from dieselfluid_tpu.render.cubemap import cubemap_directions, sample_cubemap
from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.gltf import GLTF, make_gltf
from dieselfluid_tpu.render.pbr import PBRMaterial
from dieselfluid_tpu.render.raytrace import ray_triangle, render_scene, stack_materials
from dieselfluid_tpu.render.scene import Scene
from dieselfluid_tpu.render.texture import TexLibrary, sample_bilinear
from dieselfluid_tpu.sky.atmosphere import (
    compute_atmosphere,
    reference_sun_direction,
    scatter_rgb,
    sun_direction,
)
from dieselfluid_tpu.sky.bake import bake_sky_cubemap, tone_map


@pytest.fixture(scope="module")
def cube_gltf(tmp_path_factory):
    """Author a cube GLTF from our procedural box, write + reload it."""
    d = tmp_path_factory.mktemp("gltf")
    b = box(2.0, 2.0, 2.0)
    verts = np.asarray(b.tris).reshape(-1, 3)
    idx = np.arange(len(verts), dtype=np.uint32)
    normals = np.repeat(np.asarray(b.normals), 3, axis=0)
    mat = {"name": "steel", "pbrMetallicRoughness": {
        "baseColorFactor": [0.6, 0.5, 0.4, 1.0],
        "metallicFactor": 0.8, "roughnessFactor": 0.35}}
    g = make_gltf(verts, idx, normals, material=mat)
    path = os.path.join(d, "cube.gltf")
    g.save(path)
    return path


class TestGLTF:
    def test_roundtrip(self, cube_gltf):
        g = GLTF.load(cube_gltf)
        assert len(g.meshes) == 1
        arrays = g.primitive_arrays(0)
        assert arrays["POSITION"].shape == (36, 3)
        assert arrays["NORMAL"].shape == (36, 3)
        assert arrays["indices"].shape == (36,)
        assert arrays["material"] == 0
        assert g.materials[0]["pbrMetallicRoughness"]["metallicFactor"] == 0.8

    def test_accessor_dtypes(self, cube_gltf):
        g = GLTF.load(cube_gltf)
        pos = g.accessor_array(0)
        assert pos.dtype == np.float32
        idx = g.accessor_array(1)
        assert idx.dtype == np.uint32

    def test_node_trs_matrix(self):
        g = make_gltf(np.zeros((3, 3), np.float32), np.arange(3, dtype=np.uint32))
        m = g.node_local_matrix({"translation": [1, 2, 3], "scale": [2, 2, 2]})
        p = m @ np.asarray([1.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(p[:3], [3, 2, 3], atol=1e-6)


class TestScene:
    def test_load_and_flatten(self, cube_gltf):
        sc = Scene.load(cube_gltf)
        assert len(sc.meshes) == 1
        tris, norms, mats = sc.triangle_soup()
        assert tris.shape == (12, 3, 3)
        assert norms.shape == (12, 3)
        assert int(mats[0]) == 0
        m = sc.material(0)
        assert float(m.metallic) == pytest.approx(0.8)

    def test_default_material_fallback(self, cube_gltf):
        sc = Scene.load(cube_gltf)
        m = sc.material(None)
        assert float(m.roughness) == pytest.approx(0.5)


class TestTexture:
    def test_bilinear_interpolation(self):
        tex = jnp.asarray([[[0.0], [1.0]], [[0.0], [1.0]]])  # 2x2, 1 channel
        v = sample_bilinear(tex, jnp.asarray([[0.5, 0.5]]), wrap="clamp")
        assert float(v[0, 0]) == pytest.approx(0.5, abs=1e-5)

    def test_library_roundtrip(self, tmp_path):
        import imageio.v2 as imageio

        img = (np.random.default_rng(0).uniform(0, 1, (8, 8, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "t.png")
        imageio.imwrite(p, img)
        lib = TexLibrary()
        arr = lib.load(p, "t")
        assert arr.shape == (8, 8, 3)
        np.testing.assert_allclose(np.asarray(arr), img / 255.0, atol=1 / 255.0)
        lib.remove("t")
        assert "t" not in lib.textures

    def test_sample_gradient(self):
        tex = jnp.linspace(0, 1, 16).reshape(4, 4, 1)
        g = jax.grad(lambda uv: jnp.sum(sample_bilinear(tex, uv)))(
            jnp.asarray([[0.4, 0.6]])
        )
        assert bool(jnp.all(jnp.isfinite(g)))


class TestCubemap:
    def test_face_centers_roundtrip(self):
        cube = jnp.stack([jnp.full((8, 8, 3), i / 5.0) for i in range(6)])
        d = cubemap_directions(8)
        for f in range(6):
            v = sample_cubemap(cube, d[f, 4, 4])
            assert float(v[0]) == pytest.approx(f / 5.0, abs=1e-5)


class TestSky:
    SUN = sun_direction(0.3, 0.9)

    def test_zenith_is_blue(self):
        rgb = np.asarray(scatter_rgb(jnp.asarray([[0.0, 0.0, 1.0]]), self.SUN))[0]
        assert rgb[2] > rgb[0]  # blue > red: Rayleigh

    def test_low_elevation_brighter_than_zenith(self):
        # The reference's saturating Ease spacing makes exact-horizon rays
        # collapse to the shell-exit sample (dark); mid-low elevations are
        # brighter than the zenith (longer path, more in-scatter).
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.7, 0.0, 0.714]])
        rgb = np.asarray(scatter_rgb(d, self.SUN))
        assert rgb[1].sum() > rgb[0].sum()

    def test_below_horizon_black(self):
        rgb = np.asarray(scatter_rgb(jnp.asarray([[0.0, 0.0, -1.0]]), self.SUN))[0]
        np.testing.assert_allclose(rgb, 0.0)

    def test_reference_sun_direction_is_unit(self):
        d = np.asarray(reference_sun_direction())
        assert np.linalg.norm(d) == pytest.approx(1.0, abs=1e-5)

    def test_bake_small_texture(self):
        img = compute_atmosphere(self.SUN, 32, 32, chunk=512)
        assert img.shape == (32, 32, 3)
        assert bool(jnp.all(jnp.isfinite(img)))
        assert float(img.max()) > 0

    def test_tone_map_branches(self):
        lo = float(tone_map(jnp.asarray(0.5)))
        assert lo == pytest.approx(np.log(1.5), abs=1e-5)
        hi = float(tone_map(jnp.asarray(3.0)))
        assert hi == pytest.approx(1.0 / (1.0 + np.exp(-3.0 * 0.5 - 1.0)), abs=1e-5)

    def test_sky_cubemap_upper_faces_lit(self):
        cube = bake_sky_cubemap(self.SUN, size=8)
        assert cube.shape == (6, 8, 8, 3)
        up = float(cube[2].mean())       # +Y face... z-up: +Z face is index 4
        pz = float(cube[4].mean())
        nz = float(cube[5].mean())
        assert pz > nz                   # sky above, dark below

    def test_differentiable_in_sun(self):
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        g = jax.grad(lambda s: jnp.sum(scatter_rgb(d, s)))(self.SUN)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestRaytrace:
    def test_ray_triangle_hit(self):
        tris = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
        o = jnp.asarray([[0.2, 0.2, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        t, hit, u, v = ray_triangle(o, d, tris)
        assert bool(hit[0, 0])
        assert float(t[0, 0]) == pytest.approx(1.0, abs=1e-5)
        # Barycentric interpolation coords of vertices 1/2 at the hit point
        assert float(u[0, 0]) == pytest.approx(0.2, abs=1e-5)
        assert float(v[0, 0]) == pytest.approx(0.2, abs=1e-5)

    def test_render_cube_scene(self, cube_gltf):
        sc = Scene.load(cube_gltf)
        tris, norms, mats = sc.triangle_soup()
        materials = stack_materials([sc.material(0)])
        cam = Camera.at([0.0, 0.5, -4.0], front=[0.0, -0.1, 1.0], aspect=1.0)
        img = render_scene(tris, norms, mats, materials, cam,
                           light_pos=jnp.asarray([2.0, 3.0, -2.0]),
                           width=64, height=64, tile=1024)
        assert img.color.shape == (64, 64, 3)
        assert bool(img.hit.any())            # cube visible
        assert bool(jnp.all(jnp.isfinite(img.color)))
        # hit pixels differ from background
        assert float(img.color[np.asarray(img.hit)].mean()) != pytest.approx(0.1, abs=1e-3)

    def test_material_gradients_through_render(self, cube_gltf):
        sc = Scene.load(cube_gltf)
        tris, norms, mats = sc.triangle_soup()
        cam = Camera.at([0.0, 0.5, -4.0], front=[0.0, -0.1, 1.0], aspect=1.0)

        def loss(rough):
            m = stack_materials([PBRMaterial.make(roughness=rough, metallic=0.8)])
            img = render_scene(tris, norms, mats, m, cam,
                               light_pos=jnp.asarray([2.0, 3.0, -2.0]),
                               width=32, height=32, tile=1024)
            return jnp.mean(img.color)

        g = float(jax.grad(loss)(0.35))
        assert np.isfinite(g) and g != 0.0


class TestAnimation:
    """GLTF animation playback (the schema the reference parses but never
    plays, ref: gltf/gltf.go:258-312)."""

    @pytest.fixture(scope="class")
    def animated(self):
        times = np.asarray([0.0, 1.0, 2.0], np.float32)
        trans = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
        rott = np.asarray([0.0, 1.0], np.float32)
        s = np.sin(np.pi / 4)
        rots = np.asarray([[0, 0, 0, 1], [0, 0, s, np.cos(np.pi / 4)]],
                          np.float32)                   # identity -> 90deg z
        scls = np.asarray([[1, 1, 1], [2, 2, 2]], np.float32)
        buf = (times.tobytes() + trans.tobytes() + rott.tobytes()
               + rots.tobytes() + scls.tobytes())
        offs = np.cumsum([0, times.nbytes, trans.nbytes, rott.nbytes,
                          rots.nbytes])
        doc = {
            "asset": {"version": "2.0"},
            "nodes": [{"translation": [5, 0, 0]}],
            "buffers": [{"byteLength": len(buf)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": int(o), "byteLength": int(n)}
                for o, n in zip(offs, [times.nbytes, trans.nbytes,
                                       rott.nbytes, rots.nbytes, scls.nbytes])
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "SCALAR"},
                {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 2, "componentType": 5126, "count": 2, "type": "SCALAR"},
                {"bufferView": 3, "componentType": 5126, "count": 2, "type": "VEC4"},
                {"bufferView": 4, "componentType": 5126, "count": 2, "type": "VEC3"},
            ],
            "animations": [{
                "channels": [
                    {"sampler": 0, "target": {"node": 0, "path": "translation"}},
                    {"sampler": 1, "target": {"node": 0, "path": "rotation"}},
                    {"sampler": 2, "target": {"node": 0, "path": "scale"}},
                ],
                "samplers": [
                    {"input": 0, "output": 1, "interpolation": "LINEAR"},
                    {"input": 2, "output": 3, "interpolation": "LINEAR"},
                    {"input": 2, "output": 4, "interpolation": "STEP"},
                ],
            }],
        }
        return GLTF(doc, [buf])

    def test_linear_translation(self, animated):
        v = animated.sample_animation(0, 0.5)[0]["translation"]
        np.testing.assert_allclose(v, [0.5, 0, 0], atol=1e-6)
        v = animated.sample_animation(0, 1.5)[0]["translation"]
        np.testing.assert_allclose(v, [1.0, 0.5, 0], atol=1e-6)
        # Clamps outside the input range.
        v = animated.sample_animation(0, 99.0)[0]["translation"]
        np.testing.assert_allclose(v, [1, 1, 0], atol=1e-6)

    def test_slerp_rotation_half_angle(self, animated):
        v = animated.sample_animation(0, 0.5)[0]["rotation"]
        s = np.sin(np.pi / 8)
        np.testing.assert_allclose(v, [0, 0, s, np.cos(np.pi / 8)], atol=1e-6)

    def test_step_scale(self, animated):
        assert np.allclose(
            animated.sample_animation(0, 0.99)[0]["scale"], [1, 1, 1])
        assert np.allclose(
            animated.sample_animation(0, 1.0)[0]["scale"], [2, 2, 2])

    def test_node_matrix_at_time(self, animated):
        # At t=1: translation [1,0,0] overrides the node's static [5,0,0];
        # rotation 90deg about z maps x->y; scale STEP = 2.
        m = animated.node_local_matrix_at(0, 0, 1.0)
        p = m @ np.asarray([1.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(p[:3], [1, 2, 0], atol=1e-5)

    def test_cubicspline_matches_hermite(self):
        times = np.asarray([0.0, 1.0], np.float32)
        # (in-tangent, value, out-tangent) per key, one float channel
        vals = np.asarray([[0, 0, 1], [1, 2, 0]], np.float32).reshape(2, 3, 1)
        buf = times.tobytes() + vals.tobytes()
        doc = {
            "asset": {"version": "2.0"}, "nodes": [{}],
            "buffers": [{"byteLength": len(buf)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": times.nbytes},
                {"buffer": 0, "byteOffset": times.nbytes,
                 "byteLength": vals.nbytes}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 2,
                 "type": "SCALAR"},
                {"bufferView": 1, "componentType": 5126, "count": 6,
                 "type": "SCALAR"}],
            "animations": [{
                "channels": [{"sampler": 0,
                              "target": {"node": 0, "path": "weights"}}],
                "samplers": [{"input": 0, "output": 1,
                              "interpolation": "CUBICSPLINE"}]}],
        }
        g = GLTF(doc, [buf])
        a = 0.25
        p0, m0, p1, m1 = 0.0, 1.0, 2.0, 1.0
        want = ((2 * a**3 - 3 * a**2 + 1) * p0 + (a**3 - 2 * a**2 + a) * m0
                + (-2 * a**3 + 3 * a**2) * p1 + (a**3 - a**2) * m1)
        got = g.sample_animation(0, a)[0]["weights"]
        np.testing.assert_allclose(got, [want], atol=1e-6)

    def test_scene_flatten_at_time(self, animated, tmp_path):
        """Scene.load(at_time=...) flattens with animated node transforms."""
        import copy
        doc = copy.deepcopy(animated.doc)
        # Give node 0 a triangle mesh so the flatten produces geometry.
        tri = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        extra = tri.tobytes()
        base = doc["buffers"][0]["byteLength"]
        doc["buffers"][0]["byteLength"] = base + len(extra)
        doc["bufferViews"].append(
            {"buffer": 0, "byteOffset": base, "byteLength": len(extra)})
        doc["accessors"].append(
            {"bufferView": len(doc["bufferViews"]) - 1, "componentType": 5126,
             "count": 3, "type": "VEC3",
             "min": tri.min(0).tolist(), "max": tri.max(0).tolist()})
        doc["meshes"] = [{"primitives": [
            {"attributes": {"POSITION": len(doc["accessors"]) - 1}}]}]
        doc["nodes"][0]["mesh"] = 0
        doc["scenes"] = [{"nodes": [0]}]
        doc["scene"] = 0
        buf = animated.buffers[0] + extra
        g2 = GLTF(doc, [buf])
        p = os.path.join(tmp_path, "anim.gltf")
        g2.save(p)

        from dieselfluid_tpu.render.scene import Scene

        static = Scene.load(p)                    # static TRS: [5, 0, 0]
        np.testing.assert_allclose(static.meshes[0].positions[0], [5, 0, 0],
                                   atol=1e-5)
        # t=1: translation [1,0,0], rotation 90deg z (x->y), scale 2.
        moved = Scene.load(p, at_time=1.0)
        np.testing.assert_allclose(moved.meshes[0].positions[1], [1, 2, 0],
                                   atol=1e-5)
