"""Triangle / mesh / octree geometry tests (ref: geom/octal_test.go spirit)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.geometry import mesh as M, octree as O, triangle as T
from dieselfluid_tpu.models.particles import zero_state


class TestTriangle:
    TRI = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])

    def test_normal(self):
        n = T.normal(self.TRI)
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)

    def test_barycentric_inside(self):
        coords, inside = T.barycentric(self.TRI, jnp.asarray([[0.25, 0.25, 0.0]]))
        assert bool(inside[0])
        np.testing.assert_allclose(float(coords[0].sum()), 1.0, atol=1e-5)

    def test_barycentric_outside(self):
        _, inside = T.barycentric(self.TRI, jnp.asarray([[2.0, 2.0, 0.0]]))
        assert not bool(inside[0])

    def test_barycentric_vertices(self):
        # At vertex 1 (=(1,0,0)) the u coordinate (weight of v1) is 1
        coords, inside = T.barycentric(self.TRI, jnp.asarray([[1.0, 0.0, 0.0]]))
        assert bool(inside[0])
        np.testing.assert_allclose(np.asarray(coords[0]), [1, 0, 0], atol=1e-5)

    def test_closest_point_regions(self):
        tri = self.TRI
        # Above the face -> projects to the face
        p = T.closest_point(tri, jnp.asarray([[0.2, 0.2, 5.0]]))
        np.testing.assert_allclose(np.asarray(p[0]), [0.2, 0.2, 0.0], atol=1e-5)
        # Beyond vertex A
        p = T.closest_point(tri, jnp.asarray([[-1.0, -1.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(p[0]), [0, 0, 0], atol=1e-5)
        # Beyond edge AB
        p = T.closest_point(tri, jnp.asarray([[0.5, -2.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(p[0]), [0.5, 0, 0], atol=1e-5)


class TestMesh:
    def test_box_has_12_inward_triangles(self):
        b = M.box(2.0, 2.0, 2.0)
        assert b.num_triangles == 12
        # Inward normals: normal . (centroid - origin) < 0 for all faces
        centroids = np.asarray(b.tris).mean(axis=1)
        dots = (np.asarray(b.normals) * centroids).sum(-1)
        assert (dots < 0).all()

    def test_boundary_particles_vertex_mode(self):
        b = M.box(2.0, 2.0, 2.0)
        pts = b.generate_boundary_particles(density=1.0)
        assert pts.shape == (36, 3)

    def test_boundary_particles_surface_sampling(self):
        b = M.box(2.0, 2.0, 2.0)
        pts = b.generate_boundary_particles(density=3.0)
        assert pts.shape[0] > 36

    def test_mesh_collide_pushes_out(self):
        b = M.box(2.0, 2.0, 2.0)
        s = zero_state(3)
        s = s._replace(
            pos=jnp.asarray([[0.0, -0.98, 0.0], [0.0, 0.0, 0.0], [0.0, -1.5, 0.0]]),
            vel=jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, 0.0], [0.0, -1.0, 0.0]]),
        )
        s2 = M.mesh_collide(s, b, dt=0.01, radius=0.05)
        # Falling particle near the floor: pushed up, velocity reflected
        assert float(s2.pos[0, 1]) > -0.98
        assert float(s2.vel[0, 1]) > 0
        # Stationary center particle untouched
        np.testing.assert_allclose(np.asarray(s2.pos[1]), [0, 0, 0], atol=1e-6)
        # Tunneled particle (outside the box) recovered to the surface shell
        assert float(s2.pos[2, 1]) == pytest.approx(-0.95, abs=1e-5)


class TestOctree:
    def test_encode_octants(self):
        enc = O.encode_points(
            jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, -0.5], [0.5, -0.5, 0.5]]),
            bounds=(2.0, 2.0, 2.0), depth=2,
        )
        enc = np.asarray(enc)
        np.testing.assert_array_equal(enc[0, 0], [1, 1, 1])
        np.testing.assert_array_equal(enc[1, 0], [0, 0, 0])
        np.testing.assert_array_equal(enc[2, 0], [1, 0, 1])

    def test_encode_depth_refines(self):
        # Reference semantics (octal.go EncodePoint): level-0 shift is half the
        # FULL bounds, so for 0.9 in [-1,1]: centroid 0 -> bit 1, centroid 1
        # -> bit 0 (0.9 < 1), centroid 0.5 -> bit 1.
        enc = np.asarray(O.encode_points(jnp.asarray([[0.9, 0.9, 0.9]]),
                                         bounds=(2.0, 2.0, 2.0), depth=3))[0]
        expected = np.asarray([[1, 1, 1], [0, 0, 0], [1, 1, 1]], np.uint8)
        np.testing.assert_array_equal(enc, expected)

    def test_depth_similarity(self):
        a = np.asarray([[1, 1, 1], [0, 1, 0], [1, 0, 0]], np.uint8)
        b = np.asarray([[1, 1, 1], [0, 1, 0], [0, 0, 0]], np.uint8)
        assert O.depth_similarity(a, b) == 2
        assert O.depth_similarity(a, a) == 3

    def test_group_encoding(self):
        pts = jnp.asarray([[0.9, 0.9, 0.9], [0.6, 0.6, 0.6]])
        enc = O.encode_points(pts, bounds=(2.0, 2.0, 2.0), depth=3)
        g = O.group_encoding(enc)
        # Both in the (+,+,+) octant at level 0 and the upper half at level 1
        np.testing.assert_array_equal(g[0], [1, 1, 1])

    def test_centroid_roundtrip(self):
        enc = np.asarray([[1, 0, 1]], np.uint8)
        c = O.centroid_of(enc, bounds=(2.0, 2.0, 2.0))
        np.testing.assert_allclose(c, [1.0, -1.0, 1.0], atol=1e-6)

    def test_tree_insert_and_neighbors(self):
        tree = O.OctalTree(bounds=(2.0, 2.0, 2.0), max_depth=3)
        pts = jnp.asarray([[0.9, 0.9, 0.9], [0.85, 0.85, 0.85], [-0.9, -0.9, -0.9]])
        tree.insert_points(pts)
        enc = np.asarray(O.encode_points(pts, (2.0, 2.0, 2.0), depth=3))
        nbrs = tree.neighbors(enc[0])
        assert 0 in nbrs and 1 in nbrs and 2 not in nbrs
