"""Pinhole camera: TRS transform, inverse-rigid view, FPS rotation, rays.

ref: render/camera/camera.go — view = inverse(camera transform)
(camera.go Update:76), FPS yaw/pitch via Euler rotation of the front vector
with recomputed right/up (RotateFPS:87-108). Pure-functional: methods return
new Camera instances.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from dieselfluid_tpu.mathx import quaternion as Q, transforms as TF

YAW = -90.0  # ref: camera.go:14
RAD = 0.0174532925


@dataclasses.dataclass(frozen=True)
class Camera:
    transform: jnp.ndarray            # 4x4 camera-to-world
    fov_deg: float = 60.0
    aspect: float = 16.0 / 9.0
    near: float = 0.1
    far: float = 100.0
    exposure: float = 1.0

    @staticmethod
    def at(pos, front=(0.0, 0.0, 1.0), fov_deg=60.0, aspect=16.0 / 9.0,
           near=0.1, far=100.0) -> "Camera":
        """Camera at pos with the given front axis (ref default front +z)."""
        front = jnp.asarray(front, jnp.float32)
        front = front / jnp.linalg.norm(front)
        right = jnp.cross(jnp.asarray([0.0, 1.0, 0.0]), front)
        rn = jnp.linalg.norm(right)
        right = jnp.where(rn > 1e-6, right / jnp.maximum(rn, 1e-6),
                          jnp.asarray([1.0, 0.0, 0.0]))
        up = jnp.cross(front, right)
        m = jnp.eye(4, dtype=jnp.float32)
        # Camera-to-world: basis vectors as COLUMNS. (The reference writes
        # them as rows, camera.go RotateFPS Set(0, right), and then inverts
        # the mixed matrix — broken for pitched cameras; deliberately fixed.)
        m = m.at[:3, 0].set(right).at[:3, 1].set(up).at[:3, 2].set(front)
        m = m.at[:3, 3].set(jnp.asarray(pos, jnp.float32))
        return Camera(transform=m, fov_deg=fov_deg, aspect=aspect, near=near, far=far)

    @property
    def position(self) -> jnp.ndarray:
        return self.transform[:3, 3]

    @property
    def front(self) -> jnp.ndarray:
        return self.transform[:3, 2]

    def view_matrix(self) -> jnp.ndarray:
        """World-to-view. ref: camera.go Update — inverse of the transform."""
        return TF.inverse_rigid(self.transform)

    def projection_matrix(self) -> jnp.ndarray:
        return TF.projection(self.fov_deg, self.aspect, self.near, self.far)

    def mvp(self, model: jnp.ndarray | None = None) -> jnp.ndarray:
        m = jnp.eye(4, dtype=jnp.float32) if model is None else model
        return self.projection_matrix() @ self.view_matrix() @ m

    def translate(self, delta) -> "Camera":
        m = self.transform.at[:3, 3].add(jnp.asarray(delta, jnp.float32))
        return dataclasses.replace(self, transform=m)

    def rotate_axis(self, axis, angle_deg) -> "Camera":
        """ref: camera.go Rotate — axis-angle about the camera origin."""
        r = TF.rotate_axis_angle(axis, angle_deg * RAD)
        return dataclasses.replace(self, transform=self.transform @ r)

    def rotate_fps(self, yaw_deg, pitch_deg) -> "Camera":
        """Yaw/pitch the front axis, recompute right/up. ref: RotateFPS:87-108."""
        rot = TF.rotate_euler(0.0, pitch_deg * RAD, yaw_deg * RAD)
        front = rot[:3, :3] @ self.front
        front = front / jnp.linalg.norm(front)
        right = jnp.cross(jnp.asarray([0.0, 1.0, 0.0]), front)
        right = right / jnp.maximum(jnp.linalg.norm(right), 1e-6)
        up = jnp.cross(front, right)
        m = self.transform
        m = m.at[:3, 0].set(right).at[:3, 1].set(up).at[:3, 2].set(front)
        return dataclasses.replace(self, transform=m)

    def pixel_rays(self, width: int, height: int):
        """(H, W, 3) world-space ray origins + directions through pixel centers."""
        tan_half = jnp.tan(jnp.deg2rad(self.fov_deg) / 2.0)
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
        ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
        px, py = jnp.meshgrid(xs * tan_half * self.aspect, ys * tan_half,
                              indexing="xy")
        # The camera looks along +front (transform column 2); rays span the
        # right/up basis columns.
        r = self.transform[:3, :3]
        d_world = (px[..., None] * r[:, 0] + py[..., None] * r[:, 1]
                   + jnp.ones_like(px)[..., None] * r[:, 2])
        d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
        origins = jnp.broadcast_to(self.position, d_world.shape)
        return origins, d_world


# Register Camera as a pytree: the transform is traced (differentiable camera
# pose), the projection scalars ride along as static aux data.
import jax.tree_util as _jtu


def _cam_flatten(c: Camera):
    return (c.transform,), (c.fov_deg, c.aspect, c.near, c.far, c.exposure)


def _cam_unflatten(aux, children):
    fov, aspect, near, far, exposure = aux
    return Camera(transform=children[0], fov_deg=fov, aspect=aspect,
                  near=near, far=far, exposure=exposure)


_jtu.register_pytree_node(Camera, _cam_flatten, _cam_unflatten)
