"""Triangle-soup meshes: inward normals, procedural box, particle collision,
boundary-particle emission.

ref: geom/mesh/mesh.go. The mesh is a (T, 3, 3) float32 array of triangles +
(T, 3) normals; collision is the vectorized particles-x-triangles narrow
phase the reference runs as nested Go loops (mesh.go Collision:41-57), fused
into one masked reduction usable inside the jitted solver step.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from dieselfluid_tpu.geometry import triangle as T


@dataclasses.dataclass(frozen=True)
class Mesh:
    """Static triangle mesh (host-constructed, device-resident arrays)."""

    tris: jnp.ndarray      # (T, 3, 3)
    normals: jnp.ndarray   # (T, 3) — oriented inward wrt an origin

    @staticmethod
    def from_vertices(vertices, origin=(0.0, 0.0, 0.0)) -> "Mesh":
        """Build from a flat (3T, 3) vertex list; normals flipped to point
        inward (toward origin). ref: mesh.go InitMesh:17-38."""
        v = jnp.asarray(vertices, jnp.float32).reshape(-1, 3, 3)
        n = T.normal(v)
        to_v0 = v[:, 0, :] - jnp.asarray(origin, jnp.float32)
        outward = jnp.sum(n * to_v0, axis=-1) > 0
        n = jnp.where(outward[:, None], -n, n)
        return Mesh(tris=v, normals=n)

    @property
    def num_triangles(self) -> int:
        return self.tris.shape[0]

    def generate_boundary_particles(self, density: float = 2.0) -> jnp.ndarray:
        """Boundary particles from mesh geometry.

        ref: mesh.go GenerateBoundaryParticles:60-76 emits one particle per
        vertex (the density arg is unused there). We match that baseline and
        additionally support surface sampling at `density` samples per edge
        via barycentric subdivision when density > 1.
        """
        verts = self.tris.reshape(-1, 3)
        if density <= 1.0:
            return verts
        k = int(density)
        pts = [verts]
        for i in range(1, k):
            for j in range(0, k - i + 1):
                u = i / k
                v = j / k
                w = 1.0 - u - v
                p = (u * self.tris[:, 0, :] + v * self.tris[:, 1, :]
                     + w * self.tris[:, 2, :])
                pts.append(p)
        return jnp.concatenate(pts, axis=0)

    def collide_swept(self, pos, vel, dt: float, radius: float):
        """Reference-parity narrow phase (plane projection + barycentric test).

        ref: mesh.go Collision:41-57 / tri.go BarycentricCollision:37-77.
        Known gaps (inherited behavior): misses edge/corner contacts where the
        plane projection falls outside every triangle, so it cannot seal a
        container — use `collide` for the robust response.
        """
        tris = self.tris[None, :, :, :]             # (1, T, 3, 3)
        norms = self.normals[None, :, :]            # (1, T, 3)
        p = pos[:, None, :]                         # (N, 1, 3)
        v = vel[:, None, :]
        hit, dist, _ = T.swept_collision(tris, norms, p, v, dt, radius)  # (N, T)
        ranked = jnp.where(hit, dist, jnp.inf)
        best = jnp.argmin(ranked, axis=1)
        any_hit = jnp.any(hit, axis=1)
        n_best = self.normals[best]
        d_best = jnp.take_along_axis(ranked, best[:, None], axis=1)[:, 0]
        depth = jnp.where(any_hit, radius - d_best, 0.0)
        return any_hit, n_best, depth

    def collide(self, pos, radius: float):
        """Robust narrow phase: closest point on the mesh + signed distance.

        For each particle, the nearest triangle's closest point gives the
        contact; the sign of dot(p - cp, n_inward) distinguishes the inside
        (positive) from penetration through the face (negative), which also
        catches tunneled particles the reference's scheme misses. Returns
        (hit, inward_normal, depth).
        """
        cp = T.closest_point(self.tris[None, :, :, :], pos[:, None, :])  # (N, T, 3)
        d = jnp.linalg.norm(pos[:, None, :] - cp, axis=-1)               # (N, T)
        best = jnp.argmin(d, axis=1)
        n = self.normals[best]                                           # (N, 3)
        cp_best = jnp.take_along_axis(cp, best[:, None, None], axis=1)[:, 0, :]
        offset = pos - cp_best
        signed = jnp.sum(offset * n, axis=-1)        # >0 inside, <0 crossed out
        hit = signed < radius
        depth = jnp.where(hit, radius - signed, 0.0)
        return hit, n, depth


# Pytree registration: solver steps take a Mesh as a traced argument (the
# triangle arrays live on device; nothing here is shape-dynamic).
import jax.tree_util as _jtu

_jtu.register_pytree_node(
    Mesh,
    lambda m: ((m.tris, m.normals), None),
    lambda _, ch: Mesh(tris=ch[0], normals=ch[1]),
)


def mesh_collide(state, mesh: Mesh, dt: float, radius: float,
                 restitution: float = 0.3, friction: float = 0.1):
    """Collision response against a mesh container/obstacle: push out along the
    inward normal, reflect the approaching normal velocity, damp tangential
    contact velocity. Capability completion of the reference's commented-out
    collider wiring (ref: model/sph/fluid.go:70)."""
    hit, n, depth = mesh.collide(state.pos, radius)
    pos = state.pos + n * depth[:, None]
    vn = jnp.sum(state.vel * n, axis=-1, keepdims=True)
    approaching = hit & (vn[..., 0] < 0)
    reflected = state.vel - (1.0 + restitution) * vn * n
    vel = jnp.where(approaching[:, None], reflected, state.vel)
    vel = jnp.where((hit & ~approaching)[:, None], vel * (1.0 - friction), vel)
    return state._replace(pos=pos, vel=vel)


def box(w: float, h: float, d: float, origin=(0.0, 0.0, 0.0)) -> Mesh:
    """Procedural 12-triangle box. ref: mesh.go Box:88-157 (same winding)."""
    x, y, z = origin
    p, q, s = w / 2.0, h / 2.0, d / 2.0
    lfb = [x - p, y - q, z + s]; lft = [x - p, y + q, z + s]
    rft = [x + p, y + q, z + s]; rfb = [x + p, y - q, z + s]
    lbb = [x - p, y - q, z - s]; lbt = [x - p, y + q, z - s]
    rbt = [x + p, y + q, z - s]; rbb = [x + p, y - q, z - s]
    verts = np.asarray([
        lfb, lft, rft,  rft, rfb, lfb,            # front +z
        lbb, lbt, rbb,  lbt, rbt, rbb,            # back -z
        lfb, lbb, rbb,  lfb, rbb, rfb,            # bottom -y
        lft, lbt, rbt,  rbt, rft, lft,            # top +y
        lfb, lbb, lft,  lbb, lbt, lft,            # left -x
        rft, rfb, rbb,  rft, rbt, rbb,            # right +x
    ], np.float32)
    return Mesh.from_vertices(verts, origin)
