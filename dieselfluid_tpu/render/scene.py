"""Scene graph: GLTF document -> flattened, device-ready render arrays.

ref: render/scene/scene.go (Scene = parsed GLTF + loaded buffers) and
render/rendersystem.go Init/RegisterMesh:73-257 (accessor walk, PBR material
construction, world transforms). Instead of uploading to GL VAOs, the scene
flattens into one triangle soup + per-triangle material indices consumed by
the differentiable renderers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dieselfluid_tpu.render.gltf import GLTF
from dieselfluid_tpu.render.pbr import PBRMaterial


@dataclasses.dataclass
class SceneMesh:
    """One primitive instance with its world transform applied."""

    positions: np.ndarray          # (V, 3) world space
    normals: Optional[np.ndarray]  # (V, 3)
    uvs: Optional[np.ndarray]      # (V, 2)
    indices: np.ndarray            # (I,) uint32
    material_index: Optional[int]
    name: str = ""


@dataclasses.dataclass
class Scene:
    """Loaded scene: meshes in world space + materials + texture paths."""

    gltf: GLTF
    meshes: List[SceneMesh]
    materials: List[Dict]
    texture_paths: List[Optional[str]]

    @staticmethod
    def load(path: str, at_time: Optional[float] = None,
             animation: int = 0) -> "Scene":
        """ref: scene.go InitScene:26 + rendersystem walk.

        `at_time`: evaluate animation channel `animation` at that time and
        flatten with the ANIMATED node transforms (gltf.sample_animation) —
        the playback the reference's typed Animation schema never got
        (ref: gltf/gltf.go:258-312)."""
        g = GLTF.load(path)
        meshes: List[SceneMesh] = []
        animated = at_time is not None and len(g.animations) > animation

        def visit(node_idx: int, parent: np.ndarray):
            node = g.nodes[node_idx]
            local = (g.node_local_matrix_at(node_idx, animation, at_time)
                     if animated else g.node_local_matrix(node))
            world = parent @ local
            if "mesh" in node:
                mi = node["mesh"]
                for pi, _ in enumerate(g.meshes[mi].get("primitives", [])):
                    arrays = g.primitive_arrays(mi, pi)
                    pos = arrays.get("POSITION")
                    if pos is None:
                        continue
                    posh = np.concatenate([pos, np.ones((len(pos), 1), np.float32)], 1)
                    wpos = (posh @ world.T)[:, :3]
                    nrm = arrays.get("NORMAL")
                    if nrm is not None:
                        nrm = nrm @ np.linalg.inv(world[:3, :3]).T.astype(np.float32)
                        nl = np.linalg.norm(nrm, axis=-1, keepdims=True)
                        nrm = nrm / np.maximum(nl, 1e-9)
                    idx = arrays.get("indices")
                    if idx is None:
                        idx = np.arange(len(pos), dtype=np.uint32)
                    meshes.append(SceneMesh(
                        positions=wpos.astype(np.float32),
                        normals=None if nrm is None else nrm.astype(np.float32),
                        uvs=arrays.get("TEXCOORD_0"),
                        indices=idx,
                        material_index=arrays.get("material"),
                        name=g.meshes[mi].get("name", f"mesh{mi}"),
                    ))
            for child in node.get("children", []):
                visit(child, world)

        for root in g.default_scene_nodes():
            visit(root, np.eye(4, dtype=np.float32))

        tex_paths = [g.image_path(t.get("source", 0)) if g.images else None
                     for t in g.textures]
        return Scene(gltf=g, meshes=meshes, materials=list(g.materials),
                     texture_paths=tex_paths)

    def material(self, index: Optional[int]) -> PBRMaterial:
        """PBR metallic-roughness factors -> PBRMaterial.

        ref: rendersystem.go:135-162 builds materials from
        pbrMetallicRoughness {baseColorFactor, metallicFactor, roughnessFactor}.
        """
        if index is None or index >= len(self.materials):
            return PBRMaterial.make()
        m = self.materials[index].get("pbrMetallicRoughness", {})
        base = m.get("baseColorFactor", [0.8, 0.8, 0.8, 1.0])[:3]
        return PBRMaterial.make(
            base_color=base,
            metallic=m.get("metallicFactor", 1.0),
            roughness=m.get("roughnessFactor", 1.0),
        )

    def triangle_soup(self):
        """All meshes flattened to ((T, 3, 3) tris, (T, 3) normals,
        (T,) material ids) device arrays for the ray renderer."""
        tris, norms, mats = [], [], []
        for mesh in self.meshes:
            p = mesh.positions[mesh.indices.reshape(-1, 3)]
            tris.append(p)
            if mesh.normals is not None:
                n = mesh.normals[mesh.indices.reshape(-1, 3)].mean(axis=1)
                n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
            else:
                e1 = p[:, 1] - p[:, 0]
                e2 = p[:, 2] - p[:, 0]
                n = np.cross(e1, e2)
                n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
            norms.append(n)
            mi = mesh.material_index if mesh.material_index is not None else -1
            mats.append(np.full(len(p), mi, np.int32))
        if not tris:
            z = np.zeros((0, 3, 3), np.float32)
            return jnp.asarray(z), jnp.asarray(z[:, 0]), jnp.zeros((0,), jnp.int32)
        return (jnp.asarray(np.concatenate(tris)),
                jnp.asarray(np.concatenate(norms)),
                jnp.asarray(np.concatenate(mats)))

    def triangle_uvs(self):
        """(T, 3, 2) per-corner UVs aligned with triangle_soup (zeros where a
        mesh has no TEXCOORD_0). ref: rendersystem.go RegisterMesh reads the
        TEXCOORD_0 accessor at :171-257."""
        uvs = []
        for mesh in self.meshes:
            tri_idx = mesh.indices.reshape(-1, 3)
            if mesh.uvs is not None:
                uvs.append(mesh.uvs[tri_idx].astype(np.float32))
            else:
                uvs.append(np.zeros((len(tri_idx), 3, 2), np.float32))
        if not uvs:
            return jnp.zeros((0, 3, 2), jnp.float32)
        return jnp.asarray(np.concatenate(uvs))

    def texture_stack(self, res: int = 256):
        """((K, res, res, 3) stack, (M,) base-color tex idx, (M,) normal tex
        idx) with -1 = untextured. Images resample to a common resolution so
        one gather serves every material (the device-array analog of the
        reference's per-texture GL objects, ref: render/texture/texture.go
        CommitTexLibGL:82 + rendersystem.go texture-unit binding)."""

        def resize(img):
            h, w = img.shape[:2]
            yi = (np.linspace(0, h - 1, res)).astype(int)
            xi = (np.linspace(0, w - 1, res)).astype(int)
            return img[yi][:, xi]

        stack, loaded = [], {}
        for k, path in enumerate(self.texture_paths):
            if path is None:
                loaded[k] = -1
                continue
            try:
                import imageio.v2 as imageio

                img = np.asarray(imageio.imread(path), np.float32)
                if img.max() > 1.0:
                    img = img / 255.0
                if img.ndim == 2:
                    img = img[..., None].repeat(3, -1)
                loaded[k] = len(stack)
                stack.append(resize(img[..., :3]))
            except (OSError, ValueError):
                loaded[k] = -1

        def tex_index(m, key):
            if key == "baseColorTexture":
                t = m.get("pbrMetallicRoughness", {}).get("baseColorTexture")
            else:
                t = m.get(key)
            if t is None:
                return -1
            return loaded.get(t.get("index", -1), -1)

        base_idx = np.asarray(
            [tex_index(m, "baseColorTexture") for m in self.materials]
            or [-1], np.int32)
        norm_idx = np.asarray(
            [tex_index(m, "normalTexture") for m in self.materials]
            or [-1], np.int32)
        if not stack:
            tex = jnp.zeros((1, res, res, 3), jnp.float32)
        else:
            tex = jnp.asarray(np.stack(stack))
        return tex, jnp.asarray(base_idx), jnp.asarray(norm_idx)

    def stacked_materials(self) -> PBRMaterial:
        """All materials as one leaves-(M, ...) PBRMaterial pytree."""
        import jax

        mats = [self.material(i) for i in range(max(len(self.materials), 1))]
        return jax.tree.map(lambda *leaves: jnp.stack(leaves), *mats)

    def export(self, path: str):
        """Write the (possibly modified) document back. ref: scene.go ExportGLTF."""
        self.gltf.save(path)
