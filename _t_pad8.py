"""Probe B: original 3D kernels but sub a multiple of 8 (nz=48 -> sub=8, nz=112 -> sub=16)."""
import numpy as np, jax, jax.numpy as jnp
from dieselfluid_tpu.ops.cellops import DenseCellSpec, dense_indices, build_planes, gather_plane
import dieselfluid_tpu.ops.pallas_sph as ps
from dieselfluid_tpu.ops.smoothing import KernelCoeffs

h = 0.0625
for nxy, nz in [(4, 48), (4, 112)]:
    spec = DenseCellSpec.for_domain((-1,-1,-1), (-1+nxy*h, -1+nxy*h, -1+nz*h), h, capacity=16)
    print("spec", spec.nx, spec.ny, spec.nz, "sub", spec.sub, flush=True)
    rng = np.random.default_rng(0); N = 4000
    pos = jnp.asarray(np.stack([rng.uniform(-1, -1+nxy*h, N), rng.uniform(-1, -1+nxy*h, N),
                                rng.uniform(-1, -1+nz*h, N)], -1).astype(np.float32))
    flat, valid, ov = dense_indices(pos, spec)
    planes = build_planes({"x":pos[:,0],"y":pos[:,1],"z":pos[:,2]}, flat, valid, spec)
    k = KernelCoeffs.build(h)
    rho = np.asarray(gather_plane(ps.density_planes(planes, spec, k, 1.0), flat))
    d2 = jnp.sum((pos[:,None,:]-pos[None,:,:])**2, -1)
    w = jnp.where(d2 < h*h, float(k.a)*(1-d2/(h*h))**2, 0.0)
    rho_ref = np.asarray(jnp.sum(w, 1))
    v = np.asarray(valid)
    print("  OK rel err", np.abs(rho[v]-rho_ref[v]).max()/rho_ref[v].max(), flush=True)
