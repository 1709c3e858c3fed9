import sys, numpy as np, jax, jax.numpy as jnp
from dieselfluid_tpu.ops.cellops import DenseCellSpec, dense_indices, build_planes, gather_plane
import dieselfluid_tpu.ops.pallas_sph as ps
from dieselfluid_tpu.ops.smoothing import KernelCoeffs

h = 0.0625
nxy = int(sys.argv[1]); nz = int(sys.argv[2])
spec = DenseCellSpec.for_domain((-1,-1,-1), (-1+nxy*h, -1+nxy*h, -1+nz*h), h, capacity=16)
print("spec", spec.nx, spec.ny, spec.nz, "sub", spec.sub, "rows", spec.rows)
rng = np.random.default_rng(0)
N = 4000
pos = jnp.asarray(np.stack([rng.uniform(-1, -1+nxy*h, N), rng.uniform(-1, -1+nxy*h, N), rng.uniform(-1, -1+nz*h, N)], -1).astype(np.float32))
flat, valid, ov = dense_indices(pos, spec)
planes = build_planes({"x":pos[:,0],"y":pos[:,1],"z":pos[:,2]}, flat, valid, spec)
k = KernelCoeffs.build(h)
rho_p = ps.density_planes(planes, spec, k, 1.0)
rho = np.asarray(gather_plane(rho_p, flat))
d2 = jnp.sum((pos[:,None,:]-pos[None,:,:])**2, -1)
w = jnp.where(d2 < h*h, float(k.a)*(1-d2/(h*h))**2, 0.0)
rho_ref = np.asarray(jnp.sum(w, 1))
v = np.asarray(valid)
print("OK max err", np.abs(rho[v]-rho_ref[v]).max(), "rel", np.abs(rho[v]-rho_ref[v]).max()/rho_ref[v].max())
