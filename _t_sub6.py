# Interpret-mode correctness check at sub=6 (the TPU-failing config shape).
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from unittest import mock
from jax.experimental import pallas as pl
from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.ops.cellops import DenseCellSpec, dense_indices, build_planes, gather_plane
import dieselfluid_tpu.ops.pallas_sph as ps
from dieselfluid_tpu.ops.smoothing import KernelCoeffs

rng = np.random.default_rng(0)
h = 0.0625
# small x/y extent, full z depth -> nx=ny=4, nz=32 => sub=6 like n3=32
spec = DenseCellSpec.for_domain((-1,-1,-1), (-1+4*h, -1+4*h, 1), h, capacity=16)
print("spec", spec.nx, spec.ny, spec.nz, "sub", spec.sub, "plane", spec.plane_shape)
N = 2000
pos = np.stack([rng.uniform(-1, -1+4*h, N), rng.uniform(-1, -1+4*h, N), rng.uniform(-1, 1, N)], -1).astype(np.float32)
pos = jnp.asarray(pos)
flat, valid, ov = dense_indices(pos, spec)
print("overflow", int(ov))
planes = build_planes({"x":pos[:,0],"y":pos[:,1],"z":pos[:,2]}, flat, valid, spec)
k = KernelCoeffs.build(h)
orig = pl.pallas_call
with mock.patch.object(pl, "pallas_call", lambda *a, **kw: orig(*a, interpret=True, **{k2:v for k2,v in kw.items() if k2 != "interpret"})):
    rho_p = ps.density_planes(planes, spec, k, 1.0)
rho = gather_plane(rho_p, flat)
# oracle: brute force density with self-term
d2 = jnp.sum((pos[:,None,:]-pos[None,:,:])**2, -1)
w = jnp.where(d2 < h*h, float(k.a)*(1-d2/(h*h))**2, 0.0)
rho_ref = jnp.sum(w, 1)
err = np.abs(np.asarray(rho)[np.asarray(valid)] - np.asarray(rho_ref)[np.asarray(valid)])
print("max err", err.max())
