import numpy as np, jax
from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.ops.cellops import DenseCellSpec, dense_indices, build_planes
from dieselfluid_tpu.ops.pallas_sph import density_planes
from dieselfluid_tpu.ops.smoothing import KernelCoeffs

n3, extent = 32, 0.5
dx = (2.0 / n3) * extent
params = FluidParams.for_spacing(dx)
state = dam_break_state(n3, params, extent=extent)
spec = DenseCellSpec.for_domain((-1, -1, -1), (1, 1, 1), params.h, capacity=16)
print("spec", spec.plane_shape, "nx,ny,nz", spec.nx, spec.ny, spec.nz, "sub", spec.sub)
flat, valid, ov = dense_indices(state.pos, spec)
print("overflow", int(ov))
planes = build_planes({"x": state.pos[:,0], "y": state.pos[:,1], "z": state.pos[:,2]}, flat, valid, spec)
k = KernelCoeffs.build(params.h)
rho = density_planes({"x":planes["x"],"y":planes["y"],"z":planes["z"],"mask":planes["mask"]}, spec, k, params.mass)
print("rho ok", float(jax.numpy.max(rho)))
