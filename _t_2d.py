"""Probe: 2D (rows*sub, 128) dense density kernel on real TPU at sub=6 and sub=15."""
import sys, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dieselfluid_tpu.ops.cellops import DenseCellSpec, dense_indices, build_planes
from dieselfluid_tpu.ops.smoothing import KernelCoeffs

def density2d(planes2d, spec, k, mass):
    py, sub = spec.py, spec.sub
    a_w, h2 = float(k.a), float(k.h * k.h)
    nblk = sub - 2
    def kernel(x_ref, y_ref, z_ref, m_ref, out_ref, sx, sy, sz, sm, acc, sems, out_sem):
        i = pl.program_id(0); j = pl.program_id(1)
        r = (i + 1) * py + (j + 1)
        dmas = []
        for p, (ref, scr) in enumerate(zip((x_ref, y_ref, z_ref, m_ref), (sx, sy, sz, sm))):
            for g, dr in enumerate((-py, 0, py)):
                d = pltpu.make_async_copy(
                    ref.at[pl.ds((r + dr - 1) * sub, 3 * sub), :],
                    scr.at[pl.ds(g * 3 * sub, 3 * sub), :],
                    sems.at[p, g])
                d.start(); dmas.append(d)
        for d in dmas: d.wait()
        for kb in range(nblk):
            ob = 4 * sub + kb + 1
            own_x = jnp.transpose(sx[ob:ob+1, :], (1, 0))
            own_y = jnp.transpose(sy[ob:ob+1, :], (1, 0))
            own_z = jnp.transpose(sz[ob:ob+1, :], (1, 0))
            own_m = jnp.transpose(sm[ob:ob+1, :], (1, 0))
            rho = jnp.zeros((128, 1), jnp.float32)
            for g in range(9):
                for t in range(3):
                    c = g * sub + kb + t
                    dx = sx[c:c+1, :] - own_x
                    dy = sy[c:c+1, :] - own_y
                    dz = sz[c:c+1, :] - own_z
                    d2 = dx*dx + dy*dy + dz*dz
                    q = 1.0 - d2 / h2
                    w = jnp.where(d2 < h2, a_w * q * q, 0.0) * sm[c:c+1, :]
                    rho = rho + jnp.sum(w, axis=1, keepdims=True)
            acc[kb+1:kb+2, :] = jnp.transpose(mass * rho * own_m, (1, 0))
        d = pltpu.make_async_copy(acc, out_ref.at[pl.ds(r * sub, sub), :], out_sem)
        d.start(); d.wait()
    return pl.pallas_call(
        kernel, grid=(spec.nx, spec.ny),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((spec.rows * spec.sub * 128 // 128, 128), jnp.float32),
        scratch_shapes=([pltpu.VMEM((9 * sub, 128), jnp.float32) for _ in range(4)]
                        + [pltpu.VMEM((sub, 128), jnp.float32),
                           pltpu.SemaphoreType.DMA((4, 3)),
                           pltpu.SemaphoreType.DMA(())]),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*planes2d)

h = 0.0625
for nxy, nz in [(4, 32), (4, 104)]:
    spec = DenseCellSpec.for_domain((-1,-1,-1), (-1+nxy*h, -1+nxy*h, -1+nz*h), h, capacity=16)
    print("spec", spec.nx, spec.ny, spec.nz, "sub", spec.sub)
    rng = np.random.default_rng(0); N = 4000
    pos = jnp.asarray(np.stack([rng.uniform(-1, -1+nxy*h, N), rng.uniform(-1, -1+nxy*h, N),
                                rng.uniform(-1, -1+nz*h, N)], -1).astype(np.float32))
    flat, valid, ov = dense_indices(pos, spec)
    planes = build_planes({"x":pos[:,0],"y":pos[:,1],"z":pos[:,2]}, flat, valid, spec)
    k = KernelCoeffs.build(h)
    p2d = [planes[n].reshape(-1, 128) for n in ("x","y","z","mask")]
    rho_p = density2d(p2d, spec, k, 1.0)
    rho = np.asarray(rho_p.reshape(-1)[flat])
    d2 = jnp.sum((pos[:,None,:]-pos[None,:,:])**2, -1)
    w = jnp.where(d2 < h*h, float(k.a)*(1-d2/(h*h))**2, 0.0)
    rho_ref = np.asarray(jnp.sum(w, 1))
    v = np.asarray(valid)
    print("  OK rel err", np.abs(rho[v]-rho_ref[v]).max()/rho_ref[v].max())
