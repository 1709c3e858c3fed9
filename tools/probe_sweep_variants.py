"""Probe: density/force sweep shaping experiments at 1M on hardware.

Round-5 verdict next-step #4: density sweep runs at 47% of the VPU bound
(force 62%) — find where the gap is. Variants:
  * P=16 patches (half the grid programs, 3*(P+2)/P = 3.375 vs 3.75
    stencil rows fetched per own column);
  * max(q,0) density pair (drops the compare+select pair ops);
  * force with P=16.
Each timed like bench.bench_roofline_dense_1m (device-reduced scalar sync).

MEASURED (v5e, 1M, cap 16, round 5) — ALL NEUTRAL:
    density P=8 baseline 39.8 ms | P=16 39.8 | maxq P=8 39.0 | maxq P=16 39.2
    force half P=8 80.0 | half P=16 79.5 | full P=8 81.8
Patch size, compare+select removal, and block scheme each move the sweeps
<2%: the gap to the 12-ops/pair VPU model is not control overhead, DMA, or
the select — it is the achievable VPU issue rate for this short
dependent-chain op mix (the model assumes all 4 ALUs retire a fused op
every cycle). The density sweep is at its practical wall; the recorded
verdict-#4 probe. Parity: every variant bit-identical (max|diff|=0)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dieselfluid_tpu.config import FluidParams
    from dieselfluid_tpu.models.particles import dam_break_state
    from dieselfluid_tpu.neighbors.calibrate import lattice_rest_density
    from dieselfluid_tpu.ops.cellops import DenseCellSpec, build_planes, dense_indices
    from dieselfluid_tpu.ops import pallas_sph as PS
    from dieselfluid_tpu.ops.smoothing import KernelCoeffs, tait_eos

    n3, extent = 100, 0.5
    dx = (2.0 / n3) * extent
    params = lattice_rest_density(dx, FluidParams.for_spacing(dx))
    state = dam_break_state(n3, params, extent=extent)
    off = params.h / 4.0
    spec = DenseCellSpec.for_domain((-1 - off,) * 3, (1 + off,) * 3, params.h,
                                    capacity=16)
    k = KernelCoeffs.build(params.h)
    pos, vel = state.pos, state.vel
    flat, valid, _ = jax.jit(lambda p: dense_indices(p, spec))(pos)
    planes = jax.jit(lambda p, v, f, va: build_planes(
        {"x": p[:, 0], "y": p[:, 1], "z": p[:, 2],
         "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2]}, f, va, spec))(
        pos, vel, flat, valid)
    rho_plane = jax.jit(
        lambda pl_: PS.density_planes(pl_, spec, k, params.mass))(planes)
    press_plane = jax.jit(lambda rp, m: jnp.where(
        m > 0, tait_eos(rp, params.d0, params.p0, params.tait_gamma,
                        params.tait_w), 0.0))(rho_plane, planes["mask"])

    def timed(label, fn, *args, reps=5, ref=None):
        jfn = jax.jit(fn)
        out0 = jfn(*args)
        np.asarray(out0)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(*args)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        extra = ""
        if ref is not None:
            extra = f"  max|diff|={float(jnp.max(jnp.abs(out0 - ref))):.3e}"
        print(f"{label}: {ms:.1f} ms{extra}", flush=True)
        return out0, ms

    a_w, h2 = float(k.a), float(k.h) ** 2

    def dpair_maxq(own, cand):
        ddx = cand["x"] - own["x"]
        ddy = cand["y"] - own["y"]
        ddz = cand["z"] - own["z"]
        d2 = ddx * ddx + ddy * ddy + ddz * ddz
        t = jnp.maximum(1.0 - d2 / h2, 0.0)
        return (a_w * t * t * cand["mask"],)

    D_IN = PS._D_IN
    dplanes = [planes[n] for n in D_IN]

    def dsum(patch_p=None, pair=None):
        def f(*pls):
            d = dict(zip(D_IN, pls))
            (s,) = PS._sweep(pair or PS._density_pair(k), D_IN, 1,
                             [d[n] for n in D_IN], spec, patch_p=patch_p)
            return PS._mask_where(d["mask"], s).sum()
        return f

    def dsum_val(patch_p=None, pair=None):
        def f(*pls):
            d = dict(zip(D_IN, pls))
            (s,) = PS._sweep(pair or PS._density_pair(k), D_IN, 1,
                             [d[n] for n in D_IN], spec, patch_p=patch_p)
            return PS._mask_where(d["mask"], s)
        return f

    # Parity check once (full-plane fetch), then TIME with device-reduced
    # scalars only — fetching the 80 MB plane times the tunnel, not the TPU.
    import jax as _jax
    ref = _jax.jit(dsum_val())(*dplanes)
    for lbl, f in (("P=16", dsum_val(patch_p=16)),
                   ("maxq P=8", dsum_val(pair=dpair_maxq)),
                   ("maxq P=16", dsum_val(patch_p=16, pair=dpair_maxq))):
        d = float(jnp.max(jnp.abs(_jax.jit(f)(*dplanes) - ref)))
        print(f"parity {lbl}: max|diff|={d:.3e}", flush=True)
    timed("density P=8 baseline", dsum(), *dplanes)
    timed("density P=16", dsum(patch_p=16), *dplanes)
    timed("density maxq P=8", dsum(pair=dpair_maxq), *dplanes)
    timed("density maxq P=16", dsum(patch_p=16, pair=dpair_maxq), *dplanes)

    # force (prefolded fused pair, like force_planes forward)
    m = planes["mask"]
    rho_c = jnp.maximum(rho_plane, PS._EPS)
    pq = jnp.where(m > 0, press_plane / (rho_c * rho_c), 0.0)
    iv = jnp.where(m > 0, 1.0 / rho_c, 0.0)
    F_IN = PS._F_IN_FOLD
    fins = dict(planes)
    fins["pq"] = pq
    fins["iv"] = iv
    farrs = [fins[n] for n in F_IN]

    def fsum(patch_p=None, scheme=None):
        def f(*pls):
            d = dict(zip(F_IN, pls))
            outs = PS._sweep(PS._force_fold_pair(k, params.mass,
                                                 float(params.mu)),
                             F_IN, 3, [d[n] for n in F_IN], spec,
                             patch_p=patch_p, scheme=scheme)
            return sum(PS._mask_where(d["mask"], o).sum() for o in outs)
        return f

    timed("force half P=8 baseline", fsum(), *farrs)
    timed("force half P=16", fsum(patch_p=16), *farrs)
    timed("force full P=8", fsum(scheme="full"), *farrs)


main()
