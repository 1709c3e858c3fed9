"""Rest-density calibration from an initial particle configuration.

Real SPH codes set the rest density d0 to the summation density of the
undeformed lattice so the Tait EOS sees zero pressure at rest and responds
immediately to compression. The reference instead hardcodes d0 = N/volume
(ref: model/sph/fluid.go:55) against a 100-sample LSH probe — with its h=1
kernel that undersamples density so badly that pressure permanently clamps to
zero (TaitEos clamps rho < d0, ref: model/model.go). This module closes that
gap for physical runs.
"""

from __future__ import annotations

import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models import field as F
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood


def calibrate_rest_density(pos: jnp.ndarray, params: FluidParams,
                           k: int = 64, include_self: bool = True) -> FluidParams:
    """Return params with d0 set to the max summation density of `pos`.

    The default include_self=True matches the self-term-inclusive density the
    physical solvers compute (field.density_with_self) so interior particles
    sit exactly at d0 at rest: zero pressure at rest, immediate repulsion
    under compression. Set include_self=False when calibrating for the
    reference-parity operators (self term excluded, ref: sph_field.go:163).
    """
    nb = brute_force_neighborhood(pos, pos, params.h, k)
    rho = F.density(pos, nb, params)
    if include_self:
        from dieselfluid_tpu.ops.smoothing import KernelCoeffs, w0

        rho = rho + params.mass * w0(KernelCoeffs.build(params.h))
    d0 = float(jnp.max(rho))
    # Rescale Tait stiffness with d0 so the sound speed c = sqrt(w/d0) the
    # params were built with is preserved.
    return params.replace(d0=d0, tait_w=params.tait_w * d0 / params.d0)


def lattice_rest_density(dx: float, params: FluidParams) -> FluidParams:
    """calibrate_rest_density for a cubic lattice of spacing dx, computed on
    an O(1) offset template instead of an O(N*k) neighborhood — usable at 1M+
    particles where the brute-force probe cannot run. Interior particles of
    such a lattice see exactly this summation density, so the fluid starts at
    equilibrium (a d0 above it makes the WHOLE column compress until the
    densest cells overflow any capacity — the round-2 PCISPH bench's 1.1x
    inflation did exactly that)."""
    import numpy as np

    from dieselfluid_tpu.ops.smoothing import KernelCoeffs

    k = KernelCoeffs.build(params.h)
    r = int(np.ceil(params.h / dx))
    axis = np.arange(-r, r + 1) * dx
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    d2 = gx ** 2 + gy ** 2 + gz ** 2
    q = 1.0 - d2 / (k.h * k.h)
    w = np.where(d2 < k.h * k.h, k.a * q * q, 0.0)   # includes self (r=0)
    d0 = float(params.mass * w.sum())
    return params.replace(d0=d0, tait_w=params.tait_w * d0 / params.d0)
