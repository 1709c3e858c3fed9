"""Differentiable simulation: recover a material parameter from pixels.

    python examples/fit_material.py [--cpu]

The capability the reference never had: render a short PCISPH rollout with
a "true" viscosity, then recover it by gradient descent on the PIXEL loss —
gradients flow backward through the splat renderer, the correction loop
(fixed-iteration scan), and the Pallas/XLA solver into the traced
Materials (BASELINE config 4's machinery, at demo scale).
"""

import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models.materials import Materials
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.neighbors.calibrate import calibrate_rest_density
from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.splat import splat_particles
from dieselfluid_tpu.solvers.pcisph import compute_pci_delta, pcisph_step

n3, extent = 8, 0.5
dx = (2.0 / n3) * extent
params = FluidParams.for_spacing(dx)
state0 = dam_break_state(n3, params, extent=extent)
state0 = state0._replace(
    vel=jax.random.normal(jax.random.PRNGKey(0), state0.vel.shape) * 0.3)
params = calibrate_rest_density(state0.pos, params)
delta = compute_pci_delta(params, dx)
cam = Camera.at([0.0, 0.3, -2.2], front=[0.0, -0.15, 1.0], fov_deg=55.0,
                aspect=1.0)
nfn = lambda p: brute_force_neighborhood(p, p, params.h, 64)


def render_rollout(mats, steps=8):
    s = state0
    for _ in range(steps):
        s, _ = pcisph_step(s, params, delta, neighbor_fn=nfn,
                           unroll_for_grad=True, materials=mats)
    return splat_particles(s.pos, dx * 0.7, cam, 96, 96).color


mu_true = 0.4
target = render_rollout(Materials.from_params(params.replace(mu=mu_true)))


@jax.jit
def loss_and_grad(mu):
    def loss(m):
        img = render_rollout(Materials.from_params(params)._replace(mu=m))
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss)(mu)


mu = jnp.float32(0.05)
print(f"true viscosity mu = {mu_true}; starting from {float(mu)}")
for it in range(40):
    l, g = loss_and_grad(mu)
    # Sign descent: robust to the loss's scale, converges in ~20 steps.
    mu = jnp.clip(mu - 0.02 * jnp.sign(g), 0.01, 2.0)
    if it % 5 == 0:
        print(f"iter {it:2d}: loss={float(l):.3e} mu={float(mu):.4f}")

print(f"recovered mu = {float(mu):.4f} (true {mu_true})")
assert abs(float(mu) - mu_true) < 0.1, "did not converge"
