"""Dam break end-to-end: simulate, render frames, export, view.

    python examples/dam_break.py [--cpu]

The reference's canonical scene (dslapp/fluidapp/integration_test.go: a
fluid column collapsing inside a container, drawn as GL point sprites) as
a batch program: PCISPH solver, boundary-particle container, sphere-splat
frames, .dfc trajectory export, and the WebGL viewer installed next to it.
"""

import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from dieselfluid_tpu.app.serve import install_viewer
from dieselfluid_tpu.config import SimConfig
from dieselfluid_tpu.io.native import StreamWriter
from dieselfluid_tpu.models.sph import Simulation
from dieselfluid_tpu.render.camera import Camera
from dieselfluid_tpu.render.splat import splat_particles

OUT = "out/dam_break"

config = SimConfig(n3=16, solver="pcisph", neighbors="cellgrid",
                   warm_start=True)
sim = Simulation.create(config, extent=0.5, scene="dam_break")
print(f"{sim.n()} particles, h={sim.params.h:.3f}, dt={sim.params.dt:.5f}")

cam = Camera.at([0.0, 0.6, -2.8], front=[0.0, -0.35, 1.0],
                fov_deg=55.0, aspect=1.0)
stream = StreamWriter(OUT, "dam_break", sim.n(), mode="dfc")

for frame in range(300):
    sim.step()
    if frame % 5 == 0:
        stream.append(np.asarray(sim.state.pos))
    if frame == 150:
        img = splat_particles(sim.state.pos, sim.dx * 0.7, cam, 256, 256)
        print(f"frame 150: coverage {float(img.alpha.mean()):.3f}, "
              f"max |v| = {float(np.abs(np.asarray(sim.state.vel)).max()):.2f}")

frames = stream.close()
viewer = install_viewer(OUT)
print(f"wrote {frames} frames -> {OUT}/dam_break.dfc")
print(f"view:  python -m dieselfluid_tpu.app.serve {OUT}")
print(f"       then open /viewer.html?file=dam_break.dfc")
