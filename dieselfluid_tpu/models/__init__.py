"""Particle state, water model, and SPH field operators."""

from dieselfluid_tpu.models.particles import FluidState, init_lattice_state  # noqa: F401
