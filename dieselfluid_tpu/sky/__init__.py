"""Physically-based atmosphere / sky environment light.

ref: atmosphere/ — Rayleigh+Mie single scattering with solar SPD and CIE
color handling, re-designed as a vmapped texel program (SURVEY.md §7.9):
every pixel's 25x25 scatter march is one fused tensor expression, tiled in
chunks; differentiable in the sun direction and scattering parameters.
"""

from dieselfluid_tpu.sky.earth import EarthCoords  # noqa: F401
from dieselfluid_tpu.sky.atmosphere import Atmosphere  # noqa: F401
