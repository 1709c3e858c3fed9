"""SPH solvers: WCSPH (weakly compressible) and PCISPH (predictive-corrective)."""

from dieselfluid_tpu.solvers.wcsph import wcsph_step, reference_wcsph_step  # noqa: F401
from dieselfluid_tpu.solvers.integrate import semi_implicit_euler, StepDiagnostics  # noqa: F401
