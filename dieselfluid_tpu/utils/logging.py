"""Structured logging for simulations (replaces the reference's printf
banners, e.g. model/sph/fluid.go:84 and compute/gpu/gpu.go accumulated log)."""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "dieselfluid") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def log_banner(logger: logging.Logger, sim) -> None:
    """SPH system banner (ref: fluid.go:84-86 printf)."""
    p = sim.params
    logger.info(
        "SPH system: N=%d h=%.4f dt=%.5f d0=%.1f mu=%.3f solver=%s neighbors=%s",
        sim.n(), p.h, p.dt, p.d0, p.mu, sim.config.solver, sim.config.neighbors,
    )
