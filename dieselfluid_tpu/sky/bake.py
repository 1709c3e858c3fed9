"""Sky texture baking: tone mapping, file output, env-box generation.

ref: atmosphere/atmosphere.go CreateTexture:94-99, CreateEnvBox:102-139,
ImageFromPixels:142-193 (the piecewise log/sigmoid tone curve).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dieselfluid_tpu.sky.atmosphere import compute_atmosphere, compute_region, scatter_rgb
from dieselfluid_tpu.render.cubemap import cubemap_directions


def tone_map(rgb: jnp.ndarray) -> jnp.ndarray:
    """Piecewise log/sigmoid tone curve. ref: ImageFromPixels:158-180 —
    log(x+1) below 1.31, 1/(1+exp(-x*0.5+1)) above."""
    g, b = 0.5, -1.0
    return jnp.where(rgb < 1.31, jnp.log(jnp.maximum(rgb, 0.0) + 1.0),
                     1.0 / (1.0 + jnp.exp(-rgb * g + b)))


def create_texture(sun_dir, width: int, height: int, clamp: bool,
                   filename: str, flux: float = 20.5):
    """Bake the fisheye sky to an image file. ref: CreateTexture:94-99."""
    rgb = compute_atmosphere(sun_dir, width, height, flux=flux)
    img = tone_map(rgb) if clamp else rgb
    _write(filename, img)
    return rgb


def create_env_box(sun_dir, width: int, height: int, clamp: bool,
                   prefix: str = "ENVBOX_", flux: float = 20.5):
    """Bake 6 env-box faces from fisheye regions. ref: CreateEnvBox:102-139 —
    4 side quadrants + a duplicated center region for top/bottom."""
    assert width == height and width % 4 == 0, "square, modulo-4 faces required"
    rw, rh = width // 2, height // 2
    corners = [(0, 0), (rw, 0), (rw, rh), (0, rh)]
    faces = []
    for i, (xc, yc) in enumerate(corners):
        rgb = compute_region(sun_dir, width, height, xc, yc, rw, rh, flux=flux)
        img = tone_map(rgb) if clamp else rgb
        _write(f"{prefix}{i}.png", img)
        faces.append(rgb)
    center = compute_region(sun_dir, width, height, rw // 2, rh // 2, rw, rh, flux=flux)
    img = tone_map(center) if clamp else center
    _write(f"{prefix}4.png", img)
    _write(f"{prefix}5.png", img)
    faces += [center, center]
    return faces


def bake_sky_cubemap(sun_dir, size: int = 64, flux: float = 20.5) -> jnp.ndarray:
    """(6, S, S, 3) cubemap of sky radiance — the environment light the
    renderer consumes (capability completion: the reference bakes fisheye
    quadrants; a true per-direction cubemap is the geometrically-correct
    version for reflection lookups)."""
    dirs = cubemap_directions(size)
    sun = jnp.asarray(sun_dir, jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    return scatter_rgb(dirs, sun, flux=flux)


def _write(path: str, img):
    import imageio.v2 as imageio

    arr = np.clip(np.asarray(img), 0.0, 1.0)
    imageio.imwrite(path, (arr * 255).astype(np.uint8))
