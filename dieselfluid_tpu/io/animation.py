"""Fluid animation export — the reference's unmet requirement (README.MD:39).

Formats:
  * .npz particle trajectories (positions over time + metadata) — the
    framework-native format, loadable anywhere.
  * .ply per-frame point clouds (binary little-endian) — standard DCC import.
  * .mp4/.gif rendered frame sequences via imageio (when a renderer is given).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Callable, List, Optional

import numpy as np


class AnimationWriter:
    """Accumulates frames and writes trajectory / point-cloud / video files."""

    def __init__(self, out_dir: str, name: str = "fluid"):
        self.out_dir = os.path.abspath(out_dir)
        self.name = name
        self.frames: List[np.ndarray] = []
        self.images: List[np.ndarray] = []
        os.makedirs(self.out_dir, exist_ok=True)

    def add_frame(self, positions, image=None):
        self.frames.append(np.asarray(positions, np.float32))
        if image is not None:
            img = np.asarray(image)
            self.images.append((np.clip(img, 0, 1) * 255).astype(np.uint8))

    # ---------------------------------------------------------------- output
    def write_npz(self, metadata: Optional[dict] = None) -> str:
        path = os.path.join(self.out_dir, f"{self.name}.npz")
        np.savez_compressed(
            path,
            positions=np.stack(self.frames),
            metadata=json.dumps(metadata or {}),
        )
        return path

    def write_ply_sequence(self) -> List[str]:
        """Numbered PLY point clouds; uses the native framepack runtime when
        available (identical output, no per-frame Python overhead)."""
        from dieselfluid_tpu.io import native

        if self.frames and all(f.shape == self.frames[0].shape for f in self.frames):
            traj = np.stack(self.frames)
            n = native.write_ply_sequence(self.out_dir, self.name, traj)
            return [os.path.join(self.out_dir, f"{self.name}_{i:05d}.ply")
                    for i in range(n)]
        paths = []
        for i, frame in enumerate(self.frames):
            p = os.path.join(self.out_dir, f"{self.name}_{i:05d}.ply")
            write_ply(p, frame)
            paths.append(p)
        return paths

    def write_dfc(self) -> str:
        """Packed binary trajectory cache (native DFC format)."""
        from dieselfluid_tpu.io import native

        path = os.path.join(self.out_dir, f"{self.name}.dfc")
        native.write_dfc(path, np.stack(self.frames))
        return path

    def write_video(self, fps: int = 30, fmt: str = "mp4") -> Optional[str]:
        if not self.images:
            return None
        import imageio.v2 as imageio

        path = os.path.join(self.out_dir, f"{self.name}.{fmt}")
        if fmt != "gif":
            try:
                imageio.mimwrite(path, self.images, fps=fps)
                return path
            except (ValueError, ImportError):
                # No ffmpeg/pyav backend in this environment — fall back to GIF.
                path = os.path.join(self.out_dir, f"{self.name}.gif")
        imageio.mimwrite(path, self.images, duration=1000.0 / fps)
        return path


def write_ply(path: str, positions: np.ndarray):
    """Binary little-endian PLY point cloud."""
    positions = np.asarray(positions, np.float32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(positions)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(positions.astype("<f4").tobytes())


def read_ply(path: str) -> np.ndarray:
    """Read back a PLY written by write_ply (for tests/round-trips)."""
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii")
    n = int([ln for ln in header.splitlines() if ln.startswith("element vertex")][0]
            .split()[-1])
    return np.frombuffer(data[head_end:head_end + n * 12], "<f4").reshape(n, 3).copy()
