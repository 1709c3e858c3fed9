"""Domain math jnp lacks: quaternions, polar coords, transforms, rays.

jnp arrays replace the reference's Vec/Mat types wholesale (SURVEY.md §7.1);
only the domain-specific pieces are implemented here, all batch-vectorized.
"""

from dieselfluid_tpu.mathx import quaternion, polar, transforms, ray  # noqa: F401

DEG2RAD = 0.01745329251994444444
RAD2DEG = 57.2957795130823158
PI = 3.141592653589
EPSILON = 0.00000001


def clamp1f(x, lo, hi):
    """ref: math/common/utility.go Clamp1f."""
    import jax.numpy as jnp

    return jnp.clip(x, lo, hi)
