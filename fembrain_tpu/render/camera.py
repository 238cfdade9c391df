"""Cameras: orbiting arcball (reference src/graphics/ArcBallCamera.h:19,
persisted in `.sim` [CAMERA] sections) and pinhole ray generation for the
sphere tracer."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Reference defaults (src/settings.h:19-23).
DEFAULT_FOVY_DEG = 45.0
DEFAULT_ZNEAR = 0.01
DEFAULT_ZFAR = 100.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera; all fields are arrays so poses are differentiable."""

    eye: jax.Array      # [3]
    target: jax.Array   # [3]
    up: jax.Array       # [3]
    fovy_deg: jax.Array  # scalar

    @classmethod
    def make(cls, eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
             fovy_deg=DEFAULT_FOVY_DEG) -> "Camera":
        return cls(
            eye=jnp.asarray(eye, jnp.float32),
            target=jnp.asarray(target, jnp.float32),
            up=jnp.asarray(up, jnp.float32),
            fovy_deg=jnp.asarray(fovy_deg, jnp.float32),
        )

    @classmethod
    def orbit(cls, roll_deg: float, tilt_deg: float, zoom: float,
              target=(0.0, 0.0, 0.0)) -> "Camera":
        """Arcball pose (reference ArcBallCamera roll/tilt/zoom orbit)."""
        r = np.deg2rad(roll_deg)
        t = np.deg2rad(tilt_deg)
        eye = np.array(
            [
                zoom * np.cos(t) * np.sin(r),
                zoom * np.sin(t),
                zoom * np.cos(t) * np.cos(r),
            ]
        ) + np.asarray(target)
        return cls.make(eye, target=target)


def generate_rays(cam: Camera, width: int, height: int):
    """Ray origins/directions for a W x H image: ([H,W,3], [H,W,3]).

    Pixel centers, y-down image convention, right-handed look-at basis.
    """
    fwd = cam.target - cam.eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, cam.up)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)

    aspect = width / height
    tan_half = jnp.tan(jnp.deg2rad(cam.fovy_deg) * 0.5)
    ys = (0.5 - (jnp.arange(height) + 0.5) / height) * 2.0 * tan_half
    xs = ((jnp.arange(width) + 0.5) / width - 0.5) * 2.0 * tan_half * aspect
    dirs = (
        fwd[None, None, :]
        + xs[None, :, None] * right[None, None, :]
        + ys[:, None, None] * up[None, None, :]
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam.eye, dirs.shape)
    return origins, dirs
