"""Mass-spring system (reference `MassSpringSystem` / SpringDumble demo,
src/deformable/MassSpringSystem.h:15-50): point masses + Hookean springs
with symplectic Euler integration, vectorized over springs."""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MassSpring:
    pos: jax.Array        # [N, 3]
    vel: jax.Array        # [N, 3]
    mass: jax.Array       # [N]
    springs: jax.Array    # [S, 2] endpoint indices
    rest_len: jax.Array   # [S]
    k: jax.Array          # [S] stiffness
    fixed: jax.Array      # [N] bool


def make_dumbbell(separation=2.0, k=50.0, mass=1.0) -> MassSpring:
    """The reference's two-mass SpringDumble."""
    pos = np.array([[-separation / 2, 0, 0], [separation / 2, 0, 0]])
    return MassSpring(
        pos=jnp.asarray(pos, jnp.float32),
        vel=jnp.zeros((2, 3), jnp.float32),
        mass=jnp.full(2, mass, jnp.float32),
        springs=jnp.asarray([[0, 1]], jnp.int32),
        rest_len=jnp.asarray([separation], jnp.float32),
        k=jnp.asarray([k], jnp.float32),
        fixed=jnp.zeros(2, bool),
    )


@partial(jax.jit, static_argnames=())
def step_mass_spring(ms: MassSpring, dt: float = 1 / 60,
                     gravity: float = 0.0, damping: float = 0.02) -> MassSpring:
    a = ms.pos[ms.springs[:, 0]]
    b = ms.pos[ms.springs[:, 1]]
    d = b - a
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dirn = d / jnp.maximum(length, 1e-12)
    fs = ms.k[:, None] * (length - ms.rest_len[:, None]) * dirn  # on a, toward b
    force = jnp.zeros_like(ms.pos)
    force = force.at[ms.springs[:, 0]].add(fs)
    force = force.at[ms.springs[:, 1]].add(-fs)
    force = force + jnp.array([0.0, gravity, 0.0]) * ms.mass[:, None]
    acc = force / ms.mass[:, None]
    vel = (ms.vel + dt * acc) * (1.0 - damping)
    vel = jnp.where(ms.fixed[:, None], 0.0, vel)
    pos = ms.pos + dt * vel
    return dataclasses.replace(ms, pos=pos, vel=vel)
