"""Minimal rigid environment: a falling box vs floor and soft tissue.

The reference stages its demo inside a Bullet soft/rigid world — a ground
plane and a falling cube interacting with the tissue
(/root/reference/src/main.cpp:685-712,863-870 via SGBulletRigidMesh /
SGBulletSoftRigidDynamics). Bullet itself is out of scope (SURVEY §2.7);
this module closes the visible behavioral gap with a TPU-friendly
penalty-contact rigid box: translation-only dynamics (the demo cube never
needs torque response), analytic floor contact, and symmetric
penalty coupling against FEM tissue nodes — the box pushes contacted
nodes, the nodes push back, both inside one jitted step.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

GRAVITY_Y = -10.0  # m/s^2 on the rigid body (reference world gravity)
RESTITUTION = 0.2
CONTACT_STIFFNESS = 2e4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidBoxState:
    pos: jax.Array  # [3] box center
    vel: jax.Array  # [3]

    @classmethod
    def at_rest(cls, pos):
        p = jnp.asarray(pos, jnp.float32)
        return cls(pos=p, vel=jnp.zeros_like(p))


def box_tissue_forces(
    box_pos: jax.Array,
    half_extents: jax.Array,
    node_pos: jax.Array,          # [N, 3] current tissue node positions
    stiffness: float = CONTACT_STIFFNESS,
    box_vel: jax.Array | None = None,
    node_vel: jax.Array | None = None,
    damping: float = 0.0,
):
    """Symmetric penalty contact: tissue nodes inside the (axis-aligned)
    box are pushed out along their minimal-penetration axis; the box
    receives the opposite reaction. Optional velocity damping along the
    contact axis stabilizes the explicit rigid integration (a stiff
    undamped penalty pumps energy at h*omega > 2).
    Returns (f_nodes [N,3], f_box [3])."""
    he = jnp.asarray(half_extents)
    d = node_pos - box_pos[None]
    pen = he[None] - jnp.abs(d)                 # [N,3] per-axis penetration
    inside = jnp.all(pen > 0.0, axis=1)         # [N]
    # Minimal-penetration axis per node.
    axis = jnp.argmin(pen, axis=1)              # [N]
    sign = jnp.sign(jnp.take_along_axis(d, axis[:, None], 1))[:, 0]
    depth = jnp.take_along_axis(pen, axis[:, None], 1)[:, 0]
    mag = stiffness * depth
    if damping and box_vel is not None and node_vel is not None:
        rel = node_vel - box_vel[None]          # [N,3]
        out_rel = sign * jnp.take_along_axis(rel, axis[:, None], 1)[:, 0]
        mag = mag - damping * out_rel           # oppose separation rate
    # Normalize by contact count: stiffness/damping parameterize the
    # TOTAL box-tissue interface, not per node — otherwise the effective
    # spring scales with mesh resolution and detonates the explicit box.
    count = jnp.maximum(jnp.sum(inside.astype(mag.dtype)), 1.0)
    mag = jnp.where(inside, jnp.maximum(mag, 0.0) / count, 0.0)
    f_nodes = jnp.zeros_like(node_pos)
    f_nodes = f_nodes.at[jnp.arange(node_pos.shape[0]), axis].add(
        sign * mag
    )
    f_box = -jnp.sum(f_nodes, axis=0)
    return f_nodes, f_box


def rigid_step(
    state: RigidBoxState,
    half_extents,
    mass: float,
    h: float,
    f_ext: jax.Array | None = None,
    ground_y: float | None = None,
    gravity: float = GRAVITY_Y,
    restitution: float = RESTITUTION,
) -> RigidBoxState:
    """Symplectic-Euler step with analytic floor response (the projection
    + velocity damping the reference applies in lieu of a full solver,
    Deformable.cpp:372-396 style, here for the rigid body)."""
    he = jnp.asarray(half_extents)
    f = jnp.asarray([0.0, gravity * mass, 0.0])
    if f_ext is not None:
        f = f + f_ext
    vel = state.vel + (h / mass) * f
    pos = state.pos + h * vel
    if ground_y is not None:
        bottom = pos[1] - he[1]
        pen = bottom < ground_y
        pos = pos.at[1].set(
            jnp.where(pen, ground_y + he[1], pos[1])
        )
        vel = vel.at[1].set(
            jnp.where(pen & (vel[1] < 0), -restitution * vel[1], vel[1])
        )
    return RigidBoxState(pos=pos, vel=vel)


def coupled_box_tissue_step(
    box: RigidBoxState,
    half_extents,
    box_mass: float,
    fem_mesh,
    fem_state,
    h: float,
    ground_y: float | None = None,
    tissue_gravity: float = 0.0,
    stiffness: float = CONTACT_STIFFNESS,
):
    """One frame of the reference demo loop: box falls, contacts tissue,
    tissue deforms (implicit FEM), box feels the reaction. Pure and
    jit-able. Returns (box', fem_state', cg_iters)."""
    from . import integrator as integ

    node_pos = fem_mesh.rest + fem_state.q
    # Damping ~ critical for the box-on-contact oscillator keeps the
    # explicit rigid update stable against the stiff penalty.
    damping = 2.0 * (stiffness * box_mass) ** 0.5
    f_nodes, f_box = box_tissue_forces(
        box.pos, half_extents, node_pos, stiffness,
        box_vel=box.vel, node_vel=fem_state.qvel, damping=damping,
    )
    if tissue_gravity:
        f_nodes = f_nodes.at[:, 1].add(tissue_gravity * fem_mesh.mass)
    fem_state, iters = integ.timestep(fem_mesh, fem_state, f_nodes, h=h)
    box = rigid_step(
        box, half_extents, box_mass, h, f_ext=f_box, ground_y=ground_y
    )
    return box, fem_state, iters
