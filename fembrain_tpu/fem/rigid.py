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


# --------------------------------------------------------------- rotation
#
# Round 4 (VERDICT r3 missing #1): full 6-DOF rigid dynamics. The
# reference's Bullet environment integrates its falling cube's
# ORIENTATION (/root/reference/src/main.cpp:685-712,863-870 via
# SGBulletRigidMesh); the translation-only box above was the one declared
# behavioral gap left in the environment layer. Quaternion state + box
# inertia tensor + torque from corner/tissue contacts, all jit-able.

def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, (w, x, y, z) convention."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_to_mat(q: jax.Array) -> jax.Array:
    """[3, 3] rotation matrix of a unit quaternion (w, x, y, z)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def box_inertia(mass: float, half_extents) -> jax.Array:
    """Body-frame inertia diagonal of a solid box."""
    he = jnp.asarray(half_extents)
    a, b, c = 2 * he[0], 2 * he[1], 2 * he[2]
    return (mass / 12.0) * jnp.asarray(
        [b * b + c * c, a * a + c * c, a * a + b * b]
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidBody6State:
    pos: jax.Array    # [3] center of mass
    vel: jax.Array    # [3]
    quat: jax.Array   # [4] orientation (w, x, y, z), unit
    omega: jax.Array  # [3] world-frame angular velocity

    @classmethod
    def at_rest(cls, pos, quat=(1.0, 0.0, 0.0, 0.0),
                omega=(0.0, 0.0, 0.0)):
        p = jnp.asarray(pos, jnp.float32)
        return cls(pos=p, vel=jnp.zeros_like(p),
                   quat=jnp.asarray(quat, jnp.float32),
                   omega=jnp.asarray(omega, jnp.float32))


_CORNER_SIGNS = jnp.asarray(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)]
)


def box_tissue_forces_6dof(
    state: RigidBody6State,
    half_extents,
    node_pos: jax.Array,
    stiffness: float = CONTACT_STIFFNESS,
    node_vel: jax.Array | None = None,
    damping: float = 0.0,
):
    """Oriented-box penalty contact: nodes are transformed into the box
    frame, pushed out along the minimal-penetration local axis; the box
    receives the opposite force AND the torque r x F about its center.
    Returns (f_nodes [N,3], f_box [3], tau_box [3])."""
    he = jnp.asarray(half_extents)
    R = quat_to_mat(state.quat)
    d_world = node_pos - state.pos[None]
    d = d_world @ R                              # into box frame (R^T d)
    pen = he[None] - jnp.abs(d)
    inside = jnp.all(pen > 0.0, axis=1)
    axis = jnp.argmin(pen, axis=1)
    sign = jnp.sign(jnp.take_along_axis(d, axis[:, None], 1))[:, 0]
    depth = jnp.take_along_axis(pen, axis[:, None], 1)[:, 0]
    mag = stiffness * depth
    if damping and node_vel is not None:
        # contact-point velocity of the box: v + omega x r
        v_box = state.vel[None] + jnp.cross(
            state.omega[None], d_world
        )
        rel = node_vel - v_box
        n_world = sign[:, None] * R[:, :].T[axis]   # local axis -> world
        out_rel = jnp.sum(rel * n_world, -1)
        mag = mag - damping * out_rel
    count = jnp.maximum(jnp.sum(inside.astype(mag.dtype)), 1.0)
    mag = jnp.where(inside, jnp.maximum(mag, 0.0) / count, 0.0)
    # force on the node along the outward local axis, in world frame
    n_world = R.T[axis] * sign[:, None]          # [N, 3]
    f_nodes = mag[:, None] * n_world
    f_box = -jnp.sum(f_nodes, axis=0)
    tau_box = -jnp.sum(jnp.cross(d_world, f_nodes), axis=0)
    return f_nodes, f_box, tau_box


def rigid_step_6dof(
    state: RigidBody6State,
    half_extents,
    mass: float,
    h: float,
    f_ext: jax.Array | None = None,
    tau_ext: jax.Array | None = None,
    ground_y: float | None = None,
    ground_stiffness: float = CONTACT_STIFFNESS,
    gravity: float = GRAVITY_Y,
) -> RigidBody6State:
    """Symplectic-Euler 6-DOF step. The floor is a penalty on the 8 box
    corners (each penetrating corner contributes a vertical spring +
    critical damping force AND its torque about the center — this is what
    makes a tumbling box settle flat, matching the Bullet cube's visible
    behavior). Gyroscopic term integrated explicitly; quaternion update
    q' = q + (h/2) omega*q, renormalized."""
    he = jnp.asarray(half_extents)
    f = jnp.asarray([0.0, gravity * mass, 0.0])
    tau = jnp.zeros(3)
    if f_ext is not None:
        f = f + f_ext
    if tau_ext is not None:
        tau = tau + tau_ext
    R = quat_to_mat(state.quat)
    if ground_y is not None:
        corners_r = (_CORNER_SIGNS * he[None]) @ R.T       # [8, 3] world
        corners = state.pos[None] + corners_r
        depth = jnp.maximum(ground_y - corners[:, 1], 0.0)  # [8]
        v_c = state.vel[None] + jnp.cross(state.omega[None], corners_r)
        damp = 2.0 * (ground_stiffness * mass) ** 0.5
        fy = jnp.where(
            depth > 0,
            ground_stiffness * depth - damp * v_c[:, 1],
            0.0,
        )
        # Normalize by the penetrating-corner count (same scheme as
        # box_tissue_forces): the effective interface stiffness/damping
        # must not scale with how many corners touch — a face resting
        # flat (4 corners) would otherwise see 4x k_eff and a stability
        # margin 2x tighter than the per-corner analysis (ADVICE r4 #3).
        n_pen = jnp.maximum(jnp.sum((depth > 0).astype(fy.dtype)), 1.0)
        fy = jnp.maximum(fy, 0.0) / n_pen
        fc = jnp.stack(
            [jnp.zeros_like(fy), fy, jnp.zeros_like(fy)], -1
        )                                                   # [8, 3]
        f = f + jnp.sum(fc, 0)
        tau = tau + jnp.sum(jnp.cross(corners_r, fc), 0)
    ib = box_inertia(mass, he)                              # body diagonal
    i_w = R @ jnp.diag(ib) @ R.T
    i_w_inv = R @ jnp.diag(1.0 / ib) @ R.T
    om = state.omega
    om_dot = i_w_inv @ (tau - jnp.cross(om, i_w @ om))
    om2 = om + h * om_dot
    vel = state.vel + (h / mass) * f
    pos = state.pos + h * vel
    dq = 0.5 * h * quat_mul(
        jnp.concatenate([jnp.zeros(1), om2]), state.quat
    )
    quat = state.quat + dq
    quat = quat / jnp.linalg.norm(quat)
    return RigidBody6State(pos=pos, vel=vel, quat=quat, omega=om2)


def coupled_box_tissue_step_6dof(
    box: RigidBody6State,
    half_extents,
    box_mass: float,
    fem_mesh,
    fem_state,
    h: float,
    ground_y: float | None = None,
    tissue_gravity: float = 0.0,
    stiffness: float = CONTACT_STIFFNESS,
):
    """6-DOF variant of coupled_box_tissue_step: off-center tissue
    contacts torque the box (it tumbles), the tissue feels the oriented
    contact forces. Returns (box', fem_state', cg_iters)."""
    from . import integrator as integ

    node_pos = fem_mesh.rest + fem_state.q
    damping = 2.0 * (stiffness * box_mass) ** 0.5
    f_nodes, f_box, tau_box = box_tissue_forces_6dof(
        box, half_extents, node_pos, stiffness,
        node_vel=fem_state.qvel, damping=damping,
    )
    if tissue_gravity:
        f_nodes = f_nodes.at[:, 1].add(tissue_gravity * fem_mesh.mass)
    fem_state, iters = integ.timestep(fem_mesh, fem_state, f_nodes, h=h)
    box = rigid_step_6dof(
        box, half_extents, box_mass, h, f_ext=f_box, tau_ext=tau_box,
        ground_y=ground_y,
    )
    return box, fem_state, iters
