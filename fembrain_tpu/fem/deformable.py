"""Deformable body orchestration: gravity, haptic ring forces, implicit
solve, ground-plane collision, and surface coupling.

Port of the reference `Deformable` node's per-frame loop
(src/deformable/Deformable.cpp:318-420) with the solver stack of
`syncForceModel` (:127-220), re-organized so the entire physics step is a
single jitted function over static-topology arrays.

Divergence note: the reference's collision response applies the normal-
velocity reflection to EVERY node each frame (Deformable.cpp:347-400);
here it is applied only to penetrating nodes (same constants: restitution
0.4, projection onto the plane), which is the evident intent.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import integrator as integ
from .corotational import element_kinematics, internal_forces
from .integrator import FemState
from .tetmesh import FemMesh

# Reference defaults: gravity -1e4 on y DOFs (Deformable.cpp:330-338),
# haptic neighborhood radius 5 rings (Deformable.h:41).
DEFAULT_GRAVITY = -10000.0
DEFAULT_HAPTIC_RADIUS = 5
GROUND_RESTITUTION = 0.4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepStats:
    cg_iters: jax.Array
    n_collided: jax.Array


def node_adjacency(tets: np.ndarray, n_nodes: int) -> list[np.ndarray]:
    """CSR-ish adjacency (list of neighbor arrays) from tet connectivity."""
    nbr: list[set] = [set() for _ in range(n_nodes)]
    for t in np.asarray(tets):
        for i in range(4):
            for j in range(4):
                if i != j:
                    nbr[t[i]].add(t[j])
    return [np.array(sorted(s), np.int32) for s in nbr]


def haptic_ring_forces(
    adjacency: list[np.ndarray],
    n_nodes: int,
    contact_idx: np.ndarray,
    contact_force: np.ndarray,
    radius: int = DEFAULT_HAPTIC_RADIUS,
) -> np.ndarray:
    """Propagate contact forces over BFS rings with linear falloff
    (reference Deformable::applyHapticForces, Deformable.cpp:634-706)."""
    f = np.zeros((n_nodes, 3))
    for idx, force in zip(np.asarray(contact_idx), np.asarray(contact_force)):
        dist = {int(idx): 0}
        frontier = [int(idx)]
        for ring in range(1, radius):
            nxt = []
            for u in frontier:
                for v in adjacency[u]:
                    v = int(v)
                    if v not in dist:
                        dist[v] = ring
                        nxt.append(v)
            frontier = nxt
            if not frontier:
                break
        for node, ring in dist.items():
            f[node] += force * (1.0 - ring / float(radius))
    return f


class Deformable:
    """Host-side handle around the jitted physics step (the analog of the
    reference's Deformable scene node)."""

    def __init__(
        self,
        mesh: FemMesh,
        h: float = integ.DEFAULT_TIMESTEP,
        gravity: float = DEFAULT_GRAVITY,
        ground_y: float | None = None,
        damping_mass: float = integ.DEFAULT_DAMPING_MASS,
        damping_stiffness: float = integ.DEFAULT_DAMPING_STIFFNESS,
        cg_max_iters: int = integ.CG_MAX_ITERS,
    ):
        self.mesh = mesh
        self.h = h
        self.state = FemState.rest(mesh)
        # Native adjacency core when available (native/femcore.cpp), the
        # pure-Python BFS otherwise.
        self._native_adj = None
        try:
            from ..native import NativeAdjacency

            self._native_adj = NativeAdjacency(
                np.asarray(mesh.tets), mesh.n_nodes
            )
            self.adjacency = None
        except Exception:
            self.adjacency = node_adjacency(np.asarray(mesh.tets), mesh.n_nodes)
        self._stats = None

        self._step = jax.jit(
            partial(
                step,
                h=h,
                gravity=gravity,
                ground_y=ground_y,
                damping_mass=damping_mass,
                damping_stiffness=damping_stiffness,
                cg_max_iters=cg_max_iters,
            )
        )

    def timestep(self, f_haptic: np.ndarray | None = None) -> FemState:
        f = (
            jnp.zeros_like(self.mesh.rest)
            if f_haptic is None
            else jnp.asarray(f_haptic, self.mesh.rest.dtype)
        )
        self.state, self._stats = self._step(self.mesh, self.state, f)
        return self.state

    def haptic_forces(self, contact_idx, contact_force, radius=DEFAULT_HAPTIC_RADIUS):
        if self._native_adj is not None:
            return self._native_adj.ring_forces(contact_idx, contact_force, radius)
        return haptic_ring_forces(
            self.adjacency, self.mesh.n_nodes, contact_idx, contact_force, radius
        )

    def reset(self) -> None:
        """Reference resetDeformations -> ResetToRest (Deformable.cpp:629-632)."""
        self.state = FemState.rest(self.mesh)

    @property
    def positions(self) -> jax.Array:
        return self.mesh.rest + self.state.q

    def stats(self) -> dict:
        s = self._stats
        if s is None:
            return {}
        return {
            "cg_iters": int(s.cg_iters),
            "n_collided": int(s.n_collided),
        }


def step(
    mesh: FemMesh,
    state: FemState,
    f_haptic: jax.Array,
    *,
    h: float,
    gravity: float,
    ground_y: float | None,
    damping_mass: float,
    damping_stiffness: float,
    cg_max_iters: int,
) -> tuple[FemState, StepStats]:
    """One full physics frame (pure function; jit-able)."""
    f_ext = f_haptic
    if gravity:
        g = jnp.zeros_like(f_ext).at[:, 1].set(gravity)
        f_ext = f_ext + g

    new_state, cg_iters = integ.timestep(
        mesh,
        state,
        f_ext,
        h=h,
        damping_mass=damping_mass,
        damping_stiffness=damping_stiffness,
        cg_max_iters=cg_max_iters,
    )

    n_collided = jnp.zeros((), jnp.int32)
    if ground_y is not None:
        q, v = new_state.q, new_state.qvel
        pos_y = mesh.rest[:, 1] + q[:, 1]
        pen = pos_y <= ground_y
        n_collided = jnp.sum(pen.astype(jnp.int32))
        # Project penetrating nodes to the plane; reflect+damp their
        # normal velocity (restitution 0.4, Deformable.cpp:372-396).
        q = q.at[:, 1].set(
            jnp.where(pen, ground_y - mesh.rest[:, 1], q[:, 1])
        )
        vy = jnp.where(pen, -GROUND_RESTITUTION * v[:, 1], v[:, 1])
        v = v.at[:, 1].set(vy)
        new_state = FemState(q=q, qvel=v, dv=new_state.dv)

    return new_state, StepStats(cg_iters=cg_iters, n_collided=n_collided)


def couple_surface_displacements(
    surface_edge_nodes: jax.Array,  # [V, 2] grid linear ids
    surface_edge_t: jax.Array,      # [V]
    grid_to_node: jax.Array,        # [G] tet-node id or -1
    u: jax.Array,                   # [N, 3] tet-node displacements
) -> jax.Array:
    """Barycentric transfer of FEM displacements onto polygonized surface
    vertices (replaces the reference's by-index ApplyVertexDeformations,
    OclPolygonizer.cpp:1543-1596 + Polygonizer.cl:1417-1426: each surface
    vertex lies on a tet edge at parameter t, so its displacement is the
    exact interpolation of the two incident node displacements)."""
    na = grid_to_node[surface_edge_nodes[:, 0]]
    nb = grid_to_node[surface_edge_nodes[:, 1]]
    ua = jnp.where(na[:, None] >= 0, u[jnp.maximum(na, 0)], 0.0)
    ub = jnp.where(nb[:, None] >= 0, u[jnp.maximum(nb, 0)], 0.0)
    t = surface_edge_t[:, None]
    return (1.0 - t) * ua + t * ub
