"""The north-star step as ONE multi-device SPMD program (VERDICT r2 #3):

    force -> partitioned-node FEM solve (halo exchange over the mesh axis)
          -> RBF displacement weights (replicated [M+4, 3] matmul)
          -> deformed Pallas trace (rays sharded over the same axis)

All inside a single jax.jit: the FEM stage shards NODES over the device
axis (fem.partitioned — per-CG-iteration communication is a boundary
halo ppermute), the glue gathers the M center-node displacement rows
(~KBs; XLA inserts the collective), the weights solve is replicated
(the [M+4, M+4] factor is tiny, broadcast is free), and the trace stage
shards RAYS over the same devices (render.pallas_trace.trace_pallas_sharded
— tiles are independent, no collectives). This is the composition the
BASELINE v5p-16 target names: FEM and rendering scale on the same slice.

Matches the per-frame coupling of the reference
(/root/reference/src/implicit/OclPolygonizer.cpp:1543-1596) distributed
the TPU way; semantics equal coupled_step_fast (tested).
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..blob.scene import Scene
from ..fem.partitioned import (
    NODE_AXIS,
    PartFemMesh,
    build_partitioned,
    partitioned_timestep,
    to_partition_order,
)
from .deformed import (
    DispInterp,
    FIXED_POINT_ITERS,
    build_disp_interp,
    disp_lipschitz,
    disp_slack,
    disp_weights_centers,
    trace_deformed_rbf,
    wendland_pallas_spec,
)
from .pallas_trace import trace_pallas_image_sharded, trace_pallas_sharded
from .sphere_trace import TraceParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CoupledSharded:
    """Static setup for the sharded coupled step on one FEM mesh."""
    pm: PartFemMesh
    interp: DispInterp
    center_slot: jax.Array  # [M] partition-order row of each RBF center


def build_coupled_sharded(nodes, tets, n_parts: int,
                          fixed=None, n_centers: int | None = None,
                          **material) -> CoupledSharded:
    """Partition the mesh and map the RBF centers into partition order
    (host-side, once per mesh topology)."""
    pm = build_partitioned(nodes, tets, n_parts, fixed=fixed, **material)
    fixed_idx = None if fixed is None else np.asarray(fixed)
    interp = build_disp_interp(nodes, n_centers=n_centers, fixed=fixed_idx)
    perm = np.asarray(pm.perm)           # partition slot -> original id
    slot_of = np.empty(pm.n_nodes, np.int64)
    slot_of[perm] = np.arange(pm.n_nodes)
    center_slot = slot_of[np.asarray(interp.center_nodes)]
    return CoupledSharded(
        pm=pm,
        interp=interp,
        center_slot=jnp.asarray(center_slot, jnp.int32),
    )


def disp_weights_from_partition(cs: CoupledSharded, q_p: jax.Array):
    """RBF weights from the partition-layout state [D, Nl, 3]: gather the
    M center rows (XLA inserts the cross-shard collective — M is ~1e2, so
    this is KBs) and apply the replicated factored solve."""
    u_c = q_p.reshape(-1, 3)[cs.center_slot]          # [M, 3]
    rhs = jnp.concatenate(
        [u_c, jnp.zeros((4, 3), q_p.dtype)], 0
    )
    return cs.interp.a_inv @ rhs                      # [M+4, 3]


def coupled_step_sharded(scene: Scene, cs: CoupledSharded,
                         device_mesh: Mesh,
                         q_p: jax.Array, qvel_p: jax.Array, dv_p: jax.Array,
                         f_ext_p: jax.Array,
                         ro: jax.Array, rd: jax.Array,
                         h: float = 0.0333,
                         params: TraceParams = TraceParams(),
                         image_hw: tuple[int, int] | None = None,
                         max_disp: float = 0.5,
                         fp_iters: int = FIXED_POINT_ITERS,
                         cg_tol: float | None = None,
                         differentiable: bool = False,
                         use_pallas: bool | None = None,
                         interpret: bool = False):
    """One sharded coupled frame. State arrays live in partition layout
    [D, Nl, 3] (fem.partitioned.to_partition_order); rays are global and
    shard internally. Returns (t, hit, (q', qvel', dv'), cg_iters).

    device_mesh must be 1-D with axis NODE_AXIS ('nodes') — the same
    devices carry node shards in the FEM stage and ray shards in the
    trace stage. differentiable=True routes both stages' implicit
    differentiation (custom_linear_solve FEM adjoint + hit implicit diff)
    so image losses reach material/primitive parameters across shards."""
    import jax as _jax

    kw = {} if cg_tol is None else {"cg_tol": cg_tol}
    q2, v2, dv2, iters = partitioned_timestep(
        cs.pm, device_mesh, q_p, qvel_p, f_ext_p, h=h, dv=dv_p,
        differentiable=differentiable, **kw,
    )
    w = disp_weights_from_partition(cs, q2)

    if use_pallas is None:
        use_pallas = _jax.default_backend() == "tpu"
    if use_pallas or interpret:
        shrink = jnp.clip(
            1.0 - jax.lax.stop_gradient(disp_lipschitz(cs.interp, w)),
            0.0, 1.0,
        )
        slack = jax.lax.stop_gradient(disp_slack(cs.interp, w))
        disp = (cs.interp.centers, w, shrink, slack, max_disp, fp_iters)
        if image_hw is not None:
            t, hit = trace_pallas_image_sharded(
                scene, ro, rd, image_hw[0], image_hw[1], device_mesh,
                axis=NODE_AXIS, params=params, interpret=interpret,
                disp=disp,
            )
        else:
            t, hit = trace_pallas_sharded(
                scene, ro, rd, device_mesh, axis=NODE_AXIS, params=params,
                interpret=interpret, disp=disp,
            )
        if differentiable:
            # The kernel is forward-only; recover exact gradients with the
            # implicit-diff correction against the XLA deformed field
            # (same scheme as trace_deformed_rbf_fast).
            from .deformed import deformed_field_rbf

            iso = params.iso
            lo = scene.bbox_lo - 0.05 - max_disp
            hi = scene.bbox_hi + 0.05 + max_disp
            base_step = jnp.linalg.norm(hi - lo) * params.step_frac
            t0 = jax.lax.stop_gradient(t)
            x0 = ro + t0[:, None] * rd

            def f_point(p):
                return deformed_field_rbf(
                    scene, cs.interp, w, p[None], fp_iters
                )[0]

            g = jax.vmap(jax.grad(f_point))(x0)
            dfdt = jnp.sum(g * rd, -1)
            dfdt = jax.lax.stop_gradient(
                jnp.where(jnp.abs(dfdt) < 1e-6,
                          jnp.where(dfdt < 0, -1e-6, 1e-6), dfdt)
            )
            f_at = deformed_field_rbf(scene, cs.interp, w, x0, fp_iters) - iso
            nudge = jnp.clip(f_at / dfdt, -0.5 * base_step, 0.5 * base_step)
            t = jnp.where(hit, t0 - nudge, t0)
    else:
        t, hit = trace_deformed_rbf(
            scene, cs.interp, w, ro, rd, params, max_disp=max_disp,
            fp_iters=fp_iters,
        )
    return t, hit, (q2, v2, dv2), iters


# --------------------------------------------------------------------------
# GRID-FEM sharded coupled step (round 4, VERDICT r3 #3): the PRODUCTION
# composition. The round-3 version above composes the unstructured
# partitioned solver (~415 CG iterations in the 8-way dryrun); this one
# runs the X-slab sharded GRID solver (fem.grid_sharded — stencil matvec,
# plane-halo ppermutes, multigrid preconditioner, ~50 iterations) under
# the same single jit as the sharded deformed trace.
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CoupledGridSharded:
    """Static setup for the grid-backed sharded coupled step."""
    sgf: object              # fem.grid_sharded.ShardedGridFem
    interp: DispInterp
    center_flat: jax.Array   # [M] index of each RBF center's grid vertex
                             #   in the flattened [D*Xl, Y, Z] shard layout


def build_coupled_grid_sharded(grid, tm, n_parts: int, fixed_nodes=None,
                               n_centers: int | None = None,
                               kernel: str = "wendland",
                               **material) -> CoupledGridSharded:
    """Host-side: build the X-slab sharded grid FEM plus the displacement
    interpolant, and map the RBF centers into the shard layout."""
    from ..fem import grid_fem as gfm
    from ..fem import grid_sharded as gsh

    sgf = gsh.build_sharded_grid_fem(
        grid, tm, n_parts, fixed_nodes=fixed_nodes, **material
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    interp = build_disp_interp(
        nodes, n_centers=n_centers, fixed=fixed_nodes, kernel=kernel
    )
    n2g = gfm.node_to_grid_index(tm)
    g = n2g[np.asarray(interp.center_nodes)]
    X, Y, Z = sgf.dims
    gx, gy, gz = g // (Y * Z), (g // Z) % Y, g % Z
    flat = (gx * Y + gy) * Z + gz  # == global flat == shard-layout flat
    # (the shard layout [D, Xl, Y, Z] flattens to [D*Xl, Y, Z] with
    # D*Xl >= X padded planes appended — global x-plane order preserved).
    return CoupledGridSharded(
        sgf=sgf, interp=interp,
        center_flat=jnp.asarray(flat, jnp.int32),
    )


def scale_grid_E(sgf, e_scale):
    """Scale the sharded grid FEM's Young's modulus (element stiffness is
    linear in E for fixed nu). Only the solve operator (local.ke) is
    scaled; the multigrid preconditioner stays at E=1 — that changes CG
    convergence slightly, never the solution (custom_linear_solve's
    adjoint likewise only needs the matvec to be correct)."""
    return dataclasses.replace(
        sgf,
        local=dataclasses.replace(sgf.local, ke=sgf.local.ke * e_scale),
    )


def coupled_step_grid_sharded(scene: Scene, cgs: CoupledGridSharded,
                              device_mesh: Mesh,
                              q, qvel, dv, f_ext,
                              ro: jax.Array, rd: jax.Array,
                              h: float = 0.0333,
                              E_scale=None,
                              params: TraceParams = TraceParams(),
                              image_hw: tuple[int, int] | None = None,
                              cg_tol: float | None = None,
                              differentiable: bool = False,
                              use_pallas: bool | None = None,
                              interpret: bool = False,
                              max_disp=None,
                              fp_iters: int = FIXED_POINT_ITERS):
    """One grid-backed sharded coupled frame: X-slab grid FEM solve ->
    replicated RBF weights (M-row cross-shard gather, ~KBs) -> deformed
    Pallas trace with rays sharded over the SAME devices, in one jitted
    SPMD program. State arrays live in shard layout [D, Xl, Y, Z, 3]
    (fem.grid_sharded.to_shard_layout). Returns
    (t, hit, (q', qvel', dv'), cg_iters).

    differentiable=True routes custom_linear_solve + implicit hit
    differentiation, so d(image loss)/d(E_scale) works across shards
    (matches the single-chip coupled_step_grid_fast semantics)."""
    from ..fem import grid_sharded as gsh

    sgf = cgs.sgf if E_scale is None else scale_grid_E(cgs.sgf, E_scale)
    kw = {} if cg_tol is None else {"cg_tol": cg_tol}
    q2, v2, dv2, iters = gsh.sharded_timestep(
        sgf, device_mesh, q, qvel, f_ext, h=h, dv=dv,
        differentiable=differentiable, **kw,
    )
    u_c = q2.reshape(-1, 3)[cgs.center_flat]          # [M, 3] tiny gather
    w = disp_weights_centers(cgs.interp, u_c)
    interp = cgs.interp

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas or interpret:
        if interp.kind == "wendland":
            disp = wendland_pallas_spec(
                interp, jax.lax.stop_gradient(w), max_disp, 1
            )
            md = disp.max_disp
        else:
            shrink = jnp.clip(
                1.0 - jax.lax.stop_gradient(disp_lipschitz(interp, w)),
                0.0, 1.0,
            )
            slack = jax.lax.stop_gradient(disp_slack(interp, w))
            md = 0.5 if max_disp is None else max_disp
            disp = (interp.centers, w, shrink, slack, md, fp_iters)
        if image_hw is not None:
            t, hit = trace_pallas_image_sharded(
                scene, ro, rd, image_hw[0], image_hw[1], device_mesh,
                axis=gsh.GRID_AXIS, params=params, interpret=interpret,
                disp=disp,
            )
        else:
            t, hit = trace_pallas_sharded(
                scene, ro, rd, device_mesh, axis=gsh.GRID_AXIS,
                params=params, interpret=interpret, disp=disp,
            )
        if differentiable:
            # Forward-only kernel: exact gradients via the implicit-diff
            # correction against the XLA deformed field (same scheme as
            # trace_deformed_rbf_fast).
            from .deformed import deformed_field_rbf

            iso = params.iso
            lo = scene.bbox_lo - 0.05 - md
            hi = scene.bbox_hi + 0.05 + md
            base_step = jnp.linalg.norm(hi - lo) * params.step_frac
            t0 = jax.lax.stop_gradient(t)
            x0 = ro + t0[:, None] * rd

            def f_point(p):
                return deformed_field_rbf(
                    scene, interp, w, p[None], fp_iters
                )[0]

            g = jax.vmap(jax.grad(f_point))(x0)
            dfdt = jnp.sum(g * rd, -1)
            dfdt = jax.lax.stop_gradient(
                jnp.where(jnp.abs(dfdt) < 1e-6,
                          jnp.where(dfdt < 0, -1e-6, 1e-6), dfdt)
            )
            f_at = deformed_field_rbf(scene, interp, w, x0, fp_iters) - iso
            nudge = jnp.clip(f_at / dfdt, -0.5 * base_step, 0.5 * base_step)
            t = jnp.where(hit, t0 - nudge, t0)
    else:
        t, hit = trace_deformed_rbf(
            scene, interp, w, ro, rd, params,
            max_disp=0.5 if max_disp is None else max_disp,
            fp_iters=fp_iters,
        )
    return t, hit, (q2, v2, dv2), iters
