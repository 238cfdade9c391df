#!/usr/bin/env python
"""Round-5 quantitative scaling/efficiency evidence (VERDICT r4 #5):

(a) per-CG-iteration / per-frame communication accounting for the
    sharded grid FEM (analytic, from slab dims — the same model
    tests/test_comm_volume.py asserts against compiled HLO),
(b) achieved-FLOP/roofline estimates for the two hot kernels on the
    real chip: the Pallas trace march and the grid stencil matvec,
(c) an AOT lower().compile() of the SHARDED coupled step against an
    8-device TPU topology, proving the production SPMD program
    compiles for a real slice without the hardware.

Appends JSON lines suitable for SCALING_r05.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def comm_accounting(out):
    """(a) analytic per-iteration comm volume at app scale (ventricle
    0.14 grid, 8 slabs) — the model pinned against compiled HLO by
    tests/test_comm_volume.py on the CPU mesh."""
    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem import grid_sharded as gsh
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene

    sc = load_blob("/root/reference/data/models/blobtree/ventricle.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=0.14)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    fixed = np.where(nodes[:, 1] < nodes[:, 1].min() + 1e-3)[0]
    D = 8
    sgf = gsh.build_sharded_grid_fem(grid, tm, D, fixed_nodes=fixed)
    X, Y, Z = sgf.dims
    lvl1 = sgf.gfull.levels[1].dims
    plane_b = Y * Z * 3 * 4                       # one vertex plane, f32
    coarse_b = 3 * int(np.prod(lvl1)) * 4         # level-1 residual
    fine_b = 3 * X * Y * Z * 4
    per_iter = {
        "matvec_ppermute_bytes": 2 * plane_b,
        "precond_ppermute_bytes": 5 * plane_b,    # 2x lin_mv + restrict
        "precond_allgather_bytes": coarse_b,      # per-device receive
        "dot_allreduce_bytes": 3 * 4,
        "total_bytes": 7 * plane_b + coarse_b + 12,
    }
    rec = {
        "stage": "comm_accounting",
        "scene": "ventricle",
        "grid_dims": [int(X), int(Y), int(Z)],
        "shards": D,
        "fine_state_bytes": fine_b,
        "per_cg_iteration": per_iter,
        "per_frame_bytes_at_20_iters": 20 * per_iter["total_bytes"],
        "fraction_of_fine_state_per_iter": round(
            per_iter["total_bytes"] / fine_b, 4
        ),
        "note": (
            "boundary-surface traffic: every ppermute moves ONE vertex "
            "plane; the hybrid MG all_gather moves the level-1 "
            "(1/8-size) residual only — asserted against compiled HLO "
            "in tests/test_comm_volume.py"
        ),
    }
    print(json.dumps(rec), file=out, flush=True)


def trace_mfu(out):
    """(b1) trace-kernel achieved FLOP/s from the march's own
    statistics: live tiles x evals (DEBUG_MARCH_ITERS) x the analytic
    per-eval cost of the unconditional 3-block ventricle field (each
    [8, 2048] block: 3x(4mul+3add) local transform + ~10 distance +
    ~5 kernel ops + sum ~ 37 flops/elem)."""
    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.render import pallas_trace as pt
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.sphere_trace import TraceParams

    sc = load_blob("/root/reference/data/models/blobtree/ventricle.blob")
    sc.flatten_instances()
    scene = sc.pack()
    W, H = 1920, 1080
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, W, H)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    params = TraceParams()

    pt.DEBUG_MARCH_ITERS = True
    it = np.asarray(jax.jit(
        lambda: pt.trace_pallas_image(scene, ro, rd, H, W, params)[0]
    )()).reshape(-1)
    pt.DEBUG_MARCH_ITERS = False
    tiles_live = int((it > 0).sum() // pt.TILE)
    evals = 2.0 * it[it > 0][:: pt.TILE].astype(np.float64)
    total_evals = float(evals.sum()) + tiles_live * (
        1 + params.bisect_steps
    )

    n = 30

    @jax.jit
    def frames(o, d):
        def body(acc, _):
            t = pt.trace_pallas_image(scene, o + acc * 1e-30, d,
                                      H, W, params)[0]
            return jnp.sum(t), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return acc

    float(frames(ro, rd))
    t0 = time.perf_counter()
    float(frames(ro, rd))
    ms = (time.perf_counter() - t0) / n * 1e3

    n_blocks = 3  # real prim blocks on the 17-prim ventricle
    flop_per_eval = n_blocks * 8 * pt.TILE * 37
    gflop = total_evals * flop_per_eval / 1e9
    gflops = gflop / (ms / 1e3)
    # v5e VPU f32 ceiling estimate: 8x128 lanes x 4 ALUs x 2 (FMA)
    # x 0.94 GHz ~ 7.7 TFLOP/s (the MXU's 197 bf16 TFLOPs do not apply:
    # the march is elementwise VPU work by design — see pallas_trace
    # cb_add note on why tiny matmuls lose).
    rec = {
        "stage": "trace_kernel_roofline",
        "scene": "ventricle",
        "frame_ms_chain30": round(ms, 2),
        "live_tiles": tiles_live,
        "evals_total": int(total_evals),
        "model_gflop_per_frame": round(gflop, 2),
        "achieved_gflops": round(gflops, 1),
        "vpu_f32_ceiling_gflops_est": 7700,
        "vpu_utilization_est": round(gflops / 7700, 3),
        "note": (
            "VMEM-resident kernel: per-iteration HBM traffic ~ 0, so "
            "the march is compute-bound (arithmetic intensity far "
            "right of the ~60 FLOP/B v5e ridge); the gap to ceiling "
            "is tile early-exit imbalance + non-FLOP march logic "
            "(bounds, masks, while/cond overhead), counted as 0 FLOPs "
            "in this model"
        ),
    }
    print(json.dumps(rec), file=out, flush=True)


def matvec_mfu(out):
    """(b2) grid stencil matvec achieved FLOP/s: time N applications of
    the rotated stiffness apply on the ventricle grid; FLOP model per
    tet: 2 rotations (2 x 4 nodes x 15) + 12x12 element matvec (276)
    + scatter adds (12) ~ 408; 6 tets per grid cell (dense — padding
    cells compute too, matching what the chip actually does)."""
    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene

    sc = load_blob("/root/reference/data/models/blobtree/ventricle.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=0.14)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    fixed = np.where(nodes[:, 1] < nodes[:, 1].min() + 1e-3)[0]
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    q0 = gf.rest_state().q
    R = gfm.kinematics(gf, q0)
    v0 = jnp.ones_like(q0)
    N_IT = 200

    @jax.jit
    def loop(v):
        def body(_, v):
            return gfm.stiffness_apply_rot(gf, R, v) * 0.9999
        return jax.lax.fori_loop(0, N_IT, body, v)

    jax.block_until_ready(loop(v0))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(v0))
    us = (time.perf_counter() - t0) / N_IT * 1e6

    X, Y, Z = gf.dims
    cells = (X - 1) * (Y - 1) * (Z - 1)
    flop = cells * 6 * 408
    gflops = flop / (us * 1e-6) / 1e9
    state_b = 3 * X * Y * Z * 4
    # HBM traffic per apply ~ read v + R (9/tet) + write out; the
    # stencil is fused by XLA so intermediates stay on-chip.
    traffic = state_b * 2 + cells * 6 * 9 * 4
    rec = {
        "stage": "grid_matvec_roofline",
        "scene": "ventricle",
        "grid_dims": [int(X), int(Y), int(Z)],
        "us_per_apply": round(us, 1),
        "model_mflop_per_apply": round(flop / 1e6, 1),
        "achieved_gflops": round(gflops, 1),
        "arith_intensity_flop_per_byte": round(flop / traffic, 1),
        "hbm_bound_ceiling_gflops": round(819 * flop / traffic, 0),
        "note": (
            "at this 20K-cell grid the apply sits far below BOTH "
            "rooflines (bandwidth ceiling at 10 FLOP/B ~ 8.3 TFLOP/s, "
            "VPU ~ 7.7): the per-apply cost is occupancy/fusion-"
            "overhead dominated at small dims — larger grids amortize "
            "it, and solver wall time is governed by CG iteration "
            "count (the multigrid preconditioner), not matvec FLOP/s"
        ),
    }
    print(json.dumps(rec), file=out, flush=True)


def aot_compile(out):
    """(c) AOT-compile the sharded coupled FEM step for an 8-device TPU
    topology (no multi-chip hardware needed): proves the production
    SPMD program lowers + compiles for a real slice."""
    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem import grid_sharded as gsh
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from jax.sharding import Mesh

    rec = {"stage": "aot_sharded_compile", "devices": 8}
    try:
        from jax.experimental import topologies

        topo = None
        errs = []
        for name in ("v5e:2x4", "v5e:1x8", "v5litepod-8", "v4:2x2x1"):
            try:
                topo = topologies.get_topology_desc(name, "tpu")
                rec["topology"] = name
                break
            except Exception as te:  # noqa: BLE001
                errs.append(f"{name}: {te}")
                continue
        if topo is None:
            raise RuntimeError(
                "no TPU topology descriptor available: " + "; ".join(errs)[:400]
            )
        devs = np.array(topo.devices[:8])
    except Exception as e:  # noqa: BLE001
        rec["topology_error"] = f"{type(e).__name__}: {e}"
        devs = None

    sc = load_blob("/root/reference/data/models/blobtree/sphere.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=0.3)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    fixed = np.where(nodes[:, 1] < nodes[:, 1].min() + 1e-3)[0]
    D = 8
    sgf = gsh.build_sharded_grid_fem(grid, tm, D, fixed_nodes=fixed)
    Xl = sgf.local.dims[0] - 1
    _, Y, Z = sgf.dims

    def run(mesh):
        def step(q, qvel, f_ext, dv):
            return gsh.sharded_timestep(
                sgf, mesh, q, qvel, f_ext, dv=dv
            )[0]

        z = jax.ShapeDtypeStruct((D, Xl, Y, Z, 3), jnp.float32)
        lowered = jax.jit(step).lower(z, z, z, z)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        rec["compile_s"] = round(time.perf_counter() - t0, 1)
        rec["flops_estimate"] = compiled.cost_analysis().get(
            "flops", None
        ) if compiled.cost_analysis() else None
        rec["ok"] = True

    try:
        if devs is not None:
            run(Mesh(devs.reshape(D), (gsh.GRID_AXIS,)))
        else:
            raise RuntimeError("fall back to abstract mesh")
    except Exception as e:  # noqa: BLE001
        try:
            from jax.sharding import AbstractMesh

            amesh = AbstractMesh((D,), (gsh.GRID_AXIS,))
            def step(q, qvel, f_ext, dv):
                return gsh.sharded_timestep(
                    sgf, amesh, q, qvel, f_ext, dv=dv
                )[0]
            z = jax.ShapeDtypeStruct((D, Xl, Y, Z, 3), jnp.float32)
            jax.jit(step).lower(z, z, z, z)
            rec["ok"] = "lowered_only"
            rec["compile_error"] = f"{type(e).__name__}: {e}"
        except Exception as e2:  # noqa: BLE001
            rec["ok"] = False
            rec["error"] = f"{type(e2).__name__}: {e2}"
    print(json.dumps(rec), file=out, flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    out = open(out_path, "a") if out_path else sys.stdout
    comm_accounting(out)
    trace_mfu(out)
    matvec_mfu(out)
    aot_compile(out)


if __name__ == "__main__":
    main()
