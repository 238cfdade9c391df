#!/usr/bin/env python
"""RBF displacement-coupling fidelity study (VERDICT r2 #7) + deformed-
trace cost levers.

At the app's own ventricle mesh (61k tets): how accurately does the
M-center biharmonic RBF interpolant reproduce the FEM displacement field,
and what do M and the pull-back fixed-point iteration count cost in the
1080p deformed Pallas trace? Prints JSON lines:

  {"m": 128, "disp_err_max": ..., "disp_err_med": ..., "rel_max": ...}
  {"m": 128, "fp_iters": 2, "trace_ms": ..., "hit_err_max": ...,
   "hit_agree": ...}

hit_err is measured against the exact trilinear-embedding tracer
(render.deformed.trace_deformed) on a subsampled ray grid.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="ventricle")
    ap.add_argument("--cellsize", type=float, default=0.14)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.deformed import (
        build_disp_interp,
        disp_weights_centers,
        displacement_grid,
        sample_disp_rbf,
        trace_deformed,
        trace_deformed_rbf_fast,
    )
    from fembrain_tpu.render.sphere_trace import TraceParams

    on_tpu = jax.default_backend() == "tpu"

    sc = load_blob(f"/root/reference/data/models/blobtree/{args.scene}.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=args.cellsize)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    n_nodes = int(tm.n_nodes)
    nodes = np.asarray(tm.nodes)[:n_nodes]
    tets_np = np.asarray(tm.tets)[: int(tm.n_tets)]
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component
    fixed = bottom_nodes_per_component(nodes, tets_np, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    n2g = gfm.node_to_grid_index(tm)
    print(f"# nodes={n_nodes} grid={grid.dims}", flush=True)

    # One realistic gravity-sag step (grid FEM, warm solver).
    f_ext = np.zeros((int(np.prod(grid.dims)), 3), np.float32)
    f_ext[n2g, 1] = -500.0 * np.asarray(gf.mass).reshape(-1)[n2g]
    f_ext = jnp.asarray(f_ext.reshape(*grid.dims, 3))
    st = gf.rest_state()

    @jax.jit
    def settle(st):
        def body(st, _):
            return gfm.timestep(gf, st, f_ext)[0], None
        st, _ = jax.lax.scan(body, st, None, length=40)
        return st

    st = settle(st)
    q_grid = np.asarray(st.q).reshape(-1, 3)
    q_nodes = q_grid[n2g]                               # true u at nodes
    qmax = float(np.abs(q_nodes).max())
    print(f"# max|q| = {qmax:.4f} (cellsize {grid.cellsize})", flush=True)

    # ---- displacement reconstruction error vs M --------------------------
    pts = jnp.asarray(nodes)
    for m in (32, 64, 128, 256, 512):
        interp = build_disp_interp(nodes, n_centers=m, fixed=fixed)
        cgi = n2g[np.asarray(interp.center_nodes)]
        w = disp_weights_centers(interp, jnp.asarray(q_grid[cgi]))
        u = np.asarray(jax.jit(sample_disp_rbf)(interp, w, pts))
        err = np.linalg.norm(u - q_nodes, axis=-1)
        print(json.dumps({
            "m": m,
            "disp_err_max": round(float(err.max()), 6),
            "disp_err_med": round(float(np.median(err)), 6),
            "rel_max": round(float(err.max() / max(qmax, 1e-12)), 4),
        }), flush=True)

    # ---- hit error + trace cost vs (M, fp_iters) -------------------------
    width, height = (1920, 1080) if on_tpu else (96, 54)
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    params = TraceParams()

    # Ground truth: exact trilinear embedding on a subsampled ray set.
    sub = slice(0, ro.shape[0], max(1, ro.shape[0] // 4096))
    u_g = jax.jit(displacement_grid, static_argnums=0)(
        grid, tm.grid_to_node, jnp.asarray(q_nodes)
    )
    t_ref, hit_ref = jax.jit(
        lambda o, d: trace_deformed(scene, grid, u_g, o, d, params)
    )(ro[sub], rd[sub])
    t_ref, hit_ref = np.asarray(t_ref), np.asarray(hit_ref)

    for m in (64, 128, 256):
        interp = build_disp_interp(nodes, n_centers=m, fixed=fixed)
        cgi = n2g[np.asarray(interp.center_nodes)]
        w = disp_weights_centers(interp, jnp.asarray(q_grid[cgi]))
        for fp in (1, 2, 4):
            bound_pts = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])
            fn = jax.jit(lambda o, d, w=w, interp=interp, fp=fp:
                         trace_deformed_rbf_fast(
                             scene, interp, w, o, d, params,
                             image_hw=(height, width), fp_iters=fp,
                             interpret=not on_tpu, bound_pts=bound_pts))
            t, hit = fn(ro, rd)
            jax.block_until_ready(t)
            t0 = time.perf_counter()
            for _ in range(3):
                t, hit = fn(ro, rd)
            jax.block_until_ready(t)
            ms = (time.perf_counter() - t0) / 3 * 1e3
            tn, hn = np.asarray(t)[sub], np.asarray(hit)[sub]
            agree = float((hn == hit_ref).mean())
            both = hn & hit_ref
            herr = float(np.abs(tn[both] - t_ref[both]).max()) if both.any() else 0.0
            print(json.dumps({
                "m": m, "fp_iters": fp, "trace_ms": round(ms, 1),
                "hit_err_max": round(herr, 5),
                "hit_agree": round(agree, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
