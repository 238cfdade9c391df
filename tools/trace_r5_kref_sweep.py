#!/usr/bin/env python
"""Round-5: K_REFRESH sweep — deformed-trace cost vs fidelity on the
bench ventricle config (oracle: exact trilinear-embedding tracer)."""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.fem import grid_fem as gfm
from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
from fembrain_tpu.mesh.samples import bottom_nodes_per_component
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render import pallas_trace as pt
from fembrain_tpu.render.deformed import (
    build_disp_interp,
    disp_weights,
    displacement_grid,
    trace_deformed,
    trace_deformed_rbf_fast,
)
from fembrain_tpu.render.sphere_trace import TraceParams


def main(name="ventricle", cellsize=0.14, width=1920, height=1080):
    sc = load_blob(f"/root/reference/data/models/blobtree/{name}.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=cellsize)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    tets = np.asarray(tm.tets)[: int(tm.n_tets)]
    fixed = bottom_nodes_per_component(nodes, tets, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    interp = build_disp_interp(nodes, n_centers=256, fixed=fixed,
                               kernel="wendland", sigma_fill=2.5)
    n2g = gfm.node_to_grid_index(tm)
    f_ext = np.zeros((int(np.prod(grid.dims)), 3), np.float32)
    f_ext[n2g, 1] = -500.0 * np.asarray(gf.mass).reshape(-1)[n2g]
    f_ext = jnp.asarray(f_ext.reshape(*grid.dims, 3))

    @jax.jit
    def settle(st):
        def body(st, _):
            st2, _ = gfm.timestep(gf, st, f_ext)
            return st2, None
        st, _ = jax.lax.scan(body, st, None, length=40)
        return st

    st0 = settle(gf.rest_state())
    st1, _ = jax.jit(lambda s: gfm.timestep(gf, s, f_ext, cg_tol=1e-3))(st0)
    u_j = jnp.asarray(np.asarray(st1.q.reshape(-1, 3)[n2g]), jnp.float32)
    w = disp_weights(interp, u_j)
    bound_pts = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])

    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    params = TraceParams()
    n_frames = 10

    ro_s, rd_s = generate_rays(cam, 240, 135)
    ro_s = jnp.reshape(ro_s, (-1, 3))
    rd_s = jnp.reshape(rd_s, (-1, 3))
    u_grid = displacement_grid(grid, tm.grid_to_node, u_j)
    t_ref, h_ref = jax.jit(
        lambda: trace_deformed(scene, grid, u_grid, ro_s, rd_s, params)
    )()
    t_ref, h_ref = np.asarray(t_ref), np.asarray(h_ref)

    for kref in (4, 8, 16, 32):
        pt.K_REFRESH = kref

        t2, h2 = jax.jit(
            lambda w_: trace_deformed_rbf_fast(
                scene, interp, w_, ro_s, rd_s, params,
                need_grads=False, bound_pts=bound_pts,
            )
        )(w)
        h2 = np.asarray(h2)
        agree = float((h2 == h_ref).mean())
        mm = h2 & h_ref
        dt_root = np.abs(np.asarray(t2)[mm] - t_ref[mm])

        @jax.jit
        def frames(w, o, d):
            def body(acc, _):
                t, _h = trace_deformed_rbf_fast(
                    scene, interp, w, o + acc * 1e-30, d, params,
                    image_hw=(height, width), need_grads=False,
                    bound_pts=bound_pts,
                )
                return jnp.sum(t), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                  length=n_frames)
            return acc

        float(frames(w, ro, rd))
        t0 = time.perf_counter()
        float(frames(w, ro, rd))
        ms = (time.perf_counter() - t0) / n_frames * 1e3
        print(json.dumps({
            "k_refresh": kref,
            "trace_ms_chain10": round(ms, 2),
            "hit_agree": round(agree, 4),
            "root_err_med": round(float(np.median(dt_root)), 5),
            "root_err_p99": round(float(np.percentile(dt_root, 99)), 4),
        }), flush=True)
    pt.K_REFRESH = 8


if __name__ == "__main__":
    main()
