#!/usr/bin/env python
"""Round-5: kernel tile-size sweep for rest + deformed 1080p traces."""
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
from fembrain_tpu.render.pallas_trace import trace_pallas_image
from fembrain_tpu.render.deformed import (
    build_disp_interp,
    disp_weights_centers,
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
    cgi = jnp.asarray(n2g[np.asarray(interp.center_nodes)])
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
    w = disp_weights_centers(interp, st1.q.reshape(-1, 3)[cgi])
    jax.block_until_ready(w)

    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    params = TraceParams()
    n_frames = 3
    bound_pts = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])

    for tile in (2048, 1024, 512, 256):
        @jax.jit
        def rest_frames(o, d):
            def body(acc, _):
                t = trace_pallas_image(scene, o + acc * 1e-30, d,
                                       height, width, params,
                                       tile=tile)[0]
                return jnp.sum(t), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                  length=n_frames)
            return acc

        float(rest_frames(ro, rd))
        t0 = time.perf_counter()
        float(rest_frames(ro, rd))
        rest_ms = (time.perf_counter() - t0) / n_frames * 1e3

        @jax.jit
        def def_frames(w, o, d):
            def body(acc, _):
                t, _h = trace_deformed_rbf_fast(
                    scene, interp, w, o + acc * 1e-30, d, params,
                    image_hw=(height, width), need_grads=False,
                    bound_pts=bound_pts, tile=tile,
                )
                return jnp.sum(t), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                  length=n_frames)
            return acc

        float(def_frames(w, ro, rd))
        t0 = time.perf_counter()
        float(def_frames(w, ro, rd))
        def_ms = (time.perf_counter() - t0) / n_frames * 1e3
        print(json.dumps({"tile": tile, "rest_ms": round(rest_ms, 2),
                          "deformed_ms": round(def_ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
