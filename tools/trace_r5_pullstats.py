#!/usr/bin/env python
"""Round-5: per-tile pull/live-block statistics for the deformed march."""
import json
import sys

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
    disp_weights_centers,
    wendland_pallas_spec,
)
from fembrain_tpu.render.sphere_trace import TraceParams


def main(name="ventricle", cellsize=0.14, width=1920, height=1080):
    for path in (
        f"data/models/blobtree/{name}.blob",
        f"/root/reference/data/models/blobtree/{name}.blob",
    ):
        try:
            sc = load_blob(path)
            break
        except FileNotFoundError:
            continue
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=cellsize)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    n_nodes = int(tm.n_nodes)
    nodes = np.asarray(tm.nodes)[:n_nodes]
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

    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    params = TraceParams()

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

    # Iteration counts (march while-iters, x2 evals per iter).
    pt.DEBUG_MARCH_ITERS = True

    @jax.jit
    def iters_def(w):
        spec2 = wendland_pallas_spec(interp, w, None, 1)
        t, _ = pt.trace_pallas_image(scene, ro, rd, height, width, params,
                                     disp=spec2)
        return t

    it_d = np.asarray(iters_def(w)).reshape(-1)
    pt.DEBUG_MARCH_ITERS = False
    pt.DEBUG_PULL_STATS = True

    @jax.jit
    def stats_def(w):
        spec2 = wendland_pallas_spec(interp, w, None, 1)
        t, h = pt.trace_pallas_image(scene, ro, rd, height, width, params,
                                     disp=spec2)
        return t, h

    cnt_p, cnt_b = stats_def(w)
    pt.DEBUG_PULL_STATS = False
    cnt_p = np.asarray(cnt_p).reshape(-1)
    cnt_b = np.asarray(cnt_b).reshape(-1)
    # per-lane pulled evals; per-tile totals via block layout is awkward
    # after from_blocks; use aggregates.
    live = it_d > 0
    evals = 2.0 * it_d  # 2 sub-steps per while iteration
    print(json.dumps({
        "live_lanes": int(live.sum()),
        "evals_mean": round(float(evals[live].mean()), 1),
        "lane_pulled_mean": round(float(cnt_p[live].mean()), 1),
        "lane_pulled_frac": round(
            float(cnt_p[live].sum() / evals[live].sum()), 3),
        # cnt_b lanes share their tile's total live-block evals, so the
        # lane mean IS the (live-lane-weighted) per-tile mean, and
        # sum/2048 approximates the global total across tiles.
        "tile_blockevals_mean": round(float(cnt_b[live].mean()), 1),
        "total_blockevals_approx": int(cnt_b.sum() / 2048),
    }))


if __name__ == "__main__":
    main(*((sys.argv[1],) if len(sys.argv) > 1 else ()))
