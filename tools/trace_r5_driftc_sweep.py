#!/usr/bin/env python
"""Round-5: DRIFT_REFRESH_C sweep on both bench scenes (chain-10)."""
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
    build_disp_interp, disp_weights_centers, trace_deformed_rbf_fast,
)
from fembrain_tpu.render.sphere_trace import TraceParams


def load(name):
    for p in (f"/root/repo/data/models/blobtree/{name}.blob",
              f"/root/reference/data/models/blobtree/{name}.blob"):
        try:
            sc = load_blob(p)
            break
        except FileNotFoundError:
            continue
    sc.flatten_instances()
    return sc.pack()


def setup(name):
    scene = load(name)
    grid = grid_for_scene(scene, cellsize=0.14)
    tm = extract_tet_mesh(scene, grid, ncap=grid.n_vertices,
                          tetcap=grid.n_cells * 6)
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    tets = np.asarray(tm.tets)[: int(tm.n_tets)]
    fixed = bottom_nodes_per_component(nodes, tets, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    interp = build_disp_interp(nodes, n_centers=256, fixed=fixed,
                               kernel="wendland", sigma_fill=2.5)
    n2g = gfm.node_to_grid_index(tm)
    cgi = jnp.asarray(n2g[np.asarray(interp.center_nodes)])
    fe = np.zeros((int(np.prod(grid.dims)), 3), np.float32)
    fe[n2g, 1] = -500.0 * np.asarray(gf.mass).reshape(-1)[n2g]
    fe = jnp.asarray(fe.reshape(*grid.dims, 3))

    @jax.jit
    def settle(st):
        def body(st, _):
            st2, _ = gfm.timestep(gf, st, fe)
            return st2, None
        return jax.lax.scan(body, st, None, length=40)[0]

    st0 = settle(gf.rest_state())
    st1, _ = jax.jit(lambda s: gfm.timestep(gf, s, fe, cg_tol=3e-3))(st0)
    w = disp_weights_centers(interp, st1.q.reshape(-1, 3)[cgi])
    bp = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, 1920, 1080)
    return scene, interp, w, bp, ro.reshape(-1, 3), rd.reshape(-1, 3)


def main():
    for name in ("ventricle", "brain"):
        scene, interp, w, bp, ro, rd = setup(name)
        for C in (0.5, 1.0, 2.0, 1e9):
            setattr(pt, "DRIFT_REFRESH_C", C)  # historical knob (removed)
            n = 10

            @jax.jit
            def frames(w, o, d):
                def body(acc, _):
                    t, _h = trace_deformed_rbf_fast(
                        scene, interp, w, o + acc * 1e-30, d,
                        TraceParams(), image_hw=(1080, 1920),
                        need_grads=False, bound_pts=bp,
                    )
                    return jnp.sum(t), None
                return jax.lax.scan(body, jnp.zeros(()), None,
                                    length=n)[0]

            float(frames(w, ro, rd))
            t0 = time.perf_counter()
            float(frames(w, ro, rd))
            print(json.dumps({
                "scene": name, "C": C,
                "def_ms_chain10": round(
                    (time.perf_counter() - t0) / n * 1e3, 2),
            }), flush=True)
    pass


if __name__ == "__main__":
    main()
