#!/usr/bin/env python
"""Round-5 deformed-march decomposition on real TPU: ablations + march
iteration counts for the bench's ventricle coupled-trace config."""
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
    disp_weights_centers,
    trace_deformed_rbf_fast,
    wendland_pallas_spec,
)
from fembrain_tpu.render.sphere_trace import TraceParams


def timed(fn, *args, iters=3):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


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
    n_frames = 3
    bound_pts = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])

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

    # Spec telemetry: how big are the march bounds this frame?
    spec = wendland_pallas_spec(interp, w, None, 1)
    print(json.dumps({
        "max_disp": round(float(spec.max_disp), 4),
        "bu_max": round(float(jnp.max(spec.bu)), 4),
        "bg_max": round(float(jnp.max(spec.bg)), 4),
        "bfr": round(float(spec.bfr), 5),
        "sigma": round(float(spec.sigma), 4),
        "diag_rest": round(float(jnp.linalg.norm(
            scene.bbox_hi - scene.bbox_lo + 0.1)), 3),
    }))

    def run_one(tag):
        @jax.jit
        def def_frames(w, o, d):
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

        ms = timed(def_frames, w, ro, rd, iters=n_frames) * 1e3
        print(json.dumps({tag: round(ms, 2)}))

    run_one("deformed_full_ms")
    pt.DEBUG_PULLBACK_ABLATE = 2
    run_one("deformed_nopull_ms")  # rest-field evals, deformed bounds
    pt.DEBUG_PULLBACK_ABLATE = 1
    run_one("deformed_affineonly_ms")
    pt.DEBUG_PULLBACK_ABLATE = 0

    # March iteration counts: deformed vs rest.
    pt.DEBUG_MARCH_ITERS = True

    @jax.jit
    def iters_def(w):
        spec2 = wendland_pallas_spec(interp, w, None, 1)
        t, _ = pt.trace_pallas_image(scene, ro, rd, height, width, params,
                                     disp=spec2)
        return t

    it_d = np.asarray(iters_def(w))

    @jax.jit
    def iters_rest():
        t, _ = pt.trace_pallas_image(scene, ro, rd, height, width, params)
        return t

    it_r = np.asarray(iters_rest())
    pt.DEBUG_MARCH_ITERS = False
    # t output now carries per-tile while-iteration counts (x2 evals).
    for tag, it in (("deformed", it_d), ("rest", it_r)):
        nz = it[it > 0]
        print(json.dumps({
            f"{tag}_tile_iters_mean": round(float(nz.mean()), 1),
            f"{tag}_tile_iters_max": int(nz.max()),
            f"{tag}_live_tiles": int((it > 0).sum() // 2048),
        }))


if __name__ == "__main__":
    main(*((sys.argv[1],) if len(sys.argv) > 1 else ()))
