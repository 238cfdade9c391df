#!/usr/bin/env python
"""Deformed-trace cost surface on TPU: trace_ms vs (M centers, fp_iters)
at 1080p on the settled ventricle. Anchors the round-4 redesign of the
in-kernel pull-back (VERDICT r3 next #1)."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.deformed import (
        build_disp_interp,
        disp_weights_centers,
        trace_deformed_rbf_fast,
    )
    from fembrain_tpu.render.sphere_trace import TraceParams

    on_tpu = jax.default_backend() == "tpu"
    width, height = (1920, 1080) if on_tpu else (192, 108)

    sc = load_blob("/root/reference/data/models/blobtree/ventricle.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=0.14 if on_tpu else 0.3)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    tets = np.asarray(tm.tets)[: int(tm.n_tets)]
    fixed = bottom_nodes_per_component(nodes, tets, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
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

    st = settle(gf.rest_state())
    jax.block_until_ready(st.q)
    q = st.q.reshape(-1, 3)

    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    params = TraceParams()
    bound_pts = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])
    n_frames = 3

    configs = [
        ("biharmonic", 128, 0.0, (1,), False),
        ("wendland", 256, 2.5, (1,), False),
        ("wendland", 256, 2.5, (1,), True),
        ("wendland", 512, 2.0, (1,), False),
        ("wendland", 512, 2.0, (1,), True),
    ]
    for kern, m, sf, fps, zero_w in configs:
        interp = build_disp_interp(
            nodes, n_centers=m, fixed=fixed, kernel=kern,
            sigma_fill=sf or 3.0,
        )
        cgi = jnp.asarray(n2g[np.asarray(interp.center_nodes)])
        w = disp_weights_centers(interp, q[cgi])
        if zero_w:
            w = jnp.zeros_like(w)
        for fp in fps:
            @jax.jit
            def frames(w, o, d, interp=interp, fp=fp):
                def body(acc, _):
                    t, _h = trace_deformed_rbf_fast(
                        scene, interp, w, o + acc * 1e-30, d, params,
                        image_hw=(height, width) if on_tpu else None,
                        need_grads=False, fp_iters=fp, bound_pts=bound_pts,
                    )
                    return jnp.sum(t), None
                acc, _ = jax.lax.scan(
                    body, jnp.zeros(()), None, length=n_frames
                )
                return acc

            float(frames(w, ro, rd))
            t0 = time.perf_counter()
            float(frames(w, ro, rd))
            ms = (time.perf_counter() - t0) / n_frames * 1e3
            print(json.dumps({"kernel": kern, "m": m, "sigma_fill": sf,
                              "fp_iters": fp, "sigma": round(interp.sigma, 3),
                              "zero_w": zero_w,
                              "trace_ms": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
