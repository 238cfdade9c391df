#!/usr/bin/env python
"""CG-tolerance knee for the coupled frame's grid FEM stage (VERDICT r4
item #4): warm-started steady-state stepping at the ventricle mesh,
sweeping cg_tol. Reports steps/s, CG iterations, and the displacement
error vs the tight (1e-6) trajectory after the same number of frames —
the knee feeds the coupled path's default."""
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

    on_tpu = jax.default_backend() == "tpu"
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
    cell = grid.cellsize

    def mk(tol, steps):
        @jax.jit
        def go(st):
            def one(st, _):
                st2, it = gfm.timestep(gf, st, f_ext, cg_tol=tol)
                return st2, it
            return jax.lax.scan(one, st, None, length=steps)
        return go

    # settle with the tight solver (still in transient after 40 frames,
    # so the per-frame solves below do real work)
    st0, _ = mk(1e-6, 40)(gf.rest_state())
    jax.block_until_ready(st0.q)
    ref, _ = mk(1e-6, 10)(st0)

    for tol in (1e-6, 1e-5, 1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2):
        go = mk(tol, 10)
        st, its = go(st0)                 # compile + warm
        jax.block_until_ready(st.q)
        t0 = time.perf_counter()
        st, its = go(st0)
        jax.block_until_ready(st.q)
        dt = (time.perf_counter() - t0) / 10
        err = float(jnp.abs(st.q - ref.q).max())
        print(json.dumps({
            "cg_tol": tol,
            "steps_per_sec": round(1.0 / dt, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "cg_iters_mean": round(float(np.asarray(its).mean()), 1),
            "disp_err_max": float(err),
            "disp_err_cells": float(err / cell),
        }), flush=True)


if __name__ == "__main__":
    main()
