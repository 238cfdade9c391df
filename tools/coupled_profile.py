#!/usr/bin/env python
"""Measure the coupled render+deform frame (BASELINE config #5) at 1080p:
force -> implicit FEM step -> RBF displacement weights -> deformed trace.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem.integrator import FemState
    from fembrain_tpu.fem.tetmesh import build_fem_mesh
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.deformed import (
        build_disp_interp,
        coupled_step_fast,
    )
    from fembrain_tpu.render.sphere_trace import TraceParams

    on_tpu = jax.default_backend() == "tpu"
    width, height = (1920, 1080) if on_tpu else (192, 108)
    iters = 3

    sc = load_blob("/root/reference/data/models/blobtree/ventricle.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=0.14)
    print(f"grid dims={grid.dims} cells={grid.n_cells}", flush=True)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    n_nodes, n_tets = int(tm.n_nodes), int(tm.n_tets)
    nodes = np.asarray(tm.nodes)[:n_nodes]
    tets = np.asarray(tm.tets)[:n_tets]
    fixed = nodes[:, 1] < nodes[:, 1].min() + 1e-3
    mesh = build_fem_mesh(nodes, tets, fixed=fixed)
    print(f"fem nodes={n_nodes} tets={n_tets}", flush=True)
    interp = build_disp_interp(nodes, fixed=fixed)

    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    f_ext = jnp.zeros((len(nodes), 3)).at[:, 1].set(-10000.0 * mesh.mass)
    params = TraceParams()

    def frames(state, ro, rd):
        def body(carry, _):
            st, acc = carry
            t, hit, st2 = coupled_step_fast(
                scene, mesh, interp, st, f_ext,
                ro + acc * 1e-30, rd, params=params,
            )
            return (st2, jnp.sum(t)), None

        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=iters
        )
        return acc

    fn = jax.jit(frames)
    st0 = FemState.rest(mesh)
    print("compiling...", flush=True)
    float(fn(st0, ro, rd))
    t0 = time.perf_counter()
    float(fn(st0, ro, rd))
    dt = (time.perf_counter() - t0) / iters
    print(
        f"coupled frame: {dt * 1e3:.1f} ms = {1 / dt:.2f} fps at "
        f"{width}x{height} ({width * height / dt / 1e6:.1f}M rays/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
