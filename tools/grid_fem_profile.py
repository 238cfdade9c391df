#!/usr/bin/env python
"""Profile the grid-structured FEM (fem.grid_fem) at production scale:
per-step wall time, CG iterations, Jacobi vs multigrid preconditioner,
and a forward-tolerance sweep — the numbers behind the coupled-frame
FEM budget (BASELINE >=30 fps => <~10 ms/step)."""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


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

    sc = load_blob(f"/root/reference/data/models/blobtree/{args.scene}.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=args.cellsize)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    n_nodes, n_tets = int(tm.n_nodes), int(tm.n_tets)
    nodes = np.asarray(tm.nodes)[:n_nodes]
    tets_np = np.asarray(tm.tets)[:n_tets]
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component
    fixed = bottom_nodes_per_component(nodes, tets_np, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    n2g = gfm.node_to_grid_index(tm)
    print(
        f"grid dims={grid.dims} nodes={n_nodes} tets={n_tets} "
        f"levels={[l.dims for l in gf.levels]}",
        flush=True,
    )

    f_ext = np.zeros((int(np.prod(grid.dims)), 3), np.float32)
    f_ext[n2g, 1] = -500.0 * np.asarray(gf.mass).reshape(-1)[n2g]
    f_ext = jnp.asarray(f_ext.reshape(*grid.dims, 3))
    st0 = gf.rest_state()

    # matvec alone
    R = jax.jit(gfm.kinematics)(gf, st0.q)

    @jax.jit
    def mv(v):
        return gfm.stiffness_apply_rot(gf, R, v)

    dt, _ = timed(mv, st0.q + 0.01, iters=50)
    print(f"stencil matvec:        {dt*1e3:8.3f} ms", flush=True)

    @jax.jit
    def vc(r):
        return gfm.vcycle(gf.levels, 1.0, 1.442e-3, r)

    dt, _ = timed(vc, f_ext, iters=50)
    print(f"V(2,2) cycle:          {dt*1e3:8.3f} ms", flush=True)

    @jax.jit
    def stepj(st):
        return gfm.timestep(gf, st, f_ext, precond="jacobi")

    dt, (_, it) = timed(stepj, st0, iters=3)
    print(f"step[jacobi] cold:   {dt*1e3:8.1f} ms  iters={int(it)}",
          flush=True)

    @jax.jit
    def stepm(st):
        return gfm.timestep(gf, st, f_ext, precond="mg")

    dt, (st1, it) = timed(stepm, st0, iters=3)
    print(f"step[mg]     cold:   {dt*1e3:8.1f} ms  iters={int(it)}",
          flush=True)
    dt, (_, it2) = timed(stepm, st1, iters=5)
    print(f"step[mg]     warm:   {dt*1e3:8.1f} ms  iters={int(it2)}",
          flush=True)

    # tolerance sweep (mg)
    q_ref = None
    for tol in (1e-6, 1e-4, 1e-3):
        @jax.jit
        def stept(st, tol=tol):
            return gfm.timestep(gf, st, f_ext, cg_tol=tol, precond="mg")

        dt, (st2, it) = timed(stept, st0, iters=3)
        q = np.asarray(st2.q)
        if q_ref is None:
            q_ref = q
        err = float(np.abs(q - q_ref).max())
        print(
            f"  tol={tol:g}: {dt*1e3:7.1f} ms  iters={int(it):4d} "
            f" max|dq| vs 1e-6 = {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
