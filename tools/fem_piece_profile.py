#!/usr/bin/env python
"""Round-5: piecewise timing of the grid FEM step's components on TPU —
what actually costs inside the 219 us stiffness apply and the ~550 us
CG iteration (matvec + V-cycle)."""
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

N_IT = 200


def timeit(name, fn, v0):
    @jax.jit
    def loop(v):
        def body(_, v):
            return fn(v) * 0.9999
        return jax.lax.fori_loop(0, N_IT, body, v)

    jax.block_until_ready(loop(v0))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(v0))
    us = (time.perf_counter() - t0) / N_IT * 1e6
    print(json.dumps({"piece": name, "us": round(us, 1)}), flush=True)
    return us


def main():
    sc = load_blob("/root/reference/data/models/blobtree/ventricle.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=0.14)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    fixed = np.where(nodes[:, 1] < nodes[:, 1].min() + 1e-3)[0]
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    q0 = gf.rest_state().q
    R = gfm.kinematics(gf, q0)
    v0 = jnp.ones_like(q0)
    dims = gf.dims
    print(json.dumps({"dims": [int(d) for d in dims]}))

    timeit("stiffness_apply_rot", lambda v: gfm.stiffness_apply_rot(
        gf, R, v), v0)
    timeit("stiffness_linear", lambda v: gfm._un_cm(
        gfm._stiffness_apply_linear(dims, gf.cellw, gf.ke, gfm._cm(v))
    ), v0)

    # corner extraction + scatter only (the slice/pad relayouts).
    def corners_only(v):
        cs = gfm._corner_rows(dims, gfm._cm(v))
        return gfm._un_cm(gfm._scatter_rows(dims, [c * 1.0 for c in cs]))

    timeit("corner+scatter", corners_only, v0)

    # per-tet rot+matmul on fixed rows, no corner/scatter.
    cs0 = gfm._corner_rows(dims, gfm._cm(v0))
    rows0 = [np.asarray(c) for c in cs0]

    def tets_only(v):
        # fold v in so the loop can't hoist; reuse corner rows shape.
        cs = [c + jnp.mean(v) * 0.0 for c in cs0]
        acc = None
        for k in range(6):
            rv = gfm._rot_rows(R[k], gfm._tet_rows(cs, k), transpose=True)
            w = jnp.matmul(gf.ke[k], rv, precision=gfm._F32)
            fw = gfm._rot_rows(R[k], w) * gf.cellw
            acc = fw if acc is None else acc + fw
        return v + jnp.mean(acc) * 0.0

    timeit("tets(rot+ke) no-scatter", tets_only, v0)

    def matmuls_only(v):
        cs = [c + jnp.mean(v) * 0.0 for c in cs0]
        acc = None
        for k in range(6):
            w = jnp.matmul(gf.ke[k], gfm._tet_rows(cs, k),
                           precision=gfm._F32)
            acc = w if acc is None else acc + w
        return v + jnp.mean(acc) * 0.0

    timeit("ke matmuls only", matmuls_only, v0)

    # V-cycle (the preconditioner application).
    mc, sc_ = 1.0 + 0.0333 * 1.0, 0.0333 * 0.01 + 0.0333 ** 2
    setup = gfm.mg_setup(gf.levels, mc, sc_, gf.coarse_inv
                         if abs(mc - gf.coarse_coefs[0]) < 1e-12 else None)

    timeit("vcycle", lambda v: gfm.vcycle(gf.levels, mc, sc_, v, setup),
           v0)

    # Full timestep at the bench tolerance.
    st0 = gf.rest_state()
    fg = jnp.zeros((*dims, 3))

    @jax.jit
    def step(st):
        st2, it = gfm.timestep(gf, st, fg, cg_tol=3e-3)
        return st2, it

    st1, it1 = step(st0)
    jax.block_until_ready(st1.q)
    t0 = time.perf_counter()
    for _ in range(5):
        st1, it1 = step(st0)
    jax.block_until_ready(st1.q)
    print(json.dumps({
        "piece": "timestep(cg_tol=3e-3, cold state)",
        "ms": round((time.perf_counter() - t0) / 5 * 1e3, 2),
        "iters": int(it1),
    }), flush=True)


if __name__ == "__main__":
    main()
