#!/usr/bin/env python
"""Diagnose the coupled E-gradient check (VERDICT r3 weak #2).

Runs the exact bench.py coupled_E_grad setup on CPU with x64 enabled and
separates the two hypotheses:
  (a) the custom_linear_solve / disp_weights / implicit-hit chain drops a
      term -> the f64 autodiff-vs-FD discrepancy survives;
  (b) the check is ill-conditioned in f32 -> f64 agrees and the f32
      failure is cancellation noise (FD increment ~4e-4 on a ~500-scale
      sum is at the f32 resolution floor).

Stages:
  1. FEM-only: d(sum q)/dE through grid_fem custom_linear_solve.
  2. weights:  d(sum w)/dE through disp_weights_centers.
  3. coupled:  the bench loss, eps sweep, plus per-ray FD on the fixed
     hit set.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.deformed import (
        build_disp_interp,
        coupled_step_grid_fast,
        disp_weights_centers,
    )

    import dataclasses

    sc = load_blob("/root/reference/data/models/blobtree/sphere.blob")
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=0.3)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    tets = np.asarray(tm.tets)[: int(tm.n_tets)]
    fixed = bottom_nodes_per_component(nodes, tets, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    interp = build_disp_interp(nodes, n_centers=64, fixed=fixed)
    n2g = gfm.node_to_grid_index(tm)
    cgi = jnp.asarray(n2g[np.asarray(interp.center_nodes)])
    f_ext = np.zeros((int(np.prod(grid.dims)), 3))
    f_ext[n2g, 1] = -200.0 * np.asarray(gf.mass).reshape(-1)[n2g]
    f_ext = jnp.asarray(f_ext.reshape(*grid.dims, 3))

    # Stage 1: FEM only.
    def fem_loss(es):
        gf2 = dataclasses.replace(gf, ke=gf.ke * es)
        st, _ = gfm.timestep(gf2, gf.rest_state(), f_ext,
                             differentiable=True)
        return jnp.sum(st.q)

    g1 = float(jax.grad(fem_loss)(jnp.float64(1.0)))
    for eps in (1e-4, 1e-3, 1e-2):
        fd = (float(fem_loss(jnp.float64(1 + eps)))
              - float(fem_loss(jnp.float64(1 - eps)))) / (2 * eps)
        print(f"stage1 fem-only eps={eps:g}: ad={g1:.8g} fd={fd:.8g} "
              f"rel={abs(g1-fd)/max(1e-12,abs(fd)):.3g}")

    # Stage 2: through RBF weights.
    def w_loss(es):
        gf2 = dataclasses.replace(gf, ke=gf.ke * es)
        st, _ = gfm.timestep(gf2, gf.rest_state(), f_ext,
                             differentiable=True)
        u_c = st.q.reshape(-1, 3)[cgi]
        return jnp.sum(disp_weights_centers(interp, u_c))

    g2 = float(jax.grad(w_loss)(jnp.float64(1.0)))
    for eps in (1e-3,):
        fd = (float(w_loss(jnp.float64(1 + eps)))
              - float(w_loss(jnp.float64(1 - eps)))) / (2 * eps)
        print(f"stage2 weights eps={eps:g}: ad={g2:.8g} fd={fd:.8g} "
              f"rel={abs(g2-fd)/max(1e-12,abs(fd)):.3g}")

    # Stage 3: the bench loss (sum over hit rays) + per-ray FD.
    cam = Camera.orbit(30.0, 20.0, 5.0)
    ro, rd = generate_rays(cam, 24, 18)
    ro = ro.reshape(-1, 3).astype(jnp.float64)
    rd = rd.reshape(-1, 3).astype(jnp.float64)

    def step_t(es):
        t, hit, _ = coupled_step_grid_fast(
            scene, gf, interp, cgi, gf.rest_state(), f_ext, ro, rd,
            E_scale=es, differentiable=True, use_pallas=False,
        )
        return t, hit

    def loss(es):
        t, hit = step_t(es)
        return jnp.sum(jnp.where(hit, t, 0.0))

    g3 = float(jax.grad(loss)(jnp.float64(1.0)))
    for eps in (3e-3, 1e-2, 3e-2):
        fd = (float(loss(jnp.float64(1 + eps)))
              - float(loss(jnp.float64(1 - eps)))) / (2 * eps)
        print(f"stage3 coupled eps={eps:g}: ad={g3:.8g} fd={fd:.8g} "
              f"rel={abs(g3-fd)/max(1e-12,abs(fd)):.3g}")

    # Per-ray FD on the fixed hit set.
    eps = 1e-2
    t0, hit0 = step_t(jnp.float64(1.0))
    tp, hp = step_t(jnp.float64(1 + eps))
    tm_, hm = step_t(jnp.float64(1 - eps))
    mask = np.asarray(hit0 & hp & hm)
    fd_vec = (np.asarray(tp) - np.asarray(tm_)) / (2 * eps)
    print(f"stage3 hit flips: hit0={int(np.sum(np.asarray(hit0)))} "
          f"stable={int(mask.sum())}")
    # autodiff of the fixed-mask loss
    maskj = jnp.asarray(mask)

    def loss_fixed(es):
        t, hit = step_t(es)
        return jnp.sum(jnp.where(maskj, t, 0.0))

    g4 = float(jax.grad(loss_fixed)(jnp.float64(1.0)))
    fd4 = float(np.sum(fd_vec[mask]))
    print(f"stage3 fixed-mask eps={eps:g}: ad={g4:.8g} fd={fd4:.8g} "
          f"rel={abs(g4-fd4)/max(1e-12,abs(fd4)):.3g}")


if __name__ == "__main__":
    main()
