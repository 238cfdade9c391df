#!/usr/bin/env python
"""Measure the coupled render+deform frame (BASELINE config #5) at 1080p:
force -> implicit FEM step -> RBF displacement weights -> deformed trace.

Prints a per-stage decomposition (fem / rbf-weights / trace) plus the
fused frame, for both the differentiable (cold CG) and forward
(warm-started CG) solver modes, and a CG-tolerance sweep with the
resulting displacement error vs the tight solve.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=5):
    out = fn(*args)
    import jax

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
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--unstructured", action="store_true",
                    help="also profile the legacy unstructured-solver stages (slow)")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.fem import integrator as integ
    from fembrain_tpu.fem.integrator import FemState
    from fembrain_tpu.fem.tetmesh import build_fem_mesh
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.deformed import (
        build_disp_interp,
        coupled_step_fast,
        coupled_step_grid_fast,
        disp_weights,
        trace_deformed_rbf_fast,
    )
    from fembrain_tpu.render.sphere_trace import TraceParams

    on_tpu = jax.default_backend() == "tpu"
    width, height = (1920, 1080) if on_tpu else (192, 108)

    sc = load_blob(
        f"/root/reference/data/models/blobtree/{args.scene}.blob"
    )
    sc.flatten_instances()
    scene = sc.pack()
    grid = grid_for_scene(scene, cellsize=args.cellsize)
    print(f"grid dims={grid.dims} cells={grid.n_cells}", flush=True)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    n_nodes, n_tets = int(tm.n_nodes), int(tm.n_tets)
    nodes = np.asarray(tm.nodes)[:n_nodes]
    tets = np.asarray(tm.tets)[:n_tets]
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component
    # Anchor EVERY disjoint component (the ventricle is several
    # lobes; a global bottom plane leaves the rest in free fall).
    fixed = bottom_nodes_per_component(nodes, tets, frac=0.25)
    mesh = build_fem_mesh(nodes, tets, fixed=fixed)
    print(f"fem nodes={n_nodes} tets={n_tets}", flush=True)
    interp = build_disp_interp(nodes, fixed=fixed)

    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    # Quasi-static sag scenario: gentle gravity so displacements stay at
    # soft-tissue scale (|u| ~ 0.1 << max_disp) — the free-fall -1e4*mass
    # load of the round-2 tool sent |q| to 11+ units, which both breaks
    # the max_disp bracket assumption and zeroes the adaptive step factor.
    f_ext = jnp.zeros((len(nodes), 3)).at[:, 1].set(-100.0 * mesh.mass)
    params = TraceParams()
    st0 = FemState.rest(mesh)

    if not args.unstructured:
        _grid_stages(args, jax, jnp, np, gfm, scene, grid, tm, nodes,
                     fixed, interp, ro, rd, params, width, height)
        return

    # ---- stage 1: FEM step alone, both modes (legacy solver) ----
    @jax.jit
    def fem_diff(st):
        st2, it = integ.timestep(mesh, st, f_ext, differentiable=True)
        return st2, it

    @jax.jit
    def fem_fwd(st):
        st2, it = integ.timestep(mesh, st, f_ext)
        return st2, it

    dt, (st1, _) = timed(fem_diff, st0)
    print(f"fem step (differentiable, cold): {dt*1e3:8.1f} ms", flush=True)
    dt, (stw, itw) = timed(fem_fwd, st0)
    print(
        f"fem step (fwd, warm from rest):  {dt*1e3:8.1f} ms"
        f"  cg_iters={int(itw)}",
        flush=True,
    )
    # warm across frames: step twice, time the second
    @jax.jit
    def fem_fwd2(st):
        st2, _ = integ.timestep(mesh, st, f_ext)
        st3, it = integ.timestep(mesh, st2, f_ext)
        return st3, it

    dt2, (_, it2) = timed(fem_fwd2, st0)
    dt1, _ = timed(fem_fwd, st0)
    print(
        f"fem step (fwd, warm 2nd frame):  {(dt2-dt1)*1e3:8.1f} ms"
        f"  cg_iters={int(it2)}",
        flush=True,
    )

    # ---- CG tolerance sweep ----
    q_ref = None
    for tol in (1e-6, 1e-5, 1e-4, 1e-3, 1e-2):
        @jax.jit
        def fem_tol(st, tol=tol):
            st2, it = integ.timestep(mesh, st, f_ext, cg_tol=tol)
            return st2, it

        dt, (st2, it) = timed(fem_tol, st0)
        q = np.asarray(st2.q)
        if q_ref is None:
            q_ref = q
        err = float(np.abs(q - q_ref).max())
        print(
            f"  cg_tol={tol:g}: {dt*1e3:7.1f} ms  iters={int(it):4d}"
            f"  max|dq| vs 1e-6 = {err:.2e}",
            flush=True,
        )

    # ---- stage 2: RBF weights ----
    @jax.jit
    def weights(st):
        return disp_weights(interp, st.q)

    dt, w = timed(weights, st1)
    print(f"rbf weights:                     {dt*1e3:8.2f} ms", flush=True)

    # ---- stage 3: deformed trace alone ----
    @jax.jit
    def tr(w, ro, rd):
        return trace_deformed_rbf_fast(
            scene, interp, w, ro, rd, params, image_hw=(height, width)
        )

    dt, _ = timed(tr, w, ro, rd)
    print(f"deformed trace {width}x{height}:     {dt*1e3:8.1f} ms", flush=True)

    # ---- fused coupled frame (scan over frames) ----
    def frames(state, ro, rd, differentiable):
        def body(carry, _):
            st, acc = carry
            t, hit, st2 = coupled_step_fast(
                scene, mesh, interp, st, f_ext,
                ro + acc * 1e-30, rd, params=params,
                image_hw=(height, width),
                differentiable=differentiable,
            )
            return (st2, jnp.sum(t)), None

        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=args.frames
        )
        return acc

    fn = jax.jit(frames, static_argnums=(3,))
    for diff in (False,):
        t0 = time.perf_counter()
        float(fn(st0, ro, rd, diff))
        print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        float(fn(st0, ro, rd, diff))
        dt = (time.perf_counter() - t0) / args.frames
        print(
            f"coupled frame: {dt * 1e3:.1f} ms = {1 / dt:.2f} fps at "
            f"{width}x{height} ({width * height / dt / 1e6:.1f}M rays/s)",
            flush=True,
        )

    _grid_stages(args, jax, jnp, np, gfm, scene, grid, tm, nodes,
                 fixed, interp, ro, rd, params, width, height)


def _grid_stages(args, jax, jnp, np, gfm, scene, grid, tm, nodes,
                 fixed, interp, ro, rd, params, width, height):
    """GRID-FEM coupled frame (the production path): stage
    decomposition + fused frames at two CG tolerances."""
    import time
    from fembrain_tpu.render.deformed import (
        coupled_step_grid_fast, disp_weights_centers,
        trace_deformed_rbf_fast, coupling_telemetry,
    )

    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    n2g = gfm.node_to_grid_index(tm)
    cgi = jnp.asarray(n2g[np.asarray(interp.center_nodes)])
    bound_pts = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])
    f_ext_g = np.zeros((int(np.prod(grid.dims)), 3), np.float32)
    f_ext_g[n2g, 1] = -500.0 * np.asarray(gf.mass).reshape(-1)[n2g]
    f_ext_g = jnp.asarray(f_ext_g.reshape(*grid.dims, 3))

    # ---- settle to quasi-static (untimed): the first steps from rest
    # are a gravity transient (|u| ~ h^2 g regardless of anchoring) with
    # L > 1; the benchmark state is the steady sag. ----
    @jax.jit
    def settle(st):
        def body(st, _):
            st2, _ = gfm.timestep(gf, st, f_ext_g)
            return st2, None
        st, _ = jax.lax.scan(body, st, None, length=40)
        return st

    st0 = settle(gf.rest_state())
    jax.block_until_ready(st0.q)

    # ---- stage decomposition ----
    @jax.jit
    def gstep(st):
        return gfm.timestep(gf, st, f_ext_g)

    dt, (st1, it) = timed(gstep, st0)
    print(f"grid fem step:    {dt*1e3:8.1f} ms  iters={int(it)}",
          flush=True)

    @jax.jit
    def wfn(st):
        return disp_weights_centers(
            interp, st.q.reshape(-1, 3)[cgi]
        )

    dt, w = timed(wfn, st1)
    print(f"rbf weights:      {dt*1e3:8.2f} ms", flush=True)
    tele = coupling_telemetry(interp, w, st1.q.reshape(-1, 3)[cgi])
    tele = {k: round(float(v), 4) for k, v in tele.items()}
    print(f"telemetry: {tele}", flush=True)

    @jax.jit
    def tr(w, ro, rd):
        return trace_deformed_rbf_fast(
            scene, interp, w, ro, rd, params, image_hw=(height, width),
            need_grads=False, bound_pts=bound_pts,
        )

    dt, _ = timed(tr, w, ro, rd)
    print(f"deformed trace (fwd, {width}x{height}): {dt*1e3:8.1f} ms",
          flush=True)

    def gframes(state, ro, rd, cg_tol):
        def body(carry, _):
            st, acc = carry
            t, hit, st2 = coupled_step_grid_fast(
                scene, gf, interp, cgi, st, f_ext_g,
                ro + acc * 1e-30, rd, params=params,
                image_hw=(height, width), cg_tol=cg_tol,
                bound_pts=bound_pts,
            )
            return (st2, jnp.sum(t)), None

        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=args.frames
        )
        return acc

    gfn = jax.jit(gframes, static_argnums=(3,))
    gst0 = gf.rest_state()
    for tol in (1e-6, 1e-3):
        t0 = time.perf_counter()
        float(gfn(gst0, ro, rd, tol))
        print(f"grid compile: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        float(gfn(gst0, ro, rd, tol))
        dt = (time.perf_counter() - t0) / args.frames
        print(
            f"GRID coupled frame (tol={tol:g}): {dt * 1e3:.1f} ms = "
            f"{1 / dt:.2f} fps at {width}x{height} "
            f"({width * height / dt / 1e6:.1f}M rays/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
