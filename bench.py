#!/usr/bin/env python
"""Headline benchmark: sphere-traced rays/s/chip on the flagship BlobTree.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 62.208e6 — the rays/s a single chip needs to
sphere-trace 1080p at 30 fps (the BASELINE.json north-star rate); the
reference itself publishes no numbers (BASELINE.md).

Secondary metrics (stderr JSON lines):
  - rays_per_sec_per_chip_brain_1080p       (BASELINE config #3;
    synthesized brain — reference assets stripped from the mount)
  - polygonize_ms_{ventricle,brain}         (+ tet_extract_ms: the
    reference's msPolyTriangleMesh/msPolyTetrahedraMesh fields)
  - coupled_fps_1080p_{ventricle,brain}     (BASELINE config #5, grid FEM
    + RBF displacement + Pallas deformed trace, with a per-stage
    decomposition fem/rbf/trace in ms)
  - fem_solve_steps_per_sec                 (unstructured solver, cube)
  - fem_grid_steps_per_sec_ventricle        (production grid-MG solver)
  - grad_check_max_rel_err                  (1-prim sphere: autodiff vs
    FD on the largest-gradient primitive, FD magnitude asserted > 0)
  - grad_check_ventricle_max_rel_err        (17-prim blend w/ cylinders)
  - coupled_E_grad_rel_err[_ventricle]      (image loss -> Young's
    modulus through custom_linear_solve + implicit hit differentiation
    vs FD, f64 CPU subprocess — tools/egrad_check.py; the r3 f32
    in-process version was FD noise, not a bug)
  - coupled_E_grad_rel_err_f32_device       (same graph in f32 on the
    bench backend, FD eps set >= 100x the measured noise floor — this
    check caught the bf16-matmul gradient corruption in r5)
"""
from __future__ import annotations

import json
import sys
import time


def _timed_frames(fn, *args, iters=3):
    """Median-free simple wall timer over a pre-compiled chained-frames
    callable (the callable itself runs `iters` frames device-side)."""
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.pallas_trace import trace_pallas_image
    from fembrain_tpu.render.sphere_trace import TraceParams, trace

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    width, height = (1920, 1080) if on_tpu else (320, 180)
    # Sustained-throughput chains: a single dispatch+readback over this
    # box's TPU tunnel costs ~24 ms, so short chains under-report the
    # device rate by ~24/N ms per frame (measured 20.8 -> 12.9 ms/frame
    # rest trace going 3 -> 30 chained frames). Real-time rendering is
    # a continuous frame stream — the reference's own FPS metric is a
    # moving average over frames (SceneGraph.h:141-146) — so the bench
    # reports the sustained per-frame rate over a 30-frame chain.
    iters = 30 if on_tpu else 3

    sc = load_blob("/root/reference/data/models/blobtree/ventricle.blob")
    sc.flatten_instances()
    scene = sc.pack()
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    params = TraceParams()

    # Pallas tile kernel on TPU with block-coherent (32x64 pixel) tiles:
    # spatial tiles give compact ray hulls, so the per-tile prim-block
    # culling skips most of the scene per march step (brain: 3x over
    # row-major tiles). XLA path on CPU (no Mosaic).
    if on_tpu:
        def tracer(s, o, d):
            return trace_pallas_image(s, o, d, height, width, params)
    else:
        def tracer(s, o, d):
            return trace(s, o, d, params)

    # A single host<->device round trip costs ~25 ms on this tunnel, so
    # per-frame dispatch+readback would swamp the measurement. Chain
    # `iters` frames in one lax.scan (each depends on the previous via a
    # ray-origin epsilon so XLA cannot hoist the body) and read back one
    # scalar: wall clock / iters = true per-frame device time.
    def frames(s, o, d):
        def body(acc, _):
            t = tracer(s, o + acc * 1e-30, d)[0]
            return jnp.sum(t), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return acc

    dt = _timed_frames(jax.jit(frames), scene, ro, rd, iters=iters)
    rays_per_sec = width * height / dt
    target = 62.208e6  # 1920*1080*30
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_per_chip_sphere_trace",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec / target, 4),
            }
        )
    )
    print(
        f"# backend={backend} {width}x{height} scene=ventricle "
        f"prims={scene.n_prims} frame={dt*1e3:.1f}ms",
        file=sys.stderr,
    )
    _brain_metric(tracer, params, width, height, iters, target)
    _poly_metrics(on_tpu)
    _coupled_metric("ventricle", 0.14, width, height, on_tpu)
    _coupled_metric("brain", 0.14, width, height, on_tpu)
    _secondary_metrics(on_tpu)
    _gradient_metrics(on_tpu)


def _load_scene(name: str):
    from fembrain_tpu.blob.reader import load_blob

    for path in (
        f"data/models/blobtree/{name}.blob",
        f"/root/reference/data/models/blobtree/{name}.blob",
    ):
        try:
            sc = load_blob(path)
            break
        except FileNotFoundError:
            continue
    else:
        return None
    sc.flatten_instances()
    return sc.pack()


def _brain_metric(tracer, params, width, height, iters, target) -> None:
    """BASELINE config #3: the full brain BlobTree (~220 prims) at 1080p,
    as a stderr JSON line (the stdout contract stays the single headline)."""
    import jax
    import jax.numpy as jnp

    from fembrain_tpu.render.camera import Camera, generate_rays

    scene = _load_scene("brain")
    if scene is None:
        print("# brain scene missing", file=sys.stderr)
        return
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))

    def frames(s, o, d):
        def body(acc, _):
            t = tracer(s, o + acc * 1e-30, d)[0]
            return jnp.sum(t), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return acc

    dt = _timed_frames(jax.jit(frames), scene, ro, rd, iters=iters)
    rays_per_sec = width * height / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_per_chip_brain_1080p",
                "value": round(rays_per_sec, 1),
                # The reference's brain assets are stripped from this
                # mount (.MISSING_LARGE_BLOBS); this scene is
                # synthesized to reference scale by tools/make_brain.py.
                "unit": f"rays/s/chip ({scene.n_prims} prims, "
                        "synthesized brain)",
                "vs_baseline": round(rays_per_sec / target, 4),
            }
        ),
        file=sys.stderr,
    )


def _poly_metrics(on_tpu: bool) -> None:
    """Polygonization timings (VERDICT r4 #6, the reference's
    msPolyTriangleMesh / msPolyTetrahedraMesh DBLogger fields,
    src/deformable/DBLogger.h:31-61): the 7-pass marching pipeline and
    the 6-tet/voxel embedded-mesh extraction at the app cellsize."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.mesh.polygonize import (
        default_caps, extract_tet_mesh, grid_for_scene, polygonize,
    )

    n = 5 if on_tpu else 2
    for name in ("ventricle", "brain"):
        scene = _load_scene(name)
        if scene is None:
            continue
        cellsize = 0.14 if on_tpu else 0.3
        grid = grid_for_scene(scene, cellsize=cellsize)
        vcap, tcap = default_caps(grid)

        @jax.jit
        def poly_frames(s):
            def body(acc, _):
                s2 = dc.replace(s, prim_pos=s.prim_pos + acc * 1e-30)
                m = polygonize(s2, grid, vcap, tcap)
                return jnp.sum(m.verts) * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return acc

        @jax.jit
        def tet_frames(s):
            def body(acc, _):
                s2 = dc.replace(s, prim_pos=s.prim_pos + acc * 1e-30)
                tm = extract_tet_mesh(
                    s2, grid, ncap=grid.n_vertices,
                    tetcap=grid.n_cells * 6,
                )
                return jnp.sum(tm.nodes) * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return acc

        tri_ms = _timed_frames(poly_frames, scene, iters=n) * 1e3
        tet_ms = _timed_frames(tet_frames, scene, iters=n) * 1e3
        m = jax.jit(
            lambda s: polygonize(s, grid, vcap, tcap)
        )(scene)
        tm = jax.jit(
            lambda s: extract_tet_mesh(
                s, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
            )
        )(scene)
        print(
            json.dumps(
                {
                    "metric": f"polygonize_ms_{name}",
                    "value": round(tri_ms, 2),
                    "unit": (
                        f"ms/run at cellsize {cellsize} "
                        f"({int(m.n_verts)} verts, {int(m.n_tris)} tris)"
                    ),
                    "tet_extract_ms": round(tet_ms, 2),
                    "tet_counts": [int(tm.n_nodes), int(tm.n_tets)],
                }
            ),
            file=sys.stderr,
        )


def _coupled_metric(name: str, cellsize: float, width: int, height: int,
                    on_tpu: bool) -> None:
    """BASELINE config #5: the coupled render+deform frame at 1080p —
    grid-structured FEM (stencil matvec + multigrid CG) -> RBF
    displacement weights -> Pallas deformed trace, one jitted graph.
    Emits coupled fps plus the per-stage decomposition."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.deformed import (
        build_disp_interp,
        coupled_step_grid_fast,
        disp_weights_centers,
        trace_deformed_rbf_fast,
    )
    from fembrain_tpu.render.sphere_trace import TraceParams

    scene = _load_scene(name)
    if scene is None:
        print(f"# {name} scene missing", file=sys.stderr)
        return
    if not on_tpu:
        cellsize = max(cellsize, 0.3)  # CPU CI: keep the mesh small
    grid = grid_for_scene(scene, cellsize=cellsize)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    n_nodes, n_tets = int(tm.n_nodes), int(tm.n_tets)
    nodes = np.asarray(tm.nodes)[:n_nodes]
    tets = np.asarray(tm.tets)[:n_tets]
    # Anchor every disjoint component (the ventricle is several lobes; a
    # global bottom plane would leave the rest in free fall).
    fixed = bottom_nodes_per_component(nodes, tets, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    # Production displacement interpolant (round 4): compact-support
    # wendland kernel — the Pallas march culls center blocks per tile, so
    # 256 centers cost less than 128 biharmonic ones (trace_cost_sweep).
    interp = build_disp_interp(nodes, n_centers=256, fixed=fixed,
                               kernel="wendland", sigma_fill=2.5)
    # March refresh cycle: higher-curvature displacement fields drift
    # off the per-lane linear model faster, so the synthesized brain
    # (max|grad u| 0.129 vs the ventricle's 0.100) runs shorter cycles
    # (r5 sweep: brain 41.7 ms at k=4 vs 47.0 at k=8; ventricle 25.4 at
    # k=8 vs 29.9 at k=4, chain-10 1080p).
    k_refresh = 4 if name == "brain" else 0
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
    n_frames = 10 if on_tpu else 3
    bound_pts = jnp.asarray(nodes[:: max(1, len(nodes) // 4096)])
    # Forward-rendering CG tolerance: the knee sweep (tools/
    # fem_tol_knee.py r5) shows warm-started frames at EVERY tol
    # through 3e-2 match the 1e-6 trajectory to ~3e-8 displacement (the
    # f32 noise floor; the relative tolerance self-scales — transients
    # have larger residuals and automatically take more iterations).
    # 1e-2 (14.2 iters, 10.4 ms/step vs 28.6 at 1e-6) keeps a 3x
    # tolerance margin below the flat region's edge.
    cg_tol = 1e-2

    # Settle to quasi-static sag (untimed): frames from rest are a
    # gravity transient with L > 1 that zeroes the adaptive march.
    @jax.jit
    def settle(st):
        def body(st, _):
            st2, _ = gfm.timestep(gf, st, f_ext)
            return st2, None
        st, _ = jax.lax.scan(body, st, None, length=40)
        return st

    st0 = settle(gf.rest_state())
    jax.block_until_ready(st0.q)

    # Stage decomposition (each stage chained device-side like the frame).
    @jax.jit
    def fem_only(st):
        def body(st, _):
            st2, _ = gfm.timestep(gf, st, f_ext, cg_tol=cg_tol)
            return st2, None
        st, _ = jax.lax.scan(body, st, None, length=n_frames)
        return jnp.sum(st.q)

    fem_ms = _timed_frames(fem_only, st0, iters=n_frames) * 1e3

    st1, _ = jax.jit(lambda s: gfm.timestep(gf, s, f_ext, cg_tol=cg_tol))(st0)

    @jax.jit
    def rbf_only(st):
        return disp_weights_centers(interp, st.q.reshape(-1, 3)[cgi])

    w = rbf_only(st1)
    jax.block_until_ready(w)
    t0 = time.perf_counter()
    for _ in range(10):
        w = rbf_only(st1)
    jax.block_until_ready(w)
    rbf_ms = (time.perf_counter() - t0) / 10 * 1e3

    @jax.jit
    def trace_only(w, o, d):
        def body(acc, _):
            t, _h = trace_deformed_rbf_fast(
                scene, interp, w, o + acc * 1e-30, d, params,
                image_hw=(height, width) if on_tpu else None,
                need_grads=False, bound_pts=bound_pts,
                k_refresh=k_refresh,
            )
            return jnp.sum(t), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n_frames)
        return acc

    trace_ms = _timed_frames(trace_only, w, ro, rd, iters=n_frames) * 1e3

    # The fused coupled frame.
    def cframes(state, o, d):
        def body(carry, _):
            st, acc = carry
            t, _hit, st2 = coupled_step_grid_fast(
                scene, gf, interp, cgi, st, f_ext, o + acc * 1e-30, d,
                params=params, image_hw=(height, width) if on_tpu else None,
                use_pallas=on_tpu, bound_pts=bound_pts, cg_tol=cg_tol,
                k_refresh=k_refresh,
            )
            return (st2, jnp.sum(t)), None
        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=n_frames
        )
        return acc

    dt = _timed_frames(jax.jit(cframes), st0, ro, rd, iters=n_frames)
    print(
        json.dumps(
            {
                "metric": f"coupled_fps_1080p_{name}",
                "value": round(1.0 / dt, 2),
                "unit": f"fps at {width}x{height} ({n_tets} tets, "
                        f"{scene.n_prims} prims"
                        + (", synthesized brain)" if name == "brain"
                           else ")"),
                "frame_ms": round(dt * 1e3, 1),
                "fem_ms": round(fem_ms, 1),
                "rbf_ms": round(rbf_ms, 2),
                "trace_ms": round(trace_ms, 1),
                "vs_baseline": round((1.0 / dt) / 30.0, 4),
            }
        ),
        file=sys.stderr,
    )


def _secondary_metrics(on_tpu: bool) -> None:
    """FEM solve steps/s: the legacy unstructured solver on a truth cube
    (round-over-round continuity) and the production grid-multigrid
    solver on the ventricle's own 61k-tet embedded mesh.

    NOTE on the r2 -> r3 fem_solve_steps_per_sec drop (44.65 -> ~36,
    cg_iters 208 -> 258): round 3 forced f32 MXU precision on every
    einsum feeding the CG operator (fem/integrator.py _F32 — the TPU
    bf16 default perturbs K_eff ~0.4% and makes CG DIVERGE at the
    61k-tet production mesh). The r2 number was measured on the subtly
    wrong bf16 operator; the slowdown is the price of a correct solve,
    not a regression in the solver."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.fem import integrator as integ
    from fembrain_tpu.fem.integrator import FemState
    from fembrain_tpu.fem.tetmesh import build_fem_mesh
    from fembrain_tpu.mesh import samples
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component

    n = 10 if on_tpu else 5
    nodes, tets = samples.truth_cube(n, n, n, 0.1)
    mesh = build_fem_mesh(nodes, tets, fixed=samples.bottom_nodes(nodes))
    f = jnp.zeros((len(nodes), 3)).at[:, 1].set(-1000.0)
    steps = 30 if on_tpu else 5

    def run(st):
        def one(st, _):
            st2, it = integ.timestep(mesh, st, f, h=0.0333)
            return st2, it
        st, its = jax.lax.scan(one, st, None, length=steps)
        return jnp.sum(st.q), its

    runj = jax.jit(run)
    s, its = runj(FemState.rest(mesh))
    float(s)  # compile + warmup
    t0 = time.perf_counter()
    s, its = runj(FemState.rest(mesh))
    float(s)
    dt = (time.perf_counter() - t0) / steps
    its = np.asarray(its)
    print(
        json.dumps(
            {
                "metric": "fem_solve_steps_per_sec",
                "value": round(1.0 / dt, 2),
                "unit": f"steps/s ({mesh.n_tets} tets, unstructured)",
                "cg_iters_mean": round(float(its.mean()), 1),
                "cg_iters_max": int(its.max()),
            }
        ),
        file=sys.stderr,
    )

    # Production grid solver at the app's ventricle mesh.
    scene = _load_scene("ventricle")
    cellsize = 0.14 if on_tpu else 0.3
    grid = grid_for_scene(scene, cellsize=cellsize)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nvn = int(tm.n_nodes)
    vnodes = np.asarray(tm.nodes)[:nvn]
    vtets = np.asarray(tm.tets)[: int(tm.n_tets)]
    fixed = bottom_nodes_per_component(vnodes, vtets, frac=0.25)
    gf = gfm.grid_fem_from_tetmesh(grid, tm, fixed_nodes=fixed)
    n2g = gfm.node_to_grid_index(tm)
    fg = np.zeros((int(np.prod(grid.dims)), 3), np.float32)
    fg[n2g, 1] = -500.0 * np.asarray(gf.mass).reshape(-1)[n2g]
    fg = jnp.asarray(fg.reshape(*grid.dims, 3))

    def grun(st):
        def one(st, _):
            st2, it = gfm.timestep(gf, st, fg)
            return st2, it
        st, its = jax.lax.scan(one, st, None, length=steps)
        return jnp.sum(st.q), its

    grunj = jax.jit(grun)
    s, its = grunj(gf.rest_state())
    float(s)
    t0 = time.perf_counter()
    s, its = grunj(gf.rest_state())
    float(s)
    dt = (time.perf_counter() - t0) / steps
    its = np.asarray(its)
    print(
        json.dumps(
            {
                "metric": "fem_grid_steps_per_sec_ventricle",
                "value": round(1.0 / dt, 2),
                "unit": f"steps/s ({int(tm.n_tets)} tets, grid+multigrid)",
                "cg_iters_mean": round(float(its.mean()), 1),
                "cg_iters_max": int(its.max()),
            }
        ),
        file=sys.stderr,
    )


def _gradient_metrics(on_tpu: bool) -> None:
    """Gradient fidelity (BASELINE 'grad-check max err'): the 1-prim
    sphere (continuity with r1/r2), the 17-prim ventricle (cylinders +
    blends through the implicit-hit path), and the coupled E-gradient
    through the FEM solve (custom_linear_solve)."""
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.sphere_trace import trace

    def scene_grad_check(name: str, zoom: float):
        """Autodiff-vs-FD on d(sum of hit t)/d(prim_pos).

        VERDICT r4 #3: the old version always differentiated prim 0,
        whose gradient at this camera can be exactly zero (no hit ray
        in its support) — a vacuous 0-vs-0 comparison. Now the check
        (a) asserts rays actually hit, (b) picks the primitive with the
        LARGEST autodiff gradient, and (c) asserts the FD magnitude is
        above a floor, so the reported rel err certifies a real
        gradient."""
        scene = _load_scene(name)
        cam = Camera.orbit(15.0, 10.0, zoom)
        ro, rd = generate_rays(cam, 16, 16)
        ro_, rd_ = ro.reshape(-1, 3), rd.reshape(-1, 3)

        _, hit0 = jax.jit(lambda s: trace(s, ro_, rd_))(scene)
        n_hit = int(jnp.sum(hit0))
        assert n_hit > 0, f"{name}: no hit rays at the check camera"

        def loss(pos):
            s = dataclasses.replace(scene, prim_pos=pos)
            t, hit = trace(s, ro_, rd_)
            return jnp.sum(jnp.where(hit, t, 0.0))

        g_all = np.asarray(jax.jit(jax.grad(loss))(scene.prim_pos))
        p = int(np.argmax(np.abs(g_all[: scene.n_prims]).sum(-1)))
        g = g_all[p]
        loss_j = jax.jit(loss)
        eps = 1e-3
        base = np.asarray(scene.prim_pos)
        err = 0.0
        fd_mag = 0.0
        for k in range(3):
            dp, dm = base.copy(), base.copy()
            dp[p, k] += eps
            dm[p, k] -= eps
            fd = (
                float(loss_j(jnp.asarray(dp)))
                - float(loss_j(jnp.asarray(dm)))
            ) / (2 * eps)
            fd_mag = max(fd_mag, abs(fd))
            err = max(err, float(abs(g[k] - fd)) / max(1.0, abs(fd)))
        # A zero-vs-zero comparison certifies nothing: require a real
        # gradient on the differentiated primitive.
        assert fd_mag > 1e-3, f"{name}: |FD| {fd_mag:.2e} below floor"
        return err, p, fd_mag, n_hit

    err_s, p_s, fd_s, hit_s = scene_grad_check("sphere", 2.0)
    print(
        json.dumps(
            {
                "metric": "grad_check_max_rel_err",
                "value": round(err_s, 6),
                "unit": f"relative (sphere, 1 prim, |FD|={fd_s:.3g}, "
                        f"{hit_s} hit rays)",
            }
        ),
        file=sys.stderr,
    )
    err_v, p_v, fd_v, hit_v = scene_grad_check("ventricle", 8.0)
    print(
        json.dumps(
            {
                "metric": "grad_check_ventricle_max_rel_err",
                "value": round(err_v, 6),
                "unit": f"relative (ventricle, 17 prims, prim {p_v}, "
                        f"|FD|={fd_v:.3g}, {hit_v} hit rays)",
            }
        ),
        file=sys.stderr,
    )

    # Coupled E-gradient: d(image loss)/d(E_scale) through the implicit
    # FEM solve + deformed trace vs central finite differences, run in
    # FLOAT64 in a CPU subprocess (tools/egrad_check.py). The round-3
    # in-process f32 version of this check reported rel err 3.23 — that
    # was FD cancellation noise, not a gradient bug: the FD increment
    # (~1e-4 on a ~50-magnitude loss) sits at the f32 trace's arithmetic
    # noise floor, while the identical graph in f64 matches autodiff to
    # ~4e-4 with a stable hit set (tools/egrad_diag.py eps sweep).
    # Gradient correctness is a property of the traced graph, not the
    # accelerator, so the f64 CPU run validates the same program.
    import os
    import subprocess
    from pathlib import Path

    check = Path(__file__).resolve().parent / "tools" / "egrad_check.py"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_ENABLE_X64")}
    for scene_name in ("sphere", "ventricle"):
        try:
            out = subprocess.run(
                [sys.executable, str(check), "--scene", scene_name],
                capture_output=True, text=True, timeout=900, env=env,
            )
            line = out.stdout.strip().splitlines()[-1]
            res = json.loads(line)
            suffix = "" if scene_name == "sphere" else "_ventricle"
            print(
                json.dumps(
                    {
                        "metric": f"coupled_E_grad_rel_err{suffix}",
                        "value": res["rel_err"],
                        "unit": (
                            f"relative, f64 "
                            f"(autodiff {res['autodiff']:.4g} vs "
                            f"FD {res['fd']:.4g}, eps={res['eps']:g}, "
                            f"hit_flips={res['hit_flips']}, "
                            f"{res.get('n_hit', '?')} hit rays)"
                        ),
                    }
                ),
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — bench must keep printing
            print(f"# coupled_E_grad {scene_name} check failed: {e}",
                  file=sys.stderr)
    _egrad_f32_on_device()


def _egrad_f32_on_device() -> None:
    """On-device f32 E-gradient check (VERDICT r4 #4): same coupled
    graph as tools/egrad_check.py on the ventricle, run in-process on
    the bench backend, with the FD eps chosen ABOVE the measured f32
    noise floor (the r3 failure mode was probing a 1e-4 loss increment
    against ~1e-4 trace noise; here sigma is measured by an epsilon
    perturbation whose true signal is negligible, and eps is scaled so
    the FD increment is >= ~100x sigma)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fembrain_tpu.fem import grid_fem as gfm
    from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
    from fembrain_tpu.mesh.samples import bottom_nodes_per_component
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.deformed import (
        build_disp_interp,
        coupled_step_grid_fast,
    )

    try:
        scene = _load_scene("ventricle")
        grid = grid_for_scene(scene, cellsize=0.35)
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
        f_ext = np.zeros((int(np.prod(grid.dims)), 3), np.float32)
        f_ext[n2g, 1] = -200.0 * np.asarray(gf.mass).reshape(-1)[n2g]
        f_ext = jnp.asarray(f_ext.reshape(*grid.dims, 3))
        cam = Camera.orbit(30.0, 20.0, 8.0)
        ro, rd = generate_rays(cam, 24, 18)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)

        @jax.jit
        def loss(es):
            t, hit, _ = coupled_step_grid_fast(
                scene, gf, interp, cgi, gf.rest_state(), f_ext, ro, rd,
                E_scale=es, differentiable=True, use_pallas=False,
            )
            return jnp.sum(jnp.where(hit, t, 0.0))

        g = float(jax.jit(jax.grad(loss))(jnp.float32(1.0)))
        l0 = float(loss(jnp.float32(1.0)))
        # f32 noise floor: a perturbation whose TRUE effect (~1e-6*g)
        # is far below arithmetic noise — the measured delta IS sigma.
        sigma = abs(float(loss(jnp.float32(1.0 + 1e-6))) - l0)
        eps = float(np.clip(100.0 * sigma / max(abs(g), 1e-9), 0.05, 0.3))
        fd = (float(loss(jnp.float32(1 + eps)))
              - float(loss(jnp.float32(1 - eps)))) / (2 * eps)
        rel = abs(g - fd) / max(1e-12, abs(fd))
        print(
            json.dumps(
                {
                    "metric": "coupled_E_grad_rel_err_f32_device",
                    "value": round(rel, 4),
                    "unit": (
                        f"relative, f32 on {jax.default_backend()} "
                        f"(autodiff {g:.4g} vs FD {fd:.4g}, eps={eps:.3g} "
                        f"set >=100x the measured noise floor "
                        f"sigma={sigma:.2g} on loss {l0:.4g})"
                    ),
                }
            ),
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001 — bench must keep printing
        print(f"# f32 on-device E-grad check failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
