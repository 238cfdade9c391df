#!/usr/bin/env python
"""Headline benchmark: sphere-traced rays/s/chip on the flagship BlobTree.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 62.208e6 — the rays/s a single chip needs to
sphere-trace 1080p at 30 fps (the BASELINE.json north-star rate); the
reference itself publishes no numbers (BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time


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
    iters = 3

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

    fn = jax.jit(frames)
    float(fn(scene, ro, rd))  # compile + warmup

    t0 = time.perf_counter()
    float(fn(scene, ro, rd))
    dt = (time.perf_counter() - t0) / iters

    rays = width * height
    rays_per_sec = rays / dt
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
    _secondary_metrics(on_tpu)


def _brain_metric(tracer, params, width, height, iters, target) -> None:
    """BASELINE config #3: the full brain BlobTree (~220 prims) at 1080p,
    as a stderr JSON line (the stdout contract stays the single headline)."""
    import jax
    import jax.numpy as jnp

    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.render.camera import Camera, generate_rays

    path = "data/models/blobtree/brain.blob"
    try:
        sc = load_blob(path)
    except FileNotFoundError:
        print(f"# brain scene missing: {path}", file=sys.stderr)
        return
    sc.flatten_instances()
    scene = sc.pack()
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

    fn = jax.jit(frames)
    float(fn(scene, ro, rd))
    t0 = time.perf_counter()
    float(fn(scene, ro, rd))
    dt = (time.perf_counter() - t0) / iters
    rays_per_sec = width * height / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_per_chip_brain_1080p",
                "value": round(rays_per_sec, 1),
                "unit": f"rays/s/chip ({scene.n_prims} prims)",
                "vs_baseline": round(rays_per_sec / target, 4),
            }
        ),
        file=sys.stderr,
    )


def _secondary_metrics(on_tpu: bool) -> None:
    """The other BASELINE metrics (FEM solve steps/s, grad-check max err)
    as stderr JSON lines; the driver's contract is the single stdout line
    from main()."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fembrain_tpu.fem import integrator as integ
    from fembrain_tpu.fem.integrator import FemState
    from fembrain_tpu.fem.tetmesh import build_fem_mesh
    from fembrain_tpu.mesh import samples

    # FEM solve steps/s on a truth cube (size scaled to backend). The sim
    # loop runs device-resident (lax.scan chain, one readback), exactly as
    # the app would deploy it — per-dispatch tunnel latency excluded.
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
                "unit": f"steps/s ({mesh.n_tets} tets)",
                "cg_iters_mean": round(float(its.mean()), 1),
                "cg_iters_max": int(its.max()),
            }
        ),
        file=sys.stderr,
    )

    # Grad-check: autodiff vs central finite differences through the
    # sphere tracer (BASELINE 'grad-check max err').
    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.sphere_trace import trace

    scene = load_blob(
        "/root/reference/data/models/blobtree/sphere.blob"
    ).pack()
    cam = Camera.orbit(15.0, 10.0, 2.0)
    ro, rd = generate_rays(cam, 16, 16)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)

    def loss(pos):
        s = dataclasses.replace(scene, prim_pos=pos)
        t, hit = trace(s, ro, rd)
        return jnp.sum(jnp.where(hit, t, 0.0))

    g = np.asarray(jax.jit(jax.grad(loss))(scene.prim_pos))[0]
    loss_j = jax.jit(loss)
    eps = 1e-3
    base = np.asarray(scene.prim_pos)
    err = 0.0
    for k in range(3):
        dp, dm = base.copy(), base.copy()
        dp[0, k] += eps
        dm[0, k] -= eps
        fd = (
            float(loss_j(jnp.asarray(dp))) - float(loss_j(jnp.asarray(dm)))
        ) / (2 * eps)
        err = max(err, float(abs(g[k] - fd)) / max(1.0, abs(fd)))
    print(
        json.dumps(
            {
                "metric": "grad_check_max_rel_err",
                "value": round(err, 6),
                "unit": "relative",
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
