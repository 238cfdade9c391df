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
    from fembrain_tpu.render.pallas_trace import trace_pallas
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

    # Pallas tile kernel on TPU; XLA path on CPU (no Mosaic there).
    tracer = trace_pallas if on_tpu else trace
    # Reduce to a scalar and read it back each iteration: on the axon
    # backend block_until_ready returns before execution completes, so
    # only a host readback gives a true wall-clock measurement.
    fn = jax.jit(lambda s, o, d: jnp.sum(tracer(s, o, d, params)[0]))
    float(fn(scene, ro, rd))  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(iters):
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


if __name__ == "__main__":
    main()
