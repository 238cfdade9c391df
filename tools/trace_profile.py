#!/usr/bin/env python
"""Dissect the Pallas sphere-trace frame time: march vs refine vs culling,
tile-size sensitivity, and march-iteration statistics."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render.pallas_trace import trace_pallas_image
from fembrain_tpu.render.sphere_trace import TraceParams, prim_interval


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ventricle"
    path = (
        f"/root/reference/data/models/blobtree/{name}.blob"
        if name != "brain"
        else "data/models/blobtree/brain.blob"
    )
    sc = load_blob(path)
    sc.flatten_instances()
    scene = sc.pack()
    W, H = 1920, 1080
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, W, H)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    nrays = W * H

    # Baseline per param combos
    for tile in (1024, 2048, 4096):
        for bisect in (6, 0):
            p = TraceParams(bisect_steps=bisect)
            fn = jax.jit(
                lambda s, o, d, p=p, tile=tile: trace_pallas_image(
                    s, o, d, H, W, p, tile=tile
                )
            )
            dt = timeit(fn, scene, ro, rd)
            print(
                f"tile={tile} bisect={bisect}: {dt*1e3:7.2f} ms "
                f"({nrays/dt/1e6:6.1f} Mrays/s)"
            )

    # max_steps sensitivity (march cost estimate)
    for ms in (40, 80, 160):
        p = TraceParams(max_steps=ms)
        fn = jax.jit(
            lambda s, o, d, p=p: trace_pallas_image(s, o, d, H, W, p)
        )
        dt = timeit(fn, scene, ro, rd)
        print(f"max_steps={ms}: {dt*1e3:7.2f} ms")

    # bracket stats: how long are the march segments?
    te, tx, alive = jax.jit(prim_interval)(scene, ro, rd)
    te, tx, alive = np.asarray(te), np.asarray(tx), np.asarray(alive)
    seg = (tx - te)[alive]
    lo = scene.bbox_lo - 0.05
    hi = scene.bbox_hi + 0.05
    diag = float(np.linalg.norm(np.asarray(hi - lo)))
    base = diag / 160
    print(
        f"alive rays: {alive.mean()*100:.1f}%  "
        f"seg len mean={seg.mean():.3f} p90={np.percentile(seg,90):.3f} "
        f"max={seg.max():.3f}  base_step={base:.4f} "
        f"(mean seg/base = {seg.mean()/base:.1f} steps worst-case fixed)"
    )


if __name__ == "__main__":
    main()
