#!/usr/bin/env python
"""Multi-device rays/s scaling harness (BASELINE: >= 80 % efficiency
1 chip -> 1 host -> N hosts).

Shards a sphere-trace render over a 1-D device mesh (rays sharded, scene
replicated — parallel/sharding.py) and reports rays/s and efficiency at
1, 2, ..., N devices. On this box real multi-chip hardware is absent, so
the default run simulates an 8-device mesh on CPU
(--xla_force_host_platform_device_count); the same code path runs
unchanged on a real TPU slice.

Usage:
    python tools/scaling_bench.py [--devices 8] [--width 512]
                                  [--height 288] [--tpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--blob", default=(
        "/root/reference/data/models/blobtree/ventricle.blob"))
    ap.add_argument("--tpu", action="store_true",
                    help="use the real TPU backend (default: CPU-sim mesh)")
    args = ap.parse_args(argv)

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
    import jax
    import jax.numpy as jnp

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from fembrain_tpu.blob.reader import load_blob
    from fembrain_tpu.parallel import sharding as sh
    from fembrain_tpu.render.camera import Camera, generate_rays
    from fembrain_tpu.render.sphere_trace import trace

    sc = load_blob(args.blob)
    sc.flatten_instances()
    scene = sc.pack()
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, args.width, args.height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    n_rays = ro.shape[0]

    avail = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= min(avail, args.devices)]
    base_rate = None
    for nd in counts:
        mesh = sh.make_mesh(nd)
        sc_d = sh.replicate(mesh, scene)
        (ro_d, rd_d) = sh.shard_rays(mesh, ro, rd)
        fn = jax.jit(lambda s, o, d: jnp.sum(trace(s, o, d)[0]))
        float(fn(sc_d, ro_d, rd_d))  # compile + warm
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            float(fn(sc_d, ro_d, rd_d))
        dt = (time.perf_counter() - t0) / iters
        rate = n_rays / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(json.dumps({
            "devices": nd,
            "rays_per_s": round(rate, 1),
            "speedup": round(rate / base_rate, 2),
            "efficiency": round(eff, 3),
        }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
