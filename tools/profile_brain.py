#!/usr/bin/env python
"""Profile the brain-scene Pallas trace: live-block stats + tile sweep."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render.pallas_trace import (
    PRIM_BLOCK,
    _additive_layout,
    _tile_block_live,
    trace_pallas_image,
)
from fembrain_tpu.render.sphere_trace import TraceParams, prim_interval


def main() -> None:
    width, height = 1920, 1080
    sc = load_blob("data/models/blobtree/brain.blob")
    sc.flatten_instances()
    scene = sc.pack()
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, width, height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    params = TraceParams()

    print(f"prims={scene.n_prims} cap={scene.capacity_prims} "
          f"blocks={scene.capacity_prims // PRIM_BLOCK} "
          f"block_types={scene.additive_block_types}")

    # Live-block stats for the default 2048-ray (32x64 pixel) tiling.
    import math
    tile = 2048
    bh = 1 << (int(math.log2(tile)) // 2)
    bw = tile // bh
    hb, wb = -(-height // bh), -(-width // bw)
    ph, pw = hb * bh - height, wb * bw - width

    def to_blocks(a, fill):
        img = a.reshape(height, width, 3)
        img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=fill)
        img = img.reshape(hb, bh, wb, bw, 3).transpose(0, 2, 1, 3, 4)
        return img.reshape(-1, 3)

    ro_b = to_blocks(ro, 1e7)
    rd_b = to_blocks(rd, 0.0)
    mask = to_blocks(jnp.ones_like(ro), 0.0)[:, :1] > 0.5
    rd_b = jnp.where(mask, rd_b, jnp.asarray([1.0, 0.0, 0.0]))

    t_enter, t_exit, alive0 = prim_interval(scene, ro_b, rd_b)
    tiles = ro_b.shape[0] // tile
    _, blk_lo, blk_hi, _, nb = _additive_layout(scene)
    live = np.asarray(_tile_block_live(
        ro_b, rd_b, t_enter, t_exit, alive0, tiles, blk_lo, blk_hi
    ))
    alive_t = np.asarray(alive0).reshape(tiles, tile)
    tile_alive = alive_t.any(1)
    print(f"tiles={tiles} alive_tiles={int(tile_alive.sum())} "
          f"({100 * tile_alive.mean():.0f}%)")
    lb = live.sum(1)
    print(f"live blocks/tile: mean={lb.mean():.1f} "
          f"mean|alive={lb[tile_alive].mean():.1f} max={lb.max()} (of {nb})")
    print("histogram of live-blocks over alive tiles:",
          np.bincount(lb[tile_alive], minlength=nb + 1).tolist())

    # Tile-size sweep.
    for tl in (1024, 2048, 4096):
        def frames(s, o, d, tl=tl):
            def body(acc, _):
                t = trace_pallas_image(
                    s, o + acc * 1e-30, d, height, width, params, tile=tl
                )[0]
                return jnp.sum(t), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=3)
            return acc

        fn = jax.jit(frames)
        float(fn(scene, ro, rd))
        t0 = time.perf_counter()
        float(fn(scene, ro, rd))
        dt = (time.perf_counter() - t0) / 3
        print(f"tile={tl}: frame={dt * 1e3:.1f} ms "
              f"rays/s={width * height / dt / 1e6:.1f}M")


if __name__ == "__main__":
    main()
