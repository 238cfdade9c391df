#!/usr/bin/env python
"""Multi-device rays/s scaling harness (BASELINE: >= 80 % efficiency
1 chip -> 1 host -> N hosts) over the PRODUCTION Pallas tracer.

Shards trace_pallas over a device mesh (tile grid sharded on the rays
axis, scene replicated — render.pallas_trace.trace_pallas_sharded) and
reports rays/s and efficiency at 1, 2, ..., N devices. On this box real
multi-chip hardware is absent, so the default run simulates an 8-device
mesh on CPU (--xla_force_host_platform_device_count) with the kernel in
interpret mode; the same code path runs unchanged on a real TPU slice.
Results are persisted as JSON lines (--out, e.g. SCALING_r04.json).

Usage:
    python tools/scaling_bench.py [--devices 8] [--width 512]
                                  [--height 288] [--tpu] [--out FILE]
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
    ap.add_argument("--out", default=None,
                    help="append JSON records to this file")
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
    from fembrain_tpu.render.pallas_trace import trace_pallas_sharded

    sc = load_blob(args.blob)
    sc.flatten_instances()
    scene = sc.pack()
    cam = Camera.orbit(30.0, 20.0, 8.0)
    ro, rd = generate_rays(cam, args.width, args.height)
    ro = jnp.reshape(ro, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    n_rays = ro.shape[0]
    interpret = not args.tpu  # Mosaic lowers only on TPU

    avail = len(jax.devices())
    records = []

    def measure(mesh, label, nd):
        nonlocal base_rate
        sc_d = sh.replicate(mesh, scene)
        (ro_d, rd_d) = sh.shard_rays(mesh, ro, rd)

        def frames(s, o, d):
            # Chain frames in one program (carry-dependent) so the
            # per-dispatch tunnel/dispatch latency is amortized out.
            def body(acc, _):
                t, _h = trace_pallas_sharded(
                    s, o + acc * 1e-30, d, mesh, interpret=interpret
                )
                return jnp.sum(t), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=3)
            return acc

        fn = jax.jit(frames)
        float(fn(sc_d, ro_d, rd_d))  # compile + warm
        t0 = time.perf_counter()
        float(fn(sc_d, ro_d, rd_d))
        dt = (time.perf_counter() - t0) / 3
        rate = n_rays / dt
        if base_rate is None:
            base_rate = rate
        rec = {
            "tracer": "pallas" + ("-interpret" if interpret else ""),
            "tier": label,
            "devices": nd,
            "width": args.width,
            "height": args.height,
            "rays_per_s": round(rate, 1),
            "speedup": round(rate / base_rate, 2),
        }
        if args.tpu:
            # Real chips: classic strong-scaling efficiency.
            rec["efficiency"] = round(rate / (base_rate * nd), 3)
        else:
            # CPU-sim: all virtual devices share ONE physical CPU, so
            # wall-clock speedup is structurally impossible; the honest
            # metric is the parallel-OVERHEAD factor (1.0 = sharding +
            # collectives added no cost). Real efficiency needs a real
            # slice - same code path, --tpu.
            rec["sim"] = True
            rec["parallel_overhead_factor"] = round(base_rate / rate, 3)
        records.append(rec)
        print(json.dumps(rec))
        sys.stdout.flush()

    # BASELINE three-tier split: 1 chip -> 1 host (all local chips, 1-D
    # ICI mesh) -> N "hosts" (2-D ('host','chip') mesh; on this box the
    # host axis is simulated by partitioning the CPU-sim device mesh, on
    # a real pod it maps to DCN via jax.distributed - sharding.py).
    base_rate = None
    nd_all = min(avail, args.devices)
    measure(sh.make_mesh(1), "1-chip", 1)
    if nd_all >= 2:
        measure(sh.make_mesh(nd_all), "1-host", nd_all)
        n_hosts = 2
        cph = nd_all // n_hosts
        if cph >= 1:
            measure(
                sh.make_host_chip_mesh(n_hosts, cph),
                f"{n_hosts}-hosts(sim)", n_hosts * cph,
            )
    # Sharded GRID-backed coupled step (VERDICT r3 #3/#5/#6): CG
    # iterations of the production multi-chip composition per
    # preconditioner at 2/4/8 shards, plus the coupled loss for sanity.
    if not args.tpu and nd_all >= 2:
        import numpy as np

        from jax.sharding import Mesh

        from fembrain_tpu.fem import grid_fem as gfm
        from fembrain_tpu.fem import grid_sharded as gsh
        from fembrain_tpu.mesh.polygonize import (
            extract_tet_mesh, grid_for_scene,
        )
        from fembrain_tpu.mesh.samples import bottom_nodes_per_component
        from fembrain_tpu.render.coupled_sharded import (
            build_coupled_grid_sharded,
            coupled_step_grid_sharded,
        )

        vgrid = grid_for_scene(scene, cellsize=0.3)
        vtm = extract_tet_mesh(
            scene, vgrid, ncap=vgrid.n_vertices, tetcap=vgrid.n_cells * 6
        )
        vnodes = np.asarray(vtm.nodes)[: int(vtm.n_nodes)]
        vtets = np.asarray(vtm.tets)[: int(vtm.n_tets)]
        vfix = bottom_nodes_per_component(vnodes, vtets, frac=0.25)
        n2g = gfm.node_to_grid_index(vtm)
        cam2 = Camera.orbit(30.0, 20.0, 8.0)
        ro2, rd2 = generate_rays(cam2, 64, 36)
        ro2, rd2 = ro2.reshape(-1, 3), rd2.reshape(-1, 3)
        for nd in (2, 4, 8):
            if nd > nd_all:
                continue
            cgs = build_coupled_grid_sharded(
                vgrid, vtm, nd, fixed_nodes=vfix, n_centers=64,
                kernel="wendland",
            )
            gmesh = Mesh(np.array(jax.devices()[:nd]), (gsh.GRID_AXIS,))
            fg = np.zeros((int(np.prod(vgrid.dims)), 3), np.float32)
            fg[n2g, 1] = -300.0 * np.asarray(
                cgs.sgf.gfull.mass
            ).reshape(-1)[n2g]
            fgs = gsh.to_shard_layout(
                cgs.sgf, jnp.asarray(fg.reshape(*vgrid.dims, 3))
            )
            q, v, dv = cgs.sgf.rest_state()
            its = {}
            for prec in ("hybrid", "global_mg", "schwarz"):
                _, _, _, it = jax.jit(
                    lambda q, v, dv, p=prec: gsh.sharded_timestep(
                        cgs.sgf, gmesh, q, v, fgs, dv=dv, precond=p
                    )
                )(q, v, dv)
                its[prec] = int(it)
            t, hit, _, itc = jax.jit(
                lambda q, v, dv: coupled_step_grid_sharded(
                    scene, cgs, gmesh, q, v, dv, fgs, ro2, rd2,
                    use_pallas=False,
                )
            )(q, v, dv)
            rec = {
                "stage": "coupled_grid_sharded",
                "devices": nd,
                "tets": int(vtm.n_tets),
                "cg_iters": {**its, "coupled(hybrid)": int(itc)},
                "loss": round(
                    float(jnp.sum(jnp.where(hit, t, 0.0))), 3
                ),
                "sim": True,
            }
            records.append(rec)
            print(json.dumps(rec))
            sys.stdout.flush()

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
