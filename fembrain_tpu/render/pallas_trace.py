"""Pallas TPU sphere-tracing kernel.

The XLA `lax.while_loop` tracer (render.sphere_trace) round-trips the full
ray state through HBM every march iteration and can only early-exit when
ALL rays finish. This kernel tiles rays into VMEM-resident lane blocks:
each tile marches entirely on-chip with its own early exit — finished
(coherent) tiles stop evaluating the field — and the BlobTree scene arrays
live in VMEM for the whole tile.

Layout: everything inside the kernel is strictly 2-D (Mosaic has no 3-D
vectors and cannot reshape across lanes): per-ray state is [1, TILE] on
lanes, and the field evaluation uses the transposed row form
(ops.field.field_rows) with primitives on sublanes — the local transform
is one [P,4]x[4,TILE] matmul on the MXU.

The kernel is forward-only; implicit differentiation of the hit parameter
happens outside (one field + gradient eval at the root), so gradients are
exactly those of the XLA path. Scenes with warp chains or very large op
counts fall back to the XLA path (ops.field.supports_rows_fast_path).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..blob.scene import Scene
from ..ops.field import (
    field,
    field_rows,
    rows_prim_fields,
    supports_rows_fast_path,
)
from .sphere_trace import TraceParams, support_radius_bound, trace as trace_xla

TILE = 2048  # rays per kernel instance (lanes)
DEBUG_MARCH_ITERS = False  # write march while-iteration counts to hit_out
DEBUG_PULLBACK_ABLATE = 0  # 0=full, 1=affine-only, 2=identity pull-back
DEBUG_PULL_STATS = False   # t_out = per-lane pulled-eval count,
                           # hit_out = tile pull evals (lane 0 carries
                           # the tile's total live-center-block evals)
PRIM_BLOCK = 8  # prims per cull block (f32 sublane granularity)
K_REFRESH = 8   # deformed-march evals between pull-back refreshes (the
                # per-lane linear rest-point model rides in between;
                # staleness is certified into the step slack)
CEN_BLOCK = 32  # RBF centers per cull block (wendland deformed trace):
                # big enough that each un-culled block is one meaty
                # [CB, T] vector computation (few conds, good pipeline
                # utilization), small enough that Morton blocks stay
                # spatially tight for the per-eval hull cull.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WendlandDisp:
    """Compact-support displacement spec for the deformed Pallas trace.

    The wendland interpolant (render.deformed, kind="wendland") has
    exactly-zero center contributions beyond `sigma`, so the kernel culls
    8-center Morton blocks per tile exactly like prim blocks — per-eval
    cost scales with the ~sigma^3 local center density instead of the
    total center count M (the biharmonic |x-c| kernel forces every eval
    to pay all M centers; measured 21.4 ms/frame per 64 centers per
    pull-back iteration at 1080p). Built per frame by
    render.deformed.wendland_pallas_spec."""
    centers: jax.Array   # [Mp, 3] Morton-blocked center rows (pad 1e6)
    w: jax.Array         # [Mp, 3] per-frame kernel weights (pad 0)
    waff: jax.Array      # [3, 4] affine tail (col 0 constant, 1:4 B^T)
    bu: jax.Array        # [NBc] per-block max_j |u(c_j)| — u and grad u
    bg: jax.Array        # [NBc] per-block max_j |grad u(c_j)|_F sampled
                         #   AT the centers (exact there; extended between
                         #   samples by the march-bound safety factors)
    bfr: jax.Array       # [] Frobenius norm of the affine linear part B
    max_disp: jax.Array = None  # [] traced per-frame |u| bound: inflates
                         #   brackets/support boxes only as much as THIS
                         #   frame's displacement requires (a static
                         #   worst case costs ~60% more live tiles)
    sigma: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    fp_iters: int = dataclasses.field(metadata=dict(static=True), default=1)
    k_refresh: int = dataclasses.field(metadata=dict(static=True), default=0)
    # k_refresh: evals per refresh cycle in the static march schedule
    # (0 = module default K_REFRESH); higher-curvature displacement
    # fields may prefer shorter cycles.

_SCENE_FIELDS = (
    "prim_type", "prim_mtx", "prim_pos", "prim_dir", "prim_res",
    "op_params", "bbox_lo", "bbox_hi", "prim_bb_lo", "prim_bb_hi",
)


def _scene_from_refs(scene: Scene, refs) -> Scene:
    vals = {name: ref[...] for name, ref in zip(_SCENE_FIELDS, refs)}
    return dataclasses.replace(scene, **vals)


def _march_tile(eval_f, params: TraceParams, adaptive: bool,
                inv_stretch: float, base_step, ro, rd,
                t_enter, t_exit, alive0, tile_cond: bool,
                shrink=None, slack=None, eval_c=None, carry0=None,
                step_ctrl=None, k_cycle=None):
    """Shared tile march: sphere-trace [1, TILE] ray rows to the iso
    crossing with tile-local early exit, then refine the bracket. eval_f
    maps a [1, TILE] t-row to field-minus-iso. Returns (t_root, found).

    Deformed-field marches pass (shrink, slack): the safe deformed-space
    step is max of TWO sound under-bounds of the rest-space support
    distance d = (r - r_iso) * inv_stretch mapped through phi:
      multiplicative  (1 - L) d            (Lipschitz contraction), and
      subtractive     d - 2 max|u|         (|phi(a)-phi(b)| >=
                                            |a-b| - |u(a)| - |u(b)|).
    The subtractive bound dominates in the far field where the loose
    global Lipschitz constant would throttle exactly the biggest steps.

    eval_c/carry0: stateful evaluation for the deformed pull-back —
    eval_c(t, carry, refresh, pmask) -> (f, carry'). `refresh` controls
    the pull-back: None = force a full refresh (entry eval, first
    bracket-refinement eval), a traced scalar bool = refresh iff set
    (the periodic march policy), Python False = never (ride the carried
    linear model). `pmask` optionally narrows the pull-back hull (the
    refinement passes the found lanes); the refresh SCHEDULE is the
    march body's static structure (one refresh + K_REFRESH-1 model
    evals per while iteration). step_ctrl(d, carry, alive, t) ->
    d_safe converts the rest-support distance d into the per-lane safe
    deformed step."""
    iso = params.iso
    r_iso = jnp.sqrt(1.0 - iso ** (1.0 / 3.0))
    if eval_c is None:
        def eval_c(t, carry, refresh=None, pmask=None):  # noqa: ARG001
            return eval_f(t), carry
        carry0 = ()

    def run_tile(_):
        f0, car = eval_c(t_enter, carry0, None)
        state = (
            t_enter,
            f0,
            t_enter,
            f0,
            jnp.where(f0 >= 0.0, alive0, 0.0),   # found (f32 mask)
            jnp.where(f0 < 0.0, alive0, 0.0),    # alive (f32 mask)
            jnp.zeros((), jnp.int32),
            car,
        )

        def cond(s):
            return (s[6] < params.max_steps) & (jnp.sum(s[5]) > 0.0)

        def step_once(s, ref=None):
            t, f, t_prev, f_prev, found, alive, it, car = s
            if adaptive:
                # Shared piecewise bound (sphere_trace.support_radius_bound)
                # so the XLA and Pallas marches take identical steps.
                r = support_radius_bound(f + iso)
                d = (r - r_iso) * inv_stretch
                if step_ctrl is not None:
                    d = step_ctrl(d, car, alive, t)
                elif shrink is not None:
                    d = jnp.maximum(shrink * d, d - slack)
                dt = jnp.maximum(base_step, 0.95 * d)
            else:
                dt = base_step
            t_new = jnp.minimum(t + dt, t_exit)
            f_new, car = eval_c(t_new, car, ref)
            is_alive = alive > 0.0
            crossed = is_alive & (f_new >= 0.0)
            done = is_alive & (t_new >= t_exit) & (f_new < 0.0)
            return (
                jnp.where(is_alive, t_new, t),
                jnp.where(is_alive, f_new, f),
                jnp.where(is_alive, t, t_prev),
                jnp.where(is_alive, f, f_prev),
                jnp.maximum(found, crossed.astype(jnp.float32)),
                alive * (1.0 - crossed) * (1.0 - done),
                it + 1,
                car,
            )

        if step_ctrl is not None:
            # Deformed march: a STATIC refresh schedule — one full
            # pull-back eval then K_REFRESH-1 linear-model evals per
            # while iteration. No per-eval lax.cond: Mosaic compiles
            # both cond branches and the branch machinery costs nearly
            # as much as always pulling (measured: K=32 saved only
            # 1.7 ms over K=8 under the conditioned policy). The
            # tile-wide alive reduction also amortizes over K evals.
            kc = k_cycle or K_REFRESH

            def body(s):
                s = step_once(s, None)          # refresh (full pull)
                for _ in range(kc - 1):
                    s = step_once(s, False)     # ride the model
                return s
        else:
            def body(s):
                # Two masked sub-steps per while iteration: halves the
                # tile-wide alive reduction + loop sync overhead.
                # Updates are lane-masked, so outputs are bit-identical
                # to single stepping (a tile finishing on the odd
                # sub-step just runs one fully-masked extra eval).
                return step_once(step_once(s))

        t, f, t_prev, f_prev, found, alive, n_it, car = jax.lax.while_loop(
            cond, body, state
        )
        if DEBUG_PULL_STATS and step_ctrl is not None:
            # Wendland carry layout: (..., cnt_refresh, cnt_blocks).
            return car[7], car[8]
        if DEBUG_MARCH_ITERS:
            # Root output carries the while-iteration count instead
            # (the hit path bool-thresholds, t passes through raw).
            return (
                jnp.zeros_like(t) + n_it.astype(jnp.float32),
                jnp.ones_like(found),
            )

        # Bracket field values ride along from the march state: the
        # closing secant costs no extra field evaluations (mirrors
        # sphere_trace.trace exactly to keep step/root parity).
        # Refinement: ONE full pull-back refresh on the first eval
        # (hull narrowed to the FOUND lanes — non-crossed lanes'
        # brackets are dead values), then the remaining halvings ride
        # the refreshed linear model: the bracket is at most one march
        # step wide, so the model error there is O(L * step^2) — far
        # below the bisection tolerance — and the refinement costs one
        # pull instead of bisect_steps pulls.
        bis_pm = None if step_ctrl is None else (found > 0.0)
        st = (t_prev, t, f_prev, f, car)
        for i in range(params.bisect_steps):
            a, b, fa, fb, car_b = st
            m = 0.5 * (a + b)
            fm, car_b = eval_c(m, car_b, None if i == 0 else False,
                               bis_pm)
            neg = fm < 0.0
            st = (
                jnp.where(neg, m, a),
                jnp.where(neg, b, m),
                jnp.where(neg, fm, fa),
                jnp.where(neg, fb, fm),
                car_b,
            )
        a, b, fa, fb, _ = st
        denom = fb - fa
        # Degenerate secant (fa == fb in f32 on a tight bracket) falls
        # back to the midpoint — see sphere_trace.trace.
        t_sec = a - fa * (b - a) / jnp.where(
            jnp.abs(denom) < 1e-12, 1e-12, denom
        )
        t_root = jnp.where(jnp.abs(denom) < 1e-9, 0.5 * (a + b), t_sec)
        return t_root, found

    if tile_cond:
        def skip_tile(_):
            z = jnp.zeros_like(t_enter)
            return z, z

        # Whole-tile early out: background tiles skip the march entirely.
        return jax.lax.cond(
            jnp.sum(alive0) > 0.0, run_tile, skip_tile, 0
        )
    return run_tile(0)


def _trace_kernel(scene: Scene, params: TraceParams, tile_cond: bool, *args):
    (*scene_refs, rox, roy, roz, rdx, rdy, rdz,
     ten, tex, alv, t_out, hit_out) = args
    sc = _scene_from_refs(scene, scene_refs)
    iso = params.iso

    # Ray blocks are (1, 1, TILE); index off the grid dim -> 2-D [1, TILE].
    ro = (rox[0], roy[0], roz[0])
    rd = (rdx[0], rdy[0], rdz[0])
    # March brackets precomputed by sphere_trace.prim_interval (fused XLA,
    # shared with the reference tracer so step sequences are identical).
    t_enter = ten[0]
    t_exit = tex[0]
    alive0 = alv[0]

    lo = sc.bbox_lo - 0.05  # [1, 3]
    hi = sc.bbox_hi + 0.05
    diag = jnp.sqrt(jnp.sum((hi - lo) ** 2))
    base_step = diag * params.step_frac
    adaptive = scene.monotone_field
    inv_stretch = 1.0 / max(scene.max_world_to_local_scale, 1e-6)

    def eval_f(t):
        return field_rows(
            sc, ro[0] + t * rd[0], ro[1] + t * rd[1], ro[2] + t * rd[2]
        ) - iso

    t_root, found = _march_tile(
        eval_f, params, adaptive, inv_stretch, base_step,
        ro, rd, t_enter, t_exit, alive0, tile_cond,
    )
    t_out[0] = jnp.where(found > 0.0, t_root, t_exit)
    hit_out[0] = found


def _pull_back_rows(cen, wr, waff, px, py, pz, iters: int):
    """In-kernel inverse deformation map: x <- y - u(x), u the biharmonic
    RBF displacement interpolant (render.deformed.sample_disp_rbf in row
    layout). cen [M,3] centers, wr [3,M] RBF weights, waff [3,4] affine
    part (column 0 constant, 1:4 linear). px/py/pz are [1,T] deformed
    points; returns the rest-space rows.

    The [M,T] distance matrix uses the recentered quadratic expansion
    |x-c|^2 = |x'|^2 - 2 c'.x' + |c'|^2 (primes = centroid-shifted), so
    the cross term is a [M,3]x[3,T] MXU matmul instead of 3 broadcast
    subtract+square passes — ~2.5x fewer VPU ops on the march's hottest
    inner product. Recentering keeps |x'|^2 small so the f32 cancellation
    error stays ~1e-4 * cellsize. No gathers anywhere, which is the whole
    point vs the trilinear grid embedding."""
    hi = jax.lax.Precision.HIGHEST
    cv = cen[...]
    mid = jnp.sum(cv, 0, keepdims=True) / cv.shape[0]  # [1, 3]
    c = cv - mid  # [M, 3] centroid-shifted
    cn2 = jnp.sum(c * c, 1, keepdims=True)  # [M, 1]
    w = wr[...]
    xx, yy, zz = px, py, pz
    for _ in range(iters):
        sx = xx - mid[0, 0]
        sy = yy - mid[0, 1]
        sz = zz - mid[0, 2]
        pts = jnp.concatenate([sx, sy, sz], 0)  # [3, T]
        g = jnp.dot(c, pts, preferred_element_type=jnp.float32,
                    precision=hi)  # [M, T] = c'.x'
        pn2 = sx * sx + sy * sy + sz * sz  # [1, T]
        d = jnp.sqrt(jnp.maximum(cn2 - 2.0 * g + pn2, 1e-24))
        u = jnp.dot(
            w, d,
            preferred_element_type=jnp.float32,
            precision=hi,
        )  # [3, T]
        ux = (waff[0:1, 0:1] + waff[0:1, 1:2] * xx
              + waff[0:1, 2:3] * yy + waff[0:1, 3:4] * zz + u[0:1])
        uy = (waff[1:2, 0:1] + waff[1:2, 1:2] * xx
              + waff[1:2, 2:3] * yy + waff[1:2, 3:4] * zz + u[1:2])
        uz = (waff[2:3, 0:1] + waff[2:3, 1:2] * xx
              + waff[2:3, 2:3] * yy + waff[2:3, 3:4] * zz + u[2:3])
        xx = px - ux
        yy = py - uy
        zz = pz - uz
    return xx, yy, zz


def _trace_kernel_additive(scene: Scene, params: TraceParams,
                           tile_cond: bool, n_blocks: int, fp_iters: int,
                           wparams, *args):
    """Additive-scene kernel: field = sum of prim fields, evaluated per
    PRIM_BLOCK with whole blocks skipped when the tile's ray hull misses
    the block's support AABB (live flags precomputed in XLA). The Morton
    prim ordering (see _additive_layout) makes live blocks few and dense.
    This is the TPU analog of the reference's kd-tree prim culling
    (src/implicit/KDTree.h:95) for the dominant blobby-sum scenes.

    With fp_iters > 0 the kernel traces the RBF-DEFORMED field (north-star
    coupling, render.deformed): march points are pulled back to rest space
    in-kernel before the prim evaluation, so the hull culling tests rest
    points against rest-space support boxes — exact under deformation.
    wparams = None selects the legacy biharmonic pull-back (all M centers
    per eval); wparams = (sigma, n_cblocks) selects the PRODUCTION
    wendland pull-back: compact-support center blocks culled per eval
    against the carried rest-point hull, warm-started across march steps
    (one fixed-point iteration per eval — see _march_tile eval_c)."""
    if fp_iters and wparams is not None:
        (cen, wr, waff, cboxes, clive, *args) = args
    elif fp_iters:
        (cen, wr, waff, *args) = args
    (live, boxes, stretch, mx, my, mz, ptype, pos, dirv, res, blo, bhi,
     rox, roy, roz, rdx, rdy, rdz, ten, tex, alv,
     t_out, hit_out) = args
    iso = params.iso

    ro = (rox[0], roy[0], roz[0])
    rd = (rdx[0], rdy[0], rdz[0])
    t_enter = ten[0]
    t_exit = tex[0]
    alive0 = alv[0]

    lo = blo[...] - 0.05  # [1, 3] scene bbox rows
    hi = bhi[...] + 0.05
    diag = jnp.sqrt(jnp.sum((hi - lo) ** 2))
    base_step = diag * params.step_frac
    adaptive = scene.monotone_field
    # Per-tile stretch: max world->local scale over the prims this tile's
    # rays can ever reach (statically-live blocks). Sound for the step
    # bound — prims outside the segment hull can never be crossed here —
    # and tighter than the global max on mixed-scale scenes (brain).
    # Packed row: (raw inv stretch, deformed shrink, deformed slack) —
    # (.., 1, 0) for rest traces, so the bound reduces to the rest bound.
    inv_stretch = stretch[0, 0, 0]
    shrink_s = stretch[0, 0, 1]
    slack_s = stretch[0, 0, 2]
    ldrift_s = stretch[0, 0, 3]  # tile Lipschitz bound for model drift
    present = scene.prim_types_present
    B = PRIM_BLOCK

    ones = jnp.ones_like(ro[0])
    hull_mask = alive0 > 0.0
    # Pack-normalized scenes carry static per-block type sets: each
    # block's unrolled body emits only the distance branches it needs
    # (brain: 20 point-only blocks + 1 point/cylinder block).
    block_types = scene.additive_block_types or None

    # Real (non-padding) blocks: with per-block type metadata the padding
    # tail is statically known; otherwise count conservatively.
    if block_types is not None:
        real_blocks = [b for b in range(n_blocks) if block_types[b]]
    else:
        real_blocks = list(range(n_blocks))

    def field_rest(px, py, pz):
        def block_field(o, types):
            # Local transform rows for this block: [B, T] coords via
            # VPU broadcasts (a [B,4]x[4,T] matmul is too small for
            # the MXU to pay off).
            vt = []
            for m in (mx, my, mz):
                r0 = m[pl.ds(o, B), 0:1]
                r1 = m[pl.ds(o, B), 1:2]
                r2 = m[pl.ds(o, B), 2:3]
                r3 = m[pl.ds(o, B), 3:4]
                vt.append(r0 * px + r1 * py + r2 * pz + r3 * ones)
            pos_c = tuple(pos[pl.ds(o, B), i : i + 1] for i in range(3))
            dir_c = tuple(dirv[pl.ds(o, B), i : i + 1] for i in range(3))
            res_c = tuple(res[pl.ds(o, B), i : i + 1] for i in range(4))
            type_col = ptype[pl.ds(o, B), 0:1]
            pf = rows_prim_fields(
                tuple(vt), pos_c, dir_c, res_c, type_col, types
            )
            return jnp.sum(pf, 0, keepdims=True)

        if len(real_blocks) <= 4:
            # Small scene: the per-block cond + 6 hull reductions cost
            # more than just summing every block (a block whose support
            # misses all points contributes exactly 0 — Wyvill compact
            # support), so evaluate unconditionally. ~1.5x on ventricle.
            f = jnp.zeros_like(px)
            for b in real_blocks:
                types = block_types[b] if block_types is not None else present
                f = f + block_field(b * B, types)
            return f - iso

        # Dynamic culling: the hull of the points actually being
        # evaluated shrinks as rays march/refine, so blocks the static
        # (whole-segment) test kept alive drop out step by step. Exact
        # for evaluation — a prim whose support misses every current
        # point contributes exactly 0.
        hx_lo = jnp.min(jnp.where(hull_mask, px, 1e30))
        hx_hi = jnp.max(jnp.where(hull_mask, px, -1e30))
        hy_lo = jnp.min(jnp.where(hull_mask, py, 1e30))
        hy_hi = jnp.max(jnp.where(hull_mask, py, -1e30))
        hz_lo = jnp.min(jnp.where(hull_mask, pz, 1e30))
        hz_hi = jnp.max(jnp.where(hull_mask, pz, -1e30))

        def dyn_live(b):
            return (
                (live[0, 0, b] > 0)
                & (hx_lo <= boxes[b, 3] + 1e-4)
                & (hx_hi >= boxes[b, 0] - 1e-4)
                & (hy_lo <= boxes[b, 4] + 1e-4)
                & (hy_hi >= boxes[b, 1] - 1e-4)
                & (hz_lo <= boxes[b, 5] + 1e-4)
                & (hz_hi >= boxes[b, 2] - 1e-4)
            )

        if block_types is not None:
            # Static unroll with per-block type specialization.
            f = jnp.zeros_like(px)
            for b in range(n_blocks):
                types = block_types[b]
                if not types:  # padding-only block
                    continue
                f = jax.lax.cond(
                    dyn_live(b),
                    lambda acc, o=b * B, ty=types: acc + block_field(o, ty),
                    lambda acc: acc,
                    f,
                )
            return f - iso

        def body(b, acc):
            o = pl.multiple_of(b * B, B)
            return jax.lax.cond(
                dyn_live(b),
                lambda: acc + block_field(o, present),
                lambda: acc,
            )

        f = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros_like(px))
        return f - iso

    eval_f = eval_c = carry0 = step_ctrl = None
    if fp_iters and wparams is not None:
        # PRODUCTION deformed path: wendland pull-back ridden on a
        # PER-LANE LINEAR MODEL of the rest point. Every K_REFRESH
        # evals (plus the entry and the first refinement eval) the tile
        # pulls back for real — warm-started fixed-point iterations
        # with per-eval center-block culling (u's compact support makes
        # the block skip EXACT: phi = 0 beyond sigma, and the tail-free
        # interpolant has NO global affine part) — and re-fits the
        # model slope from the refresh-to-refresh secant; in between,
        # evals ride x_est(t) = x_r + (t - t_r) * v. The march slack
        # subtracts the certified staleness 2L|t - t_r| BEFORE both
        # step bounds (see step_ctrl), which is the same Lipschitz
        # argument as the r4 scheme — but the linear model's ACTUAL
        # error is O(curvature * dt^2), so K_REFRESH can be ~8 where r4
        # needed every-eval refreshes near the surface.
        sigma, n_cb, k_refresh = wparams
        inv_sig = 1.0 / sigma
        CB = CEN_BLOCK

        def pull_one(xx, yy, zz, px, py, pz, pmask):
            # Affine tail (always on — it has global support).
            ux = (waff[0:1, 0:1] + waff[0:1, 1:2] * xx
                  + waff[0:1, 2:3] * yy + waff[0:1, 3:4] * zz)
            uy = (waff[1:2, 0:1] + waff[1:2, 1:2] * xx
                  + waff[1:2, 2:3] * yy + waff[1:2, 3:4] * zz)
            uz = (waff[2:3, 0:1] + waff[2:3, 1:2] * xx
                  + waff[2:3, 2:3] * yy + waff[2:3, 3:4] * zz)
            # Spatial hull of the lanes whose pull-back RESULT is used
            # (pmask): pulled lanes cluster near the surface, so the
            # hull+cond cull skips most blocks EXACTLY (compact support)
            # and its reduction cost amortizes over the skipped compute.
            # Lanes outside pmask get garbage u — discarded by eval_c.
            hx_lo = jnp.min(jnp.where(pmask, xx, 1e30))
            hx_hi = jnp.max(jnp.where(pmask, xx, -1e30))
            hy_lo = jnp.min(jnp.where(pmask, yy, 1e30))
            hy_hi = jnp.max(jnp.where(pmask, yy, -1e30))
            hz_lo = jnp.min(jnp.where(pmask, zz, 1e30))
            hz_hi = jnp.max(jnp.where(pmask, zz, -1e30))

            def cb_live(b):
                return (
                    (clive[0, 0, b] > 0)
                    & (hx_lo <= cboxes[b, 3] + 1e-4)
                    & (hx_hi >= cboxes[b, 0] - 1e-4)
                    & (hy_lo <= cboxes[b, 4] + 1e-4)
                    & (hy_hi >= cboxes[b, 1] - 1e-4)
                    & (hz_lo <= cboxes[b, 5] + 1e-4)
                    & (hz_hi >= cboxes[b, 2] - 1e-4)
                )

            def cb_add(o):
                def add(uu):
                    # NOTE r5: an MXU form of this block (recentered
                    # quadratic distance + [3,CB]x[CB,T] weight
                    # contraction, mirroring _pull_back_rows) measured
                    # 75 ms/frame vs 61 for this VPU form — K=3 / M=3
                    # matmuls waste the 128x128 systolic array and add
                    # layout moves. Keep the broadcast form.
                    ax, ay, az = uu
                    dx = xx - cen[pl.ds(o, CB), 0:1]       # [CB, T]
                    dy = yy - cen[pl.ds(o, CB), 1:2]
                    dz = zz - cen[pl.ds(o, CB), 2:3]
                    d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                    tt = jnp.minimum(d * inv_sig, 1.0)
                    omt = 1.0 - tt
                    o2 = omt * omt
                    ph = o2 * o2 * (4.0 * tt + 1.0)         # [CB, T]
                    # Column-broadcast weights + one sublane reduction
                    # per coord (scalar-broadcast FMAs per center are
                    # ~10x slower — measured 330 ms/frame vs this form).
                    ax = ax + jnp.sum(
                        wr[pl.ds(o, CB), 0:1] * ph, 0, keepdims=True
                    )
                    ay = ay + jnp.sum(
                        wr[pl.ds(o, CB), 1:2] * ph, 0, keepdims=True
                    )
                    az = az + jnp.sum(
                        wr[pl.ds(o, CB), 2:3] * ph, 0, keepdims=True
                    )
                    return ax, ay, az
                return add

            uu = (ux, uy, uz)
            if DEBUG_PULLBACK_ABLATE == 1:
                return px - ux, py - uy, pz - uz, jnp.zeros(())
            nlive = jnp.zeros(())
            for b in range(n_cb):
                lv = cb_live(b)
                nlive = nlive + lv.astype(jnp.float32)
                uu = jax.lax.cond(lv, cb_add(b * CB),
                                  lambda u_: u_, uu)
            ux, uy, uz = uu
            return px - ux, py - uy, pz - uz, nlive

        def eval_c(t, carry, refresh_s, pmask=None):
            """Linear-model field eval. carry = (xr, yr, zr, vx, vy,
            vz, tr): each lane's rest point at its last refresh tr and
            the refresh-to-refresh slope v; between refreshes the rest
            point is estimated as x_est(t) = xr + (t - tr) v (v = rd
            exactly when u is locally constant). The base (xr, tr) is
            NEVER advanced outside a refresh, so the r4 double-advance
            staleness bug (ADVICE r4 #1) cannot recur. refresh_s: None
            = force refresh, Python False = never, else traced scalar
            bool. pmask narrows the pull-back cull hull (refinement
            passes the found lanes)."""
            px = ro[0] + t * rd[0]
            py = ro[1] + t * rd[1]
            pz = ro[2] + t * rd[2]
            if DEBUG_PULLBACK_ABLATE == 2:
                return field_rest(px, py, pz), carry
            xr, yr, zr, vx, vy, vz, tr = carry[:7]
            adv = t - tr
            xa = xr + adv * vx
            ya = yr + adv * vy
            za = zr + adv * vz
            if pmask is None:
                pmask = alive0 > 0.0

            def refresh(_):
                x2, y2, z2 = xa, ya, za
                nlive = jnp.zeros(())
                for _ in range(fp_iters):
                    x2, y2, z2, nlive = pull_one(
                        x2, y2, z2, px, py, pz, pmask
                    )
                # Refit the slope from the refresh-to-refresh secant
                # (bounded by L, like du/dt itself — the drift slack in
                # step_ctrl covers both); keep the old slope when the
                # interval is too short for a stable quotient.
                big = adv > 1e-5
                inv = 1.0 / jnp.where(big, adv, 1.0)
                out = (x2, y2, z2,
                       jnp.where(big, (x2 - xr) * inv, vx),
                       jnp.where(big, (y2 - yr) * inv, vy),
                       jnp.where(big, (z2 - zr) * inv, vz),
                       t)
                if DEBUG_PULL_STATS:
                    out = out + (carry[7] + 1.0, carry[8] + nlive)
                return out

            def stale(_):
                return carry

            if refresh_s is None:
                car2 = refresh(0)
            elif refresh_s is False:
                car2 = carry
            else:
                car2 = jax.lax.cond(refresh_s, refresh, stale, 0)
            # Evaluate at the estimate advanced to t from the (possibly
            # refreshed) base: refreshed lanes get the exact pull-back
            # (adv = 0), stale lanes the linear model.
            a2 = t - car2[6]
            xe = car2[0] + a2 * car2[3]
            ye = car2[1] + a2 * car2[4]
            ze = car2[2] + a2 * car2[5]
            return field_rest(xe, ye, ze), car2

        def step_ctrl(d, carry, alive, t):
            """Safe deformed step + periodic refresh flag.

            d is the rest-support distance bound AT THE ESTIMATED rest
            point, whose distance from the true pull-back is bounded by
            the model staleness eps = 2 L |t - tr| (|u(t) - u(tr)| <=
            L dt and the secant slope is itself L-bounded), so the true
            pull-back's rest distance is >= d - eps and both deformed-
            space bounds apply to d - eps: multiplicative (1 - L)(d -
            eps) via the contraction, subtractive (d - eps) - 2 max|u|.
            Applying eps BEFORE both bounds closes the r4 soundness gap
            (ADVICE r4 #1: r4 added drift only to the subtractive
            branch). Tiles with no live center block have slack = L = 0
            (tail-free wendland) and march at exact rest speed."""
            eps = 2.0 * ldrift_s * jnp.abs(t - carry[6])
            de = d - eps
            d_safe = jnp.maximum(shrink_s * de, de - slack_s)
            # Refresh scheduling lives in the STATIC march body (one
            # refresh + K_REFRESH-1 model evals per while iteration);
            # two adaptive triggers were measured and REJECTED on real
            # TPU (r5): refresh-when-eps>0.35*d degenerates to
            # every-eval refreshes at the surface (50 vs 33 ms/frame),
            # and a drift-budget trigger (eps > C*slack) is a wash at
            # C>=1 and worse at C=0.5 on both bench scenes.
            return d_safe

        carry0 = (
            ro[0] + t_enter * rd[0],
            ro[1] + t_enter * rd[1],
            ro[2] + t_enter * rd[2],
            rd[0], rd[1], rd[2],
            t_enter,
        )
        if DEBUG_PULL_STATS:
            carry0 = carry0 + (
                jnp.zeros_like(t_enter), jnp.zeros_like(t_enter)
            )
    elif fp_iters:
        def eval_f(t):
            px = ro[0] + t * rd[0]
            py = ro[1] + t * rd[1]
            pz = ro[2] + t * rd[2]
            px, py, pz = _pull_back_rows(
                cen, wr, waff, px, py, pz, fp_iters
            )
            return field_rest(px, py, pz)
    else:
        def eval_f(t):
            return field_rest(
                ro[0] + t * rd[0], ro[1] + t * rd[1], ro[2] + t * rd[2]
            )

    t_root, found = _march_tile(
        eval_f, params, adaptive, inv_stretch, base_step,
        ro, rd, t_enter, t_exit, alive0, tile_cond,
        shrink=shrink_s, slack=slack_s, eval_c=eval_c, carry0=carry0,
        step_ctrl=step_ctrl,
        k_cycle=(k_refresh if wparams is not None and fp_iters else None),
    )
    if DEBUG_PULL_STATS and step_ctrl is not None:
        # Raw counters (t_root/found carry cnt_pull/cnt_blocks here).
        t_out[0] = t_root
        hit_out[0] = found
        return
    t_out[0] = jnp.where(found > 0.0, t_root, t_exit)
    hit_out[0] = found


def _additive_layout(scene: Scene):
    """Morton-ordered prim rows + per-block support AABBs (jit-safe).

    Sorting prims by the Morton code of their support-box centers makes
    spatially-close prims share PRIM_BLOCK rows, so a tile's live prims
    concentrate in few blocks; padding rows sort last (sentinel code) and
    carry empty boxes that can never test live."""
    P = scene.capacity_prims
    c = 0.5 * (scene.prim_bb_lo + scene.prim_bb_hi)
    span = jnp.maximum(scene.bbox_hi - scene.bbox_lo, 1e-6)
    qn = jnp.clip((c - scene.bbox_lo[None]) / span[None], 0.0, 1.0)
    q = (qn * 1023.0).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    code = jnp.where(
        jnp.arange(P) < scene.n_prims, code, jnp.uint32(0xFFFFFFFF)
    )
    if scene.additive_block_types:
        # Pack-normalized scenes are already Morton-ordered (scene.py
        # _normalize_additive) — keep row order aligned with the static
        # per-block type metadata.
        perm = jnp.arange(P)
    else:
        perm = jnp.argsort(code)

    pm = scene.prim_mtx[perm]
    bb_lo = scene.prim_bb_lo[perm]
    bb_hi = scene.prim_bb_hi[perm]
    nb = P // PRIM_BLOCK
    blk_lo = bb_lo.reshape(nb, PRIM_BLOCK, 3).min(1)
    blk_hi = bb_hi.reshape(nb, PRIM_BLOCK, 3).max(1)
    # Per-block world->local stretch upper bound: min(Frobenius norm of
    # the prim's linear part, global spectral max) — both upper-bound the
    # per-prim spectral norm, so the min is still a sound bound. Padding
    # rows (sorted last) get 0 so they never dominate a block's max.
    frob = jnp.sqrt(jnp.sum(pm[:, :, :3] ** 2, (1, 2)))
    per_prim = jnp.minimum(
        frob, jnp.float32(max(scene.max_world_to_local_scale, 1e-6))
    )
    real = jnp.arange(P) < scene.n_prims  # perm keeps real prims first
    per_prim = jnp.where(real, per_prim, 0.0)
    blk_stretch = per_prim.reshape(nb, PRIM_BLOCK).max(1)  # [nb]
    prim_args = [
        pm[:, 0, :], pm[:, 1, :], pm[:, 2, :],     # mx, my, mz [P,4]
        scene.prim_type[perm][:, None],            # [P,1]
        scene.prim_pos[perm],
        scene.prim_dir[perm],
        scene.prim_res[perm],
        scene.bbox_lo[None, :],
        scene.bbox_hi[None, :],
    ]
    return prim_args, blk_lo, blk_hi, blk_stretch, nb


def _tile_hulls(ro, rd, t_enter, t_exit, alive, tiles):
    """[tiles, 3] x2 segment hulls: every marched/refined t lies in
    [t_enter, t_exit], so points stay inside the endpoint hull."""
    a = ro + t_enter[:, None] * rd
    b = ro + t_exit[:, None] * rd
    lo_pts = jnp.where(alive[:, None], jnp.minimum(a, b), jnp.inf)
    hi_pts = jnp.where(alive[:, None], jnp.maximum(a, b), -jnp.inf)
    hull_lo = lo_pts.reshape(tiles, -1, 3).min(1)   # [tiles, 3]
    hull_hi = hi_pts.reshape(tiles, -1, 3).max(1)
    return hull_lo, hull_hi


def _hull_box_live(hull_lo, hull_hi, blk_lo, blk_hi):
    """[tiles, NB] int32 hull/AABB overlap flags."""
    live = jnp.all(
        (hull_lo[:, None] <= blk_hi[None] + 1e-4)
        & (hull_hi[:, None] >= blk_lo[None] - 1e-4),
        -1,
    )
    return live.astype(jnp.int32)


def _tile_block_live(ro, rd, t_enter, t_exit, alive, tiles, blk_lo, blk_hi):
    """[tiles, NB] int32: does tile's marched-segment hull overlap each
    prim block's support AABB? Conservative: every marched/refined t lies
    in [t_enter, t_exit], so points stay inside the endpoint hull."""
    hull_lo, hull_hi = _tile_hulls(ro, rd, t_enter, t_exit, alive, tiles)
    return _hull_box_live(hull_lo, hull_hi, blk_lo, blk_hi)


def trace_pallas(scene: Scene, ro: jax.Array, rd: jax.Array,
                 params: TraceParams = TraceParams(),
                 interpret: bool = False, tile_cond: bool = True,
                 tile: int = TILE, disp=None):
    """Forward sphere trace via the Pallas tile kernel (raw hit params).

    disp — optional RBF displacement spec for the deformed-field trace
    (north-star coupling): (centers [M,3], w [M+4,3] biharmonic weights,
    shrink traced-scalar = clamp(1 - Lipschitz(u)), slack traced-scalar =
    2*max|u| bound, max_disp static float, fp_iters static int). Requires
    the additive fast path (the caller —
    render.deformed.trace_deformed_rbf_fast — falls back otherwise)."""
    from .sphere_trace import prim_interval

    is_wendland = isinstance(disp, WendlandDisp)
    if is_wendland:
        assert scene.is_additive and scene.capacity_prims % PRIM_BLOCK == 0
        max_disp = disp.max_disp
        fp_iters = disp.fp_iters
        bracket_margin = 0.05 + max_disp
        shrink, slack = 1.0, 0.0  # per-tile values computed below
    elif disp is not None:
        assert scene.is_additive and scene.capacity_prims % PRIM_BLOCK == 0
        centers, w_rbf, shrink, slack, max_disp, fp_iters = disp
        bracket_margin = 0.05 + max_disp
    else:
        bracket_margin = 0.05
        max_disp = 0.0
        fp_iters = 0
        shrink, slack = 1.0, 0.0

    n = ro.shape[0]
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    if pad:
        # Padded rays start far away pointing +x and miss everything.
        ro = jnp.concatenate([ro, jnp.full((pad, 3), 1e7, ro.dtype)], 0)
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[1.0, 0, 0]], rd.dtype), (pad, 1))], 0
        )
    tiles = n_pad // tile

    # March brackets in fused XLA (one pass over all rays), shared with
    # the XLA tracer; the kernel just marches. Warp scenes can't use the
    # per-prim support boxes (unwarped boxes don't bound the warped
    # field) — slab bracket like sphere_trace.trace.
    if scene.can_cull:
        t_enter, t_exit, alive0 = prim_interval(
            scene, ro, rd, margin=bracket_margin
        )
    else:
        from .sphere_trace import _ray_box

        t_enter, t_exit = _ray_box(
            ro, rd,
            scene.bbox_lo[None] - bracket_margin,
            scene.bbox_hi[None] + bracket_margin,
        )
        alive0 = t_exit > t_enter
        t_enter = jnp.where(alive0, t_enter, 0.0)
        t_exit = jnp.where(alive0, t_exit, 0.0)

    def comp(a, i):  # [N,3] -> [tiles, 1, tile]
        return a[:, i].reshape(tiles, 1, tile)

    def comp1(a):  # [N] -> [tiles, 1, tile]
        return a.reshape(tiles, 1, tile)

    ray_args = [comp(ro, 0), comp(ro, 1), comp(ro, 2),
                comp(rd, 0), comp(rd, 1), comp(rd, 2),
                comp1(t_enter), comp1(t_exit),
                comp1(alive0.astype(jnp.float32))]
    ray_spec_ = pl.BlockSpec(
        (1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    if scene.is_additive and scene.capacity_prims % PRIM_BLOCK == 0:
        # Additive fast path: Morton-ordered prims + per-tile block culls.
        prim_args, blk_lo, blk_hi, blk_stretch, nb = _additive_layout(scene)
        if disp is not None:
            # Deformed trace: the kernel's fixed base_step must come from
            # the max_disp-inflated bbox (matching trace_deformed_rbf and
            # the external 0.5*base_step secant clamp — ADVICE r2 #3);
            # inflate the bbox rows the kernel derives its diag from.
            prim_args[-2] = prim_args[-2] - max_disp
            prim_args[-1] = prim_args[-1] + max_disp
        # Deformed trace: the static live test sees the DEFORMED-space
        # segment hull, so rest-space block boxes get the max-displacement
        # inflation; the in-kernel dynamic cull pulls points back first
        # and tests rest hulls against the exact rest boxes.
        hull_lo, hull_hi = _tile_hulls(
            ro, rd, t_enter, t_exit, alive0, tiles
        )
        live = _hull_box_live(
            hull_lo, hull_hi, blk_lo - max_disp, blk_hi + max_disp
        )
        # Per-tile stretch over statically-live blocks (0 where no block
        # is live — tile skipped anyway; floor keeps 1/x finite).
        tile_stretch = jnp.max(
            jnp.where(live > 0, blk_stretch[None, :], 0.0), -1
        )
        tile_inv = (
            1.0 / jnp.maximum(tile_stretch, 1e-6)
        ).astype(jnp.float32)
        if is_wendland:
            # Per-tile deformed march bounds from the compact support:
            # only center blocks whose sigma-support box touches the
            # tile's (max_disp-inflated) segment hull can contribute
            # anywhere this tile's pull-backs evaluate. Within that live
            # set, L and max|u| come from the CENTER-SAMPLED per-block
            # maxima (exact at the centers — the densest sampling the
            # model itself provides — extended between samples by the
            # disp_bounds_sampled safety factors); outside every support
            # box u is EXACTLY the affine tail, bounded by certified
            # interval arithmetic over the hull box. Tiles far from the
            # deformation therefore march at full rest speed.
            m_cen = disp.centers.shape[0]
            n_cb = m_cen // CEN_BLOCK
            cblk = disp.centers.reshape(n_cb, CEN_BLOCK, 3)
            cb_lo = cblk.min(1) - disp.sigma           # [n_cb, 3]
            cb_hi = cblk.max(1) + disp.sigma
            clive = _hull_box_live(
                hull_lo, hull_hi, cb_lo - max_disp, cb_hi + max_disp
            )                                          # [tiles, n_cb]
            any_alive = alive0.reshape(tiles, -1).any(-1)
            live_g = jnp.max(
                jnp.where(clive > 0, disp.bg[None, :], 0.0), -1
            )                                          # [tiles]
            live_u = jnp.max(
                jnp.where(clive > 0, disp.bu[None, :], 0.0), -1
            )
            # Certified affine interval bound over the inflated hull box
            # (the exact u wherever no center support reaches).
            h_c = 0.5 * (hull_lo + hull_hi)            # [tiles, 3]
            h_r = jnp.linalg.norm(
                0.5 * (hull_hi - hull_lo), axis=-1
            ) + max_disp                               # [tiles]
            aff_c = disp.waff[:, 0][None] + h_c @ disp.waff[:, 1:4].T
            aff_u = jnp.linalg.norm(aff_c, axis=-1) + disp.bfr * h_r
            l_tile = jnp.maximum(1.25 * live_g, disp.bfr)
            u_max = jnp.maximum(1.15 * live_u, aff_u)
            shrink_t = jnp.where(
                any_alive, jnp.clip(1.0 - l_tile, 0.0, 1.0), 1.0
            )
            slack_t = jnp.where(any_alive, 2.0 * u_max, 0.0)
            ldrift_t = jnp.where(any_alive, l_tile, 0.0)
        else:
            shrink_t = jnp.broadcast_to(
                jnp.asarray(shrink, jnp.float32), tile_inv.shape
            )
            slack_t = jnp.broadcast_to(
                jnp.asarray(slack, jnp.float32), tile_inv.shape
            )
            ldrift_t = jnp.zeros_like(tile_inv)
        # Pack (raw inv stretch, shrink, slack, drift L) per tile — the
        # deformed march subtracts the model staleness 2L|t - tr| from
        # d, then takes max(shrink*d', d' - slack) of the sound step
        # bounds (see _march_tile / step_ctrl;
        # render.deformed.trace_deformed_rbf).
        tile_inv_stretch = jnp.stack(
            [tile_inv, shrink_t, slack_t, ldrift_t], axis=-1
        )[:, None, :]                                  # [tiles, 1, 4]
        boxes = jnp.concatenate([blk_lo, blk_hi], -1)  # [nb, 6]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
        # [tiles, 1, nb] so the per-tile SMEM block (1, 1, nb) keeps its
        # trailing dims equal to the array's (Mosaic block-shape rule).
        live = live[:, None, :]
        live_spec = pl.BlockSpec(
            (1, 1, nb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )
        stretch_spec = pl.BlockSpec(
            (1, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )
        out_shape_ = [
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.float32),
        ]
        disp_args, disp_specs = [], []
        wparams = None
        if is_wendland:
            cboxes = jnp.concatenate([cb_lo, cb_hi], -1)   # [n_cb, 6]
            clive_k = clive[:, None, :]                    # [tiles,1,n_cb]
            clive_spec = pl.BlockSpec(
                (1, 1, n_cb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            )
            disp_args = [disp.centers, disp.w, disp.waff, cboxes,
                         clive_k]
            disp_specs = [vmem, vmem, vmem, smem_full, clive_spec]
            wparams = (float(disp.sigma), n_cb,
                       int(disp.k_refresh) or K_REFRESH)
        elif disp is not None:
            m = centers.shape[0]
            # Row layouts for the kernel: weights transposed [3, M]; the
            # affine tail packed [3, 4] (column 0 = constant, 1:4 = B^T).
            disp_args = [
                centers.astype(jnp.float32),
                w_rbf[:m].T.astype(jnp.float32),
                w_rbf[m:].T.astype(jnp.float32),
            ]
            disp_specs = [vmem] * 3
        t_tiles, hit_tiles = pl.pallas_call(
            partial(_trace_kernel_additive, scene, params, tile_cond, nb,
                    fp_iters, wparams),
            grid=(tiles,),
            in_specs=disp_specs + [live_spec, smem_full, stretch_spec]
            + [vmem] * len(prim_args) + [ray_spec_] * 9,
            out_specs=[ray_spec_, ray_spec_],
            out_shape=out_shape_,
            interpret=interpret,
        )(*disp_args, live, boxes, tile_inv_stretch, *prim_args, *ray_args)
        t = t_tiles.reshape(-1)[:n]
        hit = hit_tiles.reshape(-1)[:n]
        if not (DEBUG_PULL_STATS and is_wendland):
            hit = hit > 0.5
        return t, hit

    scene_args = [getattr(scene, f) for f in _SCENE_FIELDS]
    # 1-D arrays can't be indexed/unsqueezed inside Mosaic — ship them 2-D.
    fi = {f: i for i, f in enumerate(_SCENE_FIELDS)}
    scene_args[fi["prim_type"]] = scene_args[fi["prim_type"]][:, None]  # [P,1]
    scene_args[fi["bbox_lo"]] = scene_args[fi["bbox_lo"]][None, :]      # [1,3]
    scene_args[fi["bbox_hi"]] = scene_args[fi["bbox_hi"]][None, :]      # [1,3]

    scene_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _SCENE_FIELDS
    ]
    ray_spec = pl.BlockSpec(
        (1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    out_shape = [
        jax.ShapeDtypeStruct((tiles, 1, tile), jnp.float32),
        jax.ShapeDtypeStruct((tiles, 1, tile), jnp.float32),
    ]
    t_tiles, hit_tiles = pl.pallas_call(
        partial(_trace_kernel, scene, params, tile_cond),
        grid=(tiles,),
        in_specs=scene_specs + [ray_spec] * 9,
        out_specs=[ray_spec, ray_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(*scene_args, *ray_args)

    t = t_tiles.reshape(-1)[:n]
    hit = hit_tiles.reshape(-1)[:n] > 0.5
    return t, hit


def block_permutation(height: int, width: int, bh: int = 32, bw: int = 64):
    """Row-major -> block-major pixel permutation (bh*bw == TILE).

    Row-major ray order makes each 2048-ray tile span a whole image row —
    mixing background and surface rays, so the tile's early exit waits on
    its slowest ray. Re-ordering rays into bh x bw pixel blocks makes tiles
    spatially coherent: background blocks cull instantly and surface
    blocks converge together. Returns [Hpad*Wpad] indices into the
    row-major ray array, -1 for padding outside the image.
    """
    import numpy as np

    hb, wb = -(-height // bh), -(-width // bw)
    yy, xx = np.meshgrid(
        np.arange(hb * bh), np.arange(wb * bw), indexing="ij"
    )
    flat = np.where((yy < height) & (xx < width), yy * width + xx, -1)
    return (
        flat.reshape(hb, bh, wb, bw).transpose(0, 2, 1, 3).reshape(-1)
    )


def _block_layout(height: int, width: int, tile: int):
    """Row-major <-> block-major converters for the coherent-tile image
    path: (to_blocks, from_blocks, n_block_rays). Pure pad + reshape +
    transpose — NOT a gather: a 2M-element gather costs ~40 ms/frame on
    TPU (≫ the 7 ms march) because XLA lowers it to serialized dynamic
    slices, while a [hb,bh,wb,bw] transpose is a fast vectorized copy.
    Same ray order as block_permutation (kept for tests/tools)."""
    import math

    bh = 1 << (int(math.log2(tile)) // 2)  # near-square: bh*bw == tile
    bw = tile // bh
    hb, wb = -(-height // bh), -(-width // bw)
    ph, pw = hb * bh - height, wb * bw - width

    def to_blocks(a, fill):
        # [H*W, 3] row-major -> [hb*wb*bh*bw, 3] block-major.
        img = a.reshape(height, width, 3)
        img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)),
                      constant_values=fill)
        img = img.reshape(hb, bh, wb, bw, 3).transpose(0, 2, 1, 3, 4)
        return img.reshape(-1, 3)

    def from_blocks(a):
        img = a.reshape(hb, wb, bh, bw).transpose(0, 2, 1, 3)
        img = img.reshape(hb * bh, wb * bw)[:height, :width]
        return img.reshape(-1)

    return to_blocks, from_blocks, (ph, pw), hb * wb * bh * bw


def _image_rays_to_blocks(ro, rd, height, width, tile):
    """Permute row-major image rays into coherent pixel blocks; padded
    rays start far away pointing +x and miss everything (same convention
    as trace_pallas's tail padding)."""
    to_blocks, from_blocks, (ph, pw), _ = _block_layout(height, width, tile)
    ro_b = to_blocks(ro, 1e7)
    rd_b = to_blocks(rd, 0.0)
    if pw or ph:
        # Padded direction rows must be non-degenerate: rebuild as +x.
        mask = to_blocks(jnp.ones_like(ro), 0.0)[:, :1] > 0.5
        rd_b = jnp.where(mask, rd_b, jnp.asarray([1.0, 0.0, 0.0]))
    return ro_b, rd_b, from_blocks


def trace_pallas_image(scene: Scene, ro: jax.Array, rd: jax.Array,
                       height: int, width: int,
                       params: TraceParams = TraceParams(),
                       interpret: bool = False, tile_cond: bool = True,
                       tile: int = TILE, disp=None):
    """trace_pallas over a row-major H x W ray grid with block-coherent
    tiling: permutes rays into near-square pixel blocks (one block per
    kernel tile — see _block_layout), traces, and maps results back to
    row-major order."""
    ro_b, rd_b, from_blocks = _image_rays_to_blocks(
        ro, rd, height, width, tile
    )
    t_b, hit_b = trace_pallas(scene, ro_b, rd_b, params, interpret=interpret,
                              tile_cond=tile_cond, tile=tile, disp=disp)
    return from_blocks(t_b), from_blocks(hit_b)


def trace_pallas_sharded(scene: Scene, ro: jax.Array, rd: jax.Array,
                         device_mesh, axis=None,
                         params: TraceParams = TraceParams(),
                         interpret: bool = False, tile_cond: bool = True,
                         tile: int = TILE, disp=None):
    """trace_pallas with the tile grid sharded over a device mesh.

    Kernel tiles are fully independent (SURVEY §2.6 P7: rays are the
    data-parallel axis), so the SPMD form is exact: rays split evenly
    across `axis` (default: all mesh axes combined — e.g. the 2-D
    ('host','chip') mesh shards rays over both), the scene and the RBF
    displacement spec replicated (≤ ~100 KB — never shard the scene), and
    each device runs the unchanged single-chip Pallas kernel on its local
    tiles. No collective is needed for the forward trace; downstream
    reductions (loss mean/psum) are inserted by XLA where consumed.

    Returns row-sharded (t, hit) of the input length; rays are padded
    internally so every shard gets the same tile count."""
    try:  # jax >= 0.9
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if axis is None:
        axis = device_mesh.axis_names
        nd = device_mesh.size
    else:
        nd = device_mesh.shape[axis] if isinstance(axis, str) else 1
        if not isinstance(axis, str):
            for a in axis:
                nd *= device_mesh.shape[a]

    n = ro.shape[0]
    chunk = nd * tile
    n_pad = -(-n // chunk) * chunk
    pad = n_pad - n
    if pad:
        ro = jnp.concatenate([ro, jnp.full((pad, 3), 1e7, ro.dtype)], 0)
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[1.0, 0, 0]], rd.dtype), (pad, 1))], 0
        )

    # Traced leaves of the displacement spec travel as explicit replicated
    # args (closing over tracers inside shard_map is fragile); the static
    # tail (max_disp, fp_iters) stays in the closure. A WendlandDisp is a
    # registered pytree (static fields in its treedef), so it passes
    # through shard_map whole under a P() prefix spec.
    if disp is None:
        disp_arrs, disp_tail = (), ()
    elif isinstance(disp, WendlandDisp):
        disp_arrs, disp_tail = (disp,), None
    else:
        disp_arrs, disp_tail = tuple(disp[:4]), tuple(disp[4:])

    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(P(), P(axis), P(axis)) + (P(),) * len(disp_arrs),
        out_specs=(P(axis), P(axis)),
        # pallas_call's out_shape carries no varying-mesh-axes metadata;
        # the kernel is per-shard pure so the static check is moot.
        check_vma=False,
    )
    def shard_trace(scene_, ro_, rd_, *disp_arrs_):
        if disp is None:
            d = None
        elif disp_tail is None:          # WendlandDisp passed whole
            d = disp_arrs_[0]
        else:
            d = disp_arrs_ + disp_tail
        t, hit = trace_pallas(
            scene_, ro_, rd_, params, interpret=interpret,
            tile_cond=tile_cond, tile=tile, disp=d,
        )
        return t, hit.astype(jnp.int32)

    t, hit = shard_trace(scene, ro, rd, *disp_arrs)
    return t[:n], hit[:n] > 0


def trace_pallas_image_sharded(scene: Scene, ro: jax.Array, rd: jax.Array,
                               height: int, width: int, device_mesh,
                               axis=None,
                               params: TraceParams = TraceParams(),
                               interpret: bool = False,
                               tile_cond: bool = True,
                               tile: int = TILE, disp=None):
    """Sharded block-coherent image trace: the row-major -> pixel-block
    permutation runs once globally (pad + transpose), then the coherent
    tile stream shards over the mesh via trace_pallas_sharded."""
    ro_b, rd_b, from_blocks = _image_rays_to_blocks(
        ro, rd, height, width, tile
    )
    t_b, hit_b = trace_pallas_sharded(
        scene, ro_b, rd_b, device_mesh, axis=axis, params=params,
        interpret=interpret, tile_cond=tile_cond, tile=tile, disp=disp,
    )
    return from_blocks(t_b), from_blocks(hit_b)


def trace_fast(scene: Scene, ro: jax.Array, rd: jax.Array,
               params: TraceParams = TraceParams(),
               interpret: bool = False):
    """Pallas forward march + implicit-differentiation correction: same
    output and gradients as render.sphere_trace.trace, at tile speed.
    Falls back to the XLA tracer for scenes outside the kernel fast path."""
    from ..ops.field import gradient

    if not supports_rows_fast_path(scene):
        return trace_xla(scene, ro, rd, params)

    # pallas_call has no autodiff rule; the kernel output is only used
    # under stop_gradient (the implicit-diff correction below carries the
    # true derivative), so give the call an explicit zero-cotangent VJP.
    @jax.custom_vjp
    def raw(scene_, ro_, rd_):
        return trace_pallas(scene_, ro_, rd_, params, interpret=interpret)

    def raw_fwd(scene_, ro_, rd_):
        return raw(scene_, ro_, rd_), None

    def raw_bwd(_, g):
        zero_scene = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating
            ) else jnp.zeros(jnp.shape(x), jax.dtypes.float0),
            scene,
        )
        return zero_scene, jnp.zeros_like(ro), jnp.zeros_like(rd)

    raw.defvjp(raw_fwd, raw_bwd)
    t_root, found = raw(scene, ro, rd)
    t0 = jax.lax.stop_gradient(t_root)
    x0 = ro + t0[:, None] * rd
    g = gradient(scene, x0)
    dfdt = jnp.sum(g * rd, -1)
    dfdt = jax.lax.stop_gradient(
        jnp.where(jnp.abs(dfdt) < 1e-6, jnp.where(dfdt < 0, -1e-6, 1e-6), dfdt)
    )
    f_at = field(scene, x0) - params.iso
    # Clamp the first-order nudge to step scale (see sphere_trace.trace):
    # tangent rays would otherwise catapult t through the 1e-6 dfdt floor.
    diag = jnp.sqrt(jnp.sum((scene.bbox_hi - scene.bbox_lo + 0.1) ** 2))
    cap = 0.5 * diag * params.step_frac
    t_hit = jnp.where(found, t0 - jnp.clip(f_at / dfdt, -cap, cap), t0)
    return t_hit, found
