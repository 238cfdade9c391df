"""Differentiable sphere-traced rendering of the BlobTree field.

This is the north-star renderer: the reference only stubs ray tracing
(data/opencl/Raytracer.cl:5-60 hardcodes one sphere), so the field
semantics come from the polygonizer's evaluator (ops.field) and the
renderer is a new TPU-first design:

  * rays are marched in lock-step as one big [N_rays] batch inside a
    `lax.while_loop` with an all-rays-found early exit — no per-ray
    divergence, pure VPU work between field evaluations;
  * step size adapts with a conservative Wyvill support bound: a field
    value f implies the nearest skeleton is at least
    ``sqrt(1 - f^(1/3))`` away in local units, so empty space is skipped
    at near sphere-tracing rates while blends stay robust;
  * the iso crossing is refined by bisection (the reference refines roots
    with 8 Newton-Raphson/shrink-wrap iterations or linear interpolation,
    data/opencl/Polygonizer.cl:1179-1212);
  * gradients flow through the hit point by implicit differentiation of
    ``field(ro + t rd) = iso`` — a first-order correction around a
    stop-gradient'd hit parameter — so pixel losses differentiate to
    primitive/material/camera parameters without unrolling the march.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..blob.scene import Scene
from ..blob.types import ISO_VALUE
from ..ops.field import field, field_and_color, gradient
from .camera import Camera, generate_rays


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TraceParams:
    iso: float = dataclasses.field(metadata=dict(static=True), default=ISO_VALUE)
    max_steps: int = dataclasses.field(metadata=dict(static=True), default=160)
    # 6 halvings of a near-surface step bracket + the closing secant put
    # the raw root well inside 1e-4; the implicit-diff Newton correction
    # (trace/trace_fast) then squares that error again.
    bisect_steps: int = dataclasses.field(metadata=dict(static=True), default=6)
    # Base step as a fraction of the scene bbox diagonal.
    step_frac: float = dataclasses.field(metadata=dict(static=True), default=1 / 160)


def _ray_box(ro, rd, lo, hi):
    """Ray/AABB slab intersection -> (t_enter, t_exit), t_enter >= 0."""
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, jnp.where(rd < 0, -1e-12, 1e-12), rd)
    t0 = (lo - ro) * inv
    t1 = (hi - ro) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), -1)
    tmax = jnp.min(jnp.maximum(t0, t1), -1)
    return jnp.maximum(tmin, 0.0), tmax


def support_radius_bound(fv):
    """Piecewise-constant lower bound on r(f) = sqrt(1 - f^(1/3)), the
    conservative local distance to the nearest Wyvill skeleton given a
    total field value f. Selects are far cheaper than exp/log per ray per
    step, a stale (smaller) bound is still safe, and sharing one table
    between the XLA tracer and the Pallas kernel keeps their march step
    sequences — and therefore grazing-ray hits — identical."""
    r = jnp.full_like(fv, 0.4542)  # r at f = iso = 0.5
    r = jnp.where(fv <= 0.30, 0.5749, r)
    r = jnp.where(fv <= 0.20, 0.6444, r)
    r = jnp.where(fv <= 0.15, 0.6846, r)
    r = jnp.where(fv <= 0.10, 0.7320, r)
    r = jnp.where(fv <= 0.05, 0.7947, r)
    r = jnp.where(fv <= 0.02, 0.8536, r)
    r = jnp.where(fv <= 0.005, 0.9105, r)
    r = jnp.where(fv <= 0.001, 0.9487, r)
    r = jnp.where(fv <= 0.0001, 0.9765, r)
    return r


def prim_interval(scene: Scene, ro, rd, margin: float = 0.05):
    """Tight per-ray march bracket from per-primitive support boxes.

    Intersects every ray with every prim's conservative support AABB
    (scene.prim_bb_lo/hi) and returns the hull [t_enter, t_exit] of the
    valid intervals plus an any-overlap mask. The field is exactly zero
    outside the union of the boxes (each op folds below the sum of prim
    fields), so rays with no overlap can never hit the iso surface — this
    is the culling analog of the reference's kd-tree over prim bboxes
    (src/implicit/KDTree.h:95), done TPU-style as a dense [N, P] test.
    """
    # Only real prim rows: padded rows carry inverted sentinel boxes, and
    # the min/max slab test is symmetric in lo/hi — an inverted box would
    # read as an infinite one.
    bb_lo = scene.prim_bb_lo[: scene.n_prims]
    bb_hi = scene.prim_bb_hi[: scene.n_prims]
    inv = 1.0 / jnp.where(
        jnp.abs(rd) < 1e-12, jnp.where(rd < 0, -1e-12, 1e-12), rd
    )  # [N, 3]
    enter = jnp.full(ro.shape[:1] + bb_lo.shape[:1], -jnp.inf)
    exit_ = jnp.full_like(enter, jnp.inf)
    for i in range(3):
        ta = (bb_lo[None, :, i] - margin - ro[:, i : i + 1]) * inv[:, i : i + 1]
        tb = (bb_hi[None, :, i] + margin - ro[:, i : i + 1]) * inv[:, i : i + 1]
        enter = jnp.maximum(enter, jnp.minimum(ta, tb))
        exit_ = jnp.minimum(exit_, jnp.maximum(ta, tb))
    enter = jnp.maximum(enter, 0.0)
    valid = (exit_ >= enter) & (exit_ > 0.0)  # [N, P]
    t_enter = jnp.min(jnp.where(valid, enter, jnp.inf), -1)
    t_exit = jnp.max(jnp.where(valid, exit_, -jnp.inf), -1)
    alive = jnp.any(valid, -1)
    # Intersect with the reference-heuristic scene slab: the support hull
    # over-covers (full Wyvill radius) while the heuristic bbox is what
    # the reference clips to — taking both keeps acceptance and bracket
    # length no worse than either bound alone.
    s_enter, s_exit = _ray_box(
        ro, rd, scene.bbox_lo[None] - margin, scene.bbox_hi[None] + margin
    )
    t_enter = jnp.maximum(t_enter, s_enter)
    t_exit = jnp.minimum(t_exit, s_exit)
    alive = alive & (s_exit > s_enter) & (t_exit >= t_enter)
    # Keep miss-ray brackets finite: NaN/inf at dead rays would poison
    # downstream where-masked gradients.
    t_enter = jnp.where(alive, t_enter, 0.0)
    t_exit = jnp.where(alive, t_exit, 0.0)
    return t_enter, t_exit, alive


def trace(scene: Scene, ro: jax.Array, rd: jax.Array,
          params: TraceParams = TraceParams()):
    """March rays to the iso surface.

    ro, rd: [N, 3]. Returns (t_hit [N], hit_mask [N]) with t differentiable
    w.r.t. scene parameters via implicit differentiation.
    """
    iso = params.iso
    # Margin so the iso surface (field=0.5 shell) is inside the slab.
    lo = scene.bbox_lo - 0.05
    hi = scene.bbox_hi + 0.05
    if scene.can_cull:
        # Tight bracket + dead-ray culling from per-prim support boxes.
        t_enter, t_exit, alive0 = prim_interval(scene, ro, rd)
    else:
        t_enter, t_exit = _ray_box(ro, rd, lo[None], hi[None])
        alive0 = t_exit > t_enter

    diag = jnp.linalg.norm(hi - lo)
    base_step = diag * params.step_frac
    # r(f): conservative distance (local units) to the nearest skeleton —
    # only valid when the total field bounds every primitive's field
    # (unions/blends, no warps); converted to world units by the scene's
    # max world->local stretch. Otherwise march fixed steps.
    r_iso = jnp.sqrt(1.0 - iso ** (1.0 / 3.0))
    adaptive = scene.monotone_field
    inv_stretch = 1.0 / max(scene.max_world_to_local_scale, 1e-6)

    def step_size(f):
        if not adaptive:
            return base_step
        r = support_radius_bound(f)
        return jnp.maximum(base_step, 0.95 * (r - r_iso) * inv_stretch)

    def eval_f(t):
        return field(scene, ro + t[:, None] * rd) - iso

    f0 = eval_f(t_enter)
    state = dict(
        t=t_enter,
        f=f0,
        t_prev=t_enter,
        f_prev=f0,
        found=(f0 >= 0.0) & alive0,  # started inside
        alive=alive0 & (f0 < 0.0),
        it=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (s["it"] < params.max_steps) & jnp.any(s["alive"])

    def body(s):
        dt = step_size(s["f"] + iso)
        t_new = jnp.minimum(s["t"] + dt, t_exit)
        f_new = eval_f(t_new)
        crossed = s["alive"] & (f_new >= 0.0)
        done = s["alive"] & (t_new >= t_exit) & (f_new < 0.0)
        return dict(
            t=jnp.where(s["alive"], t_new, s["t"]),
            f=jnp.where(s["alive"], f_new, s["f"]),
            t_prev=jnp.where(s["alive"], s["t"], s["t_prev"]),
            f_prev=jnp.where(s["alive"], s["f"], s["f_prev"]),
            found=s["found"] | crossed,
            alive=s["alive"] & ~crossed & ~done,
            it=s["it"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)
    found = s["found"]

    # Bisection refinement on the bracketing interval [t_prev, t]
    # (replaces the reference's NR/linear root refinement). Bracket field
    # values ride along from the march state, so the closing secant costs
    # no extra field evaluations.
    def bis_body(_, st):
        a, b, fa, fb = st
        m = 0.5 * (a + b)
        fm = eval_f(m)
        neg = fm < 0.0
        a = jnp.where(neg, m, a)
        fa = jnp.where(neg, fm, fa)
        b = jnp.where(neg, b, m)
        fb = jnp.where(neg, fb, fm)
        return (a, b, fa, fb)

    a, b, fa, fb = jax.lax.fori_loop(
        0, params.bisect_steps, bis_body,
        (s["t_prev"], s["t"], s["f_prev"], s["f"]),
    )
    denom = fb - fa
    # Secant step on the bisected bracket; when the bracket is so tight
    # that fa == fb in f32 the secant is degenerate (0/eps would catapult
    # t far off the surface) — use the midpoint, which is already within
    # bracket-width of the root.
    t_sec = a - fa * (b - a) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t_root = jnp.where(jnp.abs(denom) < 1e-9, 0.5 * (a + b), t_sec)
    t_root = jnp.where(found, t_root, t_exit)

    # Implicit differentiation: t*(θ) solves F(ro + t rd; θ) = iso, so
    # dt*/dθ = -F_θ / (∇F · rd). One corrected Newton step around the
    # stop-gradient'd root carries exactly that derivative.
    t0 = jax.lax.stop_gradient(t_root)
    x0 = ro + t0[:, None] * rd
    g = gradient(scene, x0)
    dfdt = jnp.sum(g * rd, -1)
    dfdt = jax.lax.stop_gradient(
        jnp.where(jnp.abs(dfdt) < 1e-6, jnp.where(dfdt < 0, -1e-6, 1e-6), dfdt)
    )
    f_at = field(scene, x0) - iso
    # The correction is a first-order nudge around an already-converged
    # root; clamp it to step scale so tangent rays (∇f·rd ≈ 0 after the
    # 1e-6 floor) can't catapult t. Clamped (pathological) rays get zero
    # scene-gradient, which is the honest answer at a silhouette.
    t_hit = t0 - jnp.clip(f_at / dfdt, -0.5 * base_step, 0.5 * base_step)
    t_hit = jnp.where(found, t_hit, t_exit)
    return t_hit, found


def shade(scene: Scene, ro, rd, t_hit, hit_mask,
          light_dir=(0.577, 0.577, 0.577), background=(1.0, 1.0, 1.0),
          material=None, texture=None, texture_scale: float = 1.0):
    """Lambert + Blinn-Phong shading with field-weighted material colors
    (reference phong shaders, data/shaders/phong.{vsh,fsh}). `material`
    selects named shading parameters from graphics.materials (the
    ShaderManager analog); default is the phong preset. `texture` (a
    [H, W, 3] jnp image) modulates the albedo by world-space triplanar
    sampling — TexManager parity inside the jitted graph."""
    if material is None:
        from ..graphics.materials import PHONG as material
    x = ro + t_hit[:, None] * rd
    g = gradient(scene, x)
    n = -g * jax.lax.rsqrt(jnp.maximum(jnp.sum(g * g, -1, keepdims=True), 1e-24))
    _, col = field_and_color(scene, x)
    if texture is not None:
        from ..graphics.materials import triplanar_sample_jax

        col = col.at[:, :3].mul(
            triplanar_sample_jax(texture, x, n, texture_scale)
        )
    ldir = jnp.asarray(light_dir)
    ldir = ldir / jnp.linalg.norm(ldir)
    ndotl = jnp.maximum(jnp.sum(n * ldir, -1), 0.0)
    h = ldir - rd
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    spec = jnp.maximum(jnp.sum(n * h, -1), 0.0) ** material.shininess
    rgb = (
        col[:, :3]
        * (material.ambient + material.diffuse * ndotl)[:, None]
        + material.specular * spec[:, None]
    )
    bg = jnp.asarray(background)
    return jnp.where(hit_mask[:, None], rgb, bg[None])


def render_rays(scene: Scene, ro, rd, params: TraceParams = TraceParams()):
    t_hit, hit = trace(scene, ro, rd, params)
    return shade(scene, ro, rd, t_hit, hit)


@partial(jax.jit, static_argnames=("width", "height", "params"))
def render_image(scene: Scene, cam: Camera, width: int, height: int,
                 params: TraceParams = TraceParams()) -> jax.Array:
    """Render a [H, W, 3] image (values in [0, ~1.3], clip for display)."""
    ro, rd = generate_rays(cam, width, height)
    rgb = render_rays(scene, ro.reshape(-1, 3), rd.reshape(-1, 3), params)
    return rgb.reshape(height, width, 3)


def depth_image(scene: Scene, cam: Camera, width: int, height: int,
                params: TraceParams = TraceParams()):
    """(t_hit, hit_mask) images — the differentiable geometric output."""
    ro, rd = generate_rays(cam, width, height)
    t, hit = trace(scene, ro.reshape(-1, 3), rd.reshape(-1, 3), params)
    return t.reshape(height, width), hit.reshape(height, width)
