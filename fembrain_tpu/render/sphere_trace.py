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
    bisect_steps: int = dataclasses.field(metadata=dict(static=True), default=12)
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
        r = jnp.sqrt(jnp.maximum(1.0 - jnp.cbrt(jnp.maximum(f, 0.0)), 0.0))
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
    # (replaces the reference's NR/linear root refinement).
    def bis_body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        fm = eval_f(m)
        a = jnp.where(fm < 0.0, m, a)
        b = jnp.where(fm < 0.0, b, m)
        return (a, b)

    a, b = jax.lax.fori_loop(
        0, params.bisect_steps, bis_body, (s["t_prev"], s["t"])
    )
    fa = eval_f(a)
    fb = eval_f(b)
    denom = fb - fa
    t_root = a - fa * (b - a) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
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
    t_hit = t0 - f_at / dfdt
    t_hit = jnp.where(found, t_hit, t_exit)
    return t_hit, found


def shade(scene: Scene, ro, rd, t_hit, hit_mask,
          light_dir=(0.577, 0.577, 0.577), background=(1.0, 1.0, 1.0)):
    """Lambert + Blinn-Phong shading with field-weighted material colors
    (reference phong shaders, data/shaders/phong.{vsh,fsh})."""
    x = ro + t_hit[:, None] * rd
    g = gradient(scene, x)
    n = -g * jax.lax.rsqrt(jnp.maximum(jnp.sum(g * g, -1, keepdims=True), 1e-24))
    _, col = field_and_color(scene, x)
    ldir = jnp.asarray(light_dir)
    ldir = ldir / jnp.linalg.norm(ldir)
    ndotl = jnp.maximum(jnp.sum(n * ldir, -1), 0.0)
    h = ldir - rd
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    spec = jnp.maximum(jnp.sum(n * h, -1), 0.0) ** 32.0
    rgb = col[:, :3] * (0.25 + 0.75 * ndotl)[:, None] + 0.3 * spec[:, None]
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
