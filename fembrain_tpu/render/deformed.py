"""Coupled differentiable render+deform: sphere-trace the FEM-deformed
implicit field (BASELINE config #5 — the north-star path).

The reference couples FEM to rendering by adding nodal displacements to
cached rest-surface vertices on the GPU (`ApplyVertexDeformations`,
/root/reference/src/implicit/OclPolygonizer.cpp:1543-1596 +
data/opencl/Polygonizer.cl:1417-1426) — a mesh-space coupling that the
scene graph path here reproduces. For the differentiable tracer we couple
in FIELD space instead: the deformation map phi(x) = x + u(x) (u = FEM
nodal displacement, trilinearly interpolated on the polygonizer voxel
grid — the same embedding the tet extraction uses) turns the rest field f
into the deformed field

    F(y) = f(phi^{-1}(y)),

whose iso surface is exactly the deformed tissue surface. phi^{-1} is a
fixed-point iteration x <- y - u(x) (a contraction for |grad u| < 1, true
at soft-tissue strains), unrolled a few steps so everything is plainly
differentiable: image losses flow through the march's implicit hit
differentiation into BOTH the BlobTree primitive parameters (via f) and
the FEM state -> material parameters (via u and the implicit-diff
timestep). One jitted graph: force -> FEM solve -> displacement field ->
deformed image -> loss.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..blob.scene import Scene
from ..mesh.polygonize import GridSpec
from ..ops.field import field, field_and_color
from .sphere_trace import TraceParams, _ray_box

FIXED_POINT_ITERS = 4


def displacement_grid(grid: GridSpec, grid_to_node: jax.Array,
                      u: jax.Array) -> jax.Array:
    """Scatter FEM nodal displacements onto the voxel grid: [X, Y, Z, 3].

    Grid vertices that are not tet nodes (outside the inside/crossed cell
    set) get zero displacement; every cell the iso surface passes through
    has all 8 corners as tet nodes (mesh.polygonize.extract_tet_mesh marks
    inside+crossed cells), so interpolation near the surface uses real
    nodal values only."""
    safe = jnp.maximum(grid_to_node, 0)
    ug = jnp.where((grid_to_node >= 0)[:, None], u[safe], 0.0)
    X, Y, Z = grid.dims
    return ug.reshape(X, Y, Z, 3)


def sample_displacement(grid: GridSpec, u_grid: jax.Array,
                        pts: jax.Array) -> jax.Array:
    """Trilinear displacement sample at world points [N, 3] -> [N, 3].
    Clamps to the grid (zero-displacement padding outside the mesh)."""
    X, Y, Z = grid.dims
    origin = jnp.asarray(grid.lo, pts.dtype)
    rel = (pts - origin) / grid.cellsize
    dims = jnp.asarray([X, Y, Z], pts.dtype)
    rel = jnp.clip(rel, 0.0, dims - 1.0 - 1e-6)
    i0 = jnp.floor(rel).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.asarray([X - 2, Y - 2, Z - 2], jnp.int32))
    fr = rel - i0

    def corner(dx, dy, dz):
        return u_grid[i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz]

    wx = fr[:, 0:1]
    wy = fr[:, 1:2]
    wz = fr[:, 2:3]
    c00 = corner(0, 0, 0) * (1 - wz) + corner(0, 0, 1) * wz
    c01 = corner(0, 1, 0) * (1 - wz) + corner(0, 1, 1) * wz
    c10 = corner(1, 0, 0) * (1 - wz) + corner(1, 0, 1) * wz
    c11 = corner(1, 1, 0) * (1 - wz) + corner(1, 1, 1) * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx


def pull_back(grid: GridSpec, u_grid: jax.Array, y: jax.Array,
              iters: int = FIXED_POINT_ITERS) -> jax.Array:
    """Invert phi(x) = x + u(x): fixed-point x <- y - u(x), unrolled so
    the inverse map is differentiable through plain autodiff."""
    x = y
    for _ in range(iters):
        x = y - sample_displacement(grid, u_grid, x)
    return x


def deformed_field(scene: Scene, grid: GridSpec, u_grid: jax.Array,
                   y: jax.Array) -> jax.Array:
    """F(y) = f(phi^{-1}(y)) — the implicit field of the deformed tissue."""
    return field(scene, pull_back(grid, u_grid, y))


def trace_deformed(scene: Scene, grid: GridSpec, u_grid: jax.Array,
                   ro: jax.Array, rd: jax.Array,
                   params: TraceParams = TraceParams(),
                   max_disp: float = 0.5):
    """Sphere-trace the deformed field. Fixed-step march (the Wyvill
    support bound does not survive an arbitrary warp), slab bracket
    expanded by `max_disp` so the deformed surface stays inside. Returns
    (t_hit, hit_mask), differentiable via implicit hit differentiation."""
    iso = params.iso
    lo = scene.bbox_lo - 0.05 - max_disp
    hi = scene.bbox_hi + 0.05 + max_disp
    t_enter, t_exit = _ray_box(ro, rd, lo[None], hi[None])
    alive0 = t_exit > t_enter
    t_enter = jnp.where(alive0, t_enter, 0.0)
    t_exit = jnp.where(alive0, t_exit, 0.0)

    diag = jnp.linalg.norm(hi - lo)
    base_step = diag * params.step_frac

    def eval_f(t):
        return deformed_field(scene, grid, u_grid, ro + t[:, None] * rd) - iso

    f0 = eval_f(t_enter)
    state = dict(
        t=t_enter, f=f0, t_prev=t_enter, f_prev=f0,
        found=(f0 >= 0.0) & alive0,
        alive=alive0 & (f0 < 0.0),
        it=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (s["it"] < params.max_steps) & jnp.any(s["alive"])

    def body(s):
        t_new = jnp.minimum(s["t"] + base_step, t_exit)
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

    def bis_body(_, st):
        a, b, fa, fb = st
        m = 0.5 * (a + b)
        fm = eval_f(m)
        neg = fm < 0.0
        return (
            jnp.where(neg, m, a), jnp.where(neg, b, m),
            jnp.where(neg, fm, fa), jnp.where(neg, fb, fm),
        )

    a, b, fa, fb = jax.lax.fori_loop(
        0, params.bisect_steps, bis_body,
        (s["t_prev"], s["t"], s["f_prev"], s["f"]),
    )
    denom = fb - fa
    t_sec = a - fa * (b - a) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t_root = jnp.where(jnp.abs(denom) < 1e-9, 0.5 * (a + b), t_sec)
    t_root = jnp.where(found, t_root, t_exit)

    # Implicit differentiation of F(ro + t rd) = iso at the root.
    t0 = jax.lax.stop_gradient(t_root)
    x0 = ro + t0[:, None] * rd

    def f_point(p):
        return deformed_field(scene, grid, u_grid, p[None])[0]

    g = jax.vmap(jax.grad(f_point))(x0)
    dfdt = jnp.sum(g * rd, -1)
    dfdt = jax.lax.stop_gradient(
        jnp.where(jnp.abs(dfdt) < 1e-6, jnp.where(dfdt < 0, -1e-6, 1e-6), dfdt)
    )
    f_at = deformed_field(scene, grid, u_grid, x0) - iso
    t_hit = t0 - jnp.clip(f_at / dfdt, -0.5 * base_step, 0.5 * base_step)
    t_hit = jnp.where(found, t_hit, t_exit)
    return t_hit, found


def shade_deformed(scene: Scene, grid: GridSpec, u_grid: jax.Array,
                   ro, rd, t_hit, hit_mask,
                   light_dir=(0.577, 0.577, 0.577),
                   background=(1.0, 1.0, 1.0)):
    """Blinn-Phong shading of the deformed surface: normals from the
    deformed field's autodiff gradient (exact normals of the warped
    surface), material color sampled at the pulled-back rest point."""
    x = ro + t_hit[:, None] * rd

    def f_point(p):
        return deformed_field(scene, grid, u_grid, p[None])[0]

    g = jax.vmap(jax.grad(f_point))(x)
    n = -g * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(g * g, -1, keepdims=True), 1e-24)
    )
    x_rest = pull_back(grid, u_grid, x)
    _, col = field_and_color(scene, x_rest)
    ldir = jnp.asarray(light_dir)
    ldir = ldir / jnp.linalg.norm(ldir)
    ndotl = jnp.maximum(jnp.sum(n * ldir, -1), 0.0)
    h = ldir - rd
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    spec = jnp.maximum(jnp.sum(n * h, -1), 0.0) ** 32.0
    rgb = col[:, :3] * (0.25 + 0.75 * ndotl)[:, None] + 0.3 * spec[:, None]
    bg = jnp.asarray(background)
    return jnp.where(hit_mask[:, None], rgb, bg[None])


@partial(jax.jit, static_argnames=("grid", "width", "height", "params"))
def render_deformed(scene: Scene, grid: GridSpec, grid_to_node: jax.Array,
                    u: jax.Array, cam, width: int, height: int,
                    params: TraceParams = TraceParams()) -> jax.Array:
    """[H, W, 3] image of the tissue displaced by FEM state u [N, 3]."""
    from .camera import generate_rays

    ro, rd = generate_rays(cam, width, height)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    u_grid = displacement_grid(grid, grid_to_node, u)
    t, hit = trace_deformed(scene, grid, u_grid, ro, rd, params)
    rgb = shade_deformed(scene, grid, u_grid, ro, rd, t, hit)
    return rgb.reshape(height, width, 3)


def coupled_step(scene: Scene, fem_mesh, grid: GridSpec,
                 grid_to_node: jax.Array, state, f_ext: jax.Array,
                 ro: jax.Array, rd: jax.Array,
                 h: float = 0.0333,
                 E_scale: jax.Array | float = 1.0,
                 params: TraceParams = TraceParams()):
    """The north-star step: ONE differentiable graph
    force -> implicit FEM solve -> displacement field -> deformed trace.

    Returns (t_hit, hit_mask, new_state). E_scale scales the Young's
    modulus (element stiffness is linear in E for fixed nu), so
    d(image loss)/d(E_scale) is the material gradient; gradients also
    reach the BlobTree primitive parameters through the rest field.
    Matches the per-frame coupling of the reference
    (OclPolygonizer.cpp:1543-1596) but differentiably, in field space."""
    from ..fem import integrator as integ

    mesh2 = dataclasses.replace(fem_mesh, ke=fem_mesh.ke * E_scale)
    new_state, _ = integ.timestep(
        mesh2, state, f_ext, h=h, differentiable=True
    )
    u_grid = displacement_grid(grid, grid_to_node, new_state.q)
    t, hit = trace_deformed(scene, grid, u_grid, ro, rd, params)
    return t, hit, new_state
