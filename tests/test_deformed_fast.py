"""Fast coupled path: RBF-interpolated displacement field.

The trilinear grid embedding needs ~32 gathers per field evaluation —
XLA serializes gathers on TPU, so the exact path is seconds per frame.
The fast path interpolates the FEM displacement with a biharmonic RBF
over a static farthest-point node subset (the reference's FastRBF role,
src/implicit/RBF.h:51-136): per-frame weights are one matmul (linear in
the FEM state q), evaluation is dense MXU math. These tests pin the
interpolant to the exact embedding and the traced hits/gradients to the
exact path.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.fem.integrator import FemState
from fembrain_tpu.fem.tetmesh import build_fem_mesh
from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render.deformed import (
    build_disp_interp,
    coupled_step,
    coupled_step_fast,
    disp_lipschitz,
    disp_weights,
    displacement_grid,
    sample_disp_rbf,
    sample_displacement,
    trace_deformed,
    trace_deformed_rbf,
)
from fembrain_tpu.render.sphere_trace import trace

SPHERE = "/root/reference/data/models/blobtree/sphere.blob"


@pytest.fixture(scope="module")
def setup():
    scene = load_blob(SPHERE).pack()
    grid = grid_for_scene(scene, cellsize=0.35)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    n_nodes, n_tets = int(tm.n_nodes), int(tm.n_tets)
    nodes = np.asarray(tm.nodes)[:n_nodes]
    tets = np.asarray(tm.tets)[:n_tets]
    fixed = np.nonzero(nodes[:, 1] < nodes[:, 1].min() + 1e-6)[0]
    fem = build_fem_mesh(nodes, tets, fixed=fixed)
    interp = build_disp_interp(nodes, n_centers=96)
    cam = Camera.orbit(20.0, 15.0, 2.5)
    ro, rd = generate_rays(cam, 24, 18)
    return (scene, grid, tm.grid_to_node, fem, interp,
            ro.reshape(-1, 3), rd.reshape(-1, 3))


def _smooth_sag(fem, nodes):
    """A smooth, fixed-respecting displacement (quadratic sag in y)."""
    y = nodes[:, 1]
    s = (y - y.min()) / max(y.max() - y.min(), 1e-6)
    u = np.zeros_like(nodes)
    u[:, 1] = -0.15 * s**2
    u[np.asarray(fem.fixed)] = 0.0
    return jnp.asarray(u, jnp.float32)


def test_interpolant_matches_node_displacements(setup):
    scene, grid, g2n, fem, interp, ro, rd = setup
    nodes = np.asarray(fem.rest)
    u = _smooth_sag(fem, nodes)
    w = disp_weights(interp, u)
    # Exact at the interpolation centers...
    at_c = sample_disp_rbf(interp, w, interp.centers)
    ref_c = u[interp.center_nodes]
    assert float(jnp.abs(at_c - ref_c).max()) < 1e-3
    # ...and close to the trilinear embedding at every node (smooth field).
    u_grid = displacement_grid(grid, g2n, u)
    pts = jnp.asarray(nodes, jnp.float32)
    tri = sample_displacement(grid, u_grid, pts)
    rbf = sample_disp_rbf(interp, w, pts)
    err = float(jnp.abs(tri - rbf).max())
    assert err < 0.02, err


def test_fast_trace_matches_exact_path(setup):
    scene, grid, g2n, fem, interp, ro, rd = setup
    nodes = np.asarray(fem.rest)
    u = _smooth_sag(fem, nodes)
    u_grid = displacement_grid(grid, g2n, u)
    w = disp_weights(interp, u)
    t1, h1 = trace_deformed(scene, grid, u_grid, ro, rd)
    t2, h2 = trace_deformed_rbf(scene, interp, w, ro, rd)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert (h1 == h2).mean() > 0.97, (h1 != h2).sum()
    m = h1 & h2
    diff = np.abs(np.asarray(t1)[m] - np.asarray(t2)[m])
    assert np.median(diff) < 2e-2, np.median(diff)


def test_zero_state_matches_rest_trace(setup):
    scene, grid, g2n, fem, interp, ro, rd = setup
    w = disp_weights(interp, jnp.zeros((fem.n_nodes, 3)))
    assert float(disp_lipschitz(interp, w)) < 1e-5
    t0, h0 = trace(scene, ro, rd)
    t1, h1 = trace_deformed_rbf(scene, interp, w, ro, rd)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    assert (h0 == h1).mean() > 0.99
    m = h0 & h1
    assert np.abs(np.asarray(t0)[m] - np.asarray(t1)[m]).max() < 5e-3


def test_fast_coupled_step_sags_and_matches_exact(setup):
    scene, grid, g2n, fem, interp, ro, rd = setup
    f = jnp.zeros((fem.n_nodes, 3)).at[:, 1].set(-8000.0 * fem.mass)
    st = FemState.rest(fem)
    t_f, hit_f, st_f = jax.jit(
        lambda s: coupled_step_fast(scene, fem, interp, s, f, ro, rd)
    )(st)
    t_e, hit_e, st_e = jax.jit(
        lambda s: coupled_step(scene, fem, grid, g2n, s, f, ro, rd)
    )(st)
    # Same FEM solve on both paths.
    np.testing.assert_allclose(
        np.asarray(st_f.q), np.asarray(st_e.q), atol=1e-6
    )
    hit_f, hit_e = np.asarray(hit_f), np.asarray(hit_e)
    assert (hit_f == hit_e).mean() > 0.97
    m = hit_f & hit_e
    diff = np.abs(np.asarray(t_f)[m] - np.asarray(t_e)[m])
    assert np.median(diff) < 2e-2, np.median(diff)


def test_fast_gradients_match_finite_differences(setup):
    scene, grid, g2n, fem, interp, ro, rd = setup
    f = jnp.zeros((fem.n_nodes, 3)).at[:, 1].set(-8000.0 * fem.mass)
    st = FemState.rest(fem)
    _, hit_b, _ = jax.jit(
        lambda: coupled_step_fast(scene, fem, interp, st, f, ro, rd)
    )()
    hit0 = jax.lax.stop_gradient(hit_b)

    def loss(E_scale):
        t, hit, _ = coupled_step_fast(
            scene, fem, interp, st, f, ro, rd, E_scale=E_scale,
            differentiable=True,
        )
        return jnp.sum(jnp.where(hit0, t, 0.0))

    lj = jax.jit(loss)
    gE = float(jax.jit(jax.grad(loss))(1.0))
    assert np.isfinite(gE) and abs(gE) > 0.0
    # eps small enough that no silhouette ray's hit flips between the
    # two FD evaluations (a flip jumps t by the whole bracket length).
    eps = 0.003
    fd = (float(lj(1.0 + eps)) - float(lj(1.0 - eps))) / (2 * eps)
    assert abs(gE - fd) / max(abs(fd), 1e-6) < 0.05, (gE, fd)


def test_pallas_deformed_kernel_matches_xla(setup):
    """ADVICE r2 (medium): the in-kernel RBF pull-back march
    (trace_deformed_rbf_fast -> pallas_trace._pull_back_rows) must pin to
    the XLA deformed tracer in interpret mode, so CPU CI executes the
    production kernel path."""
    from fembrain_tpu.render.deformed import trace_deformed_rbf_fast

    scene, grid, g2n, fem, interp, ro, rd = setup
    nodes = np.asarray(fem.rest)
    u = _smooth_sag(fem, nodes)
    w = disp_weights(interp, u)
    t1, h1 = trace_deformed_rbf(scene, interp, w, ro, rd)
    t2, h2 = trace_deformed_rbf_fast(
        scene, interp, w, ro, rd, interpret=True
    )
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert (h1 == h2).mean() > 0.995, (h1 != h2).sum()
    m = h1 & h2
    diff = np.abs(np.asarray(t1)[m] - np.asarray(t2)[m])
    assert diff.max() < 1e-3, diff.max()


def test_pallas_deformed_image_variant_matches(setup):
    from fembrain_tpu.render.deformed import trace_deformed_rbf_fast

    scene, grid, g2n, fem, interp, ro, rd = setup
    nodes = np.asarray(fem.rest)
    u = _smooth_sag(fem, nodes)
    w = disp_weights(interp, u)
    t1, h1 = trace_deformed_rbf_fast(
        scene, interp, w, ro, rd, interpret=True
    )
    t2, h2 = trace_deformed_rbf_fast(
        scene, interp, w, ro, rd, interpret=True, image_hw=(18, 24)
    )
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    m = np.asarray(h1) & np.asarray(h2)
    # Same march, different tile membership (block-coherent permutation
    # changes which rays share a tile, not the per-ray step sequence).
    np.testing.assert_allclose(
        np.asarray(t1)[m], np.asarray(t2)[m], atol=1e-5
    )


def test_pallas_deformed_gradients_match_xla(setup):
    """Gradients of the kernel path (implicit-diff correction outside the
    kernel) equal the XLA deformed tracer's gradients."""
    from fembrain_tpu.render.deformed import trace_deformed_rbf_fast

    scene, grid, g2n, fem, interp, ro, rd = setup
    nodes = np.asarray(fem.rest)
    u = _smooth_sag(fem, nodes)
    w0 = disp_weights(interp, u)
    _, h0 = trace_deformed_rbf(scene, interp, w0, ro, rd)
    h0 = jax.lax.stop_gradient(h0)

    def loss_fast(w):
        t, _ = trace_deformed_rbf_fast(
            scene, interp, w, ro, rd, interpret=True
        )
        return jnp.sum(jnp.where(h0, t, 0.0))

    def loss_xla(w):
        t, _ = trace_deformed_rbf(scene, interp, w, ro, rd)
        return jnp.sum(jnp.where(h0, t, 0.0))

    g1 = jax.grad(loss_fast)(w0)
    g2 = jax.grad(loss_xla)(w0)
    scale = float(jnp.abs(g2).max())
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), atol=2e-3 * max(scale, 1.0)
    )


def test_forward_solver_matches_differentiable(setup):
    """coupled_step_fast's forward default (warm-started PCG) produces the
    same trajectory as the differentiable custom_linear_solve mode."""
    scene, grid, g2n, fem, interp, ro, rd = setup
    f = jnp.zeros((fem.n_nodes, 3)).at[:, 1].set(-8000.0 * fem.mass)

    def roll(differentiable, steps=3):
        st = FemState.rest(fem)
        outs = []
        for _ in range(steps):
            t, hit, st = jax.jit(
                lambda s: coupled_step_fast(
                    scene, fem, interp, s, f, ro, rd,
                    differentiable=differentiable,
                )
            )(st)
            outs.append(np.asarray(st.q))
        return outs

    fwd = roll(False)
    diff = roll(True)
    for a, b in zip(fwd, diff):
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_max_disp_bound_covers_actual_displacements(setup):
    """The per-frame telemetry bound (ADVICE r2 #4) upper-bounds the RBF
    displacement magnitude everywhere on the mesh node cloud."""
    from fembrain_tpu.render.deformed import max_disp_bound

    scene, grid, g2n, fem, interp, ro, rd = setup
    nodes = np.asarray(fem.rest)
    u = _smooth_sag(fem, nodes)
    w = disp_weights(interp, u)
    bound = float(max_disp_bound(interp, w, u))
    u_at_nodes = sample_disp_rbf(interp, w, jnp.asarray(nodes))
    actual = float(jnp.linalg.norm(u_at_nodes, axis=-1).max())
    assert actual <= bound + 1e-5, (actual, bound)
    # and the bound is meaningful (not orders of magnitude loose)
    assert bound < 10 * max(actual, 1e-3), (actual, bound)
