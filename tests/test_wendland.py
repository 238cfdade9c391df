"""Wendland compact-support displacement interpolant (round 4): the
production coupled-trace kernel path.

Pins (a) interpolation fidelity vs the exact trilinear grid embedding,
(b) the Pallas warm-started/periodic-refresh march against the dense XLA
wendland tracer (hit agreement + root error), (c) gradient flow through
disp_weights with the wendland factorization, and (d) the spec's
per-frame bound arrays against dense sampling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.mesh.polygonize import extract_tet_mesh, grid_for_scene
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render.deformed import (
    build_disp_interp,
    disp_weights,
    displacement_grid,
    sample_disp_rbf,
    sample_displacement,
    trace_deformed,
    trace_deformed_rbf,
    trace_deformed_rbf_fast,
    wendland_pallas_spec,
)

SPHERE = "/root/reference/data/models/blobtree/sphere.blob"


@pytest.fixture(scope="module")
def setup():
    scene = load_blob(SPHERE).pack()
    grid = grid_for_scene(scene, cellsize=0.35)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    interp = build_disp_interp(nodes, n_centers=96, kernel="wendland",
                               sigma_fill=2.5)
    y = nodes[:, 1]
    s = (y - y.min()) / max(y.max() - y.min(), 1e-6)
    u = np.zeros_like(nodes)
    u[:, 1] = -0.15 * s**2
    cam = Camera.orbit(20.0, 15.0, 2.5)
    ro, rd = generate_rays(cam, 24, 18)
    return (scene, grid, tm.grid_to_node, nodes, interp,
            jnp.asarray(u, jnp.float32),
            ro.reshape(-1, 3), rd.reshape(-1, 3))


def test_wendland_interpolates_and_matches_trilinear(setup):
    scene, grid, g2n, nodes, interp, u, ro, rd = setup
    w = disp_weights(interp, u)
    at_c = sample_disp_rbf(interp, w, interp.centers)
    assert float(jnp.abs(at_c - u[interp.center_nodes]).max()) < 1e-3
    u_grid = displacement_grid(grid, g2n, u)
    pts = jnp.asarray(nodes, jnp.float32)
    tri = sample_displacement(grid, u_grid, pts)
    rbf = sample_disp_rbf(interp, w, pts)
    assert float(jnp.abs(tri - rbf).max()) < 0.02


def test_wendland_compact_support_is_exact_zero(setup):
    scene, grid, g2n, nodes, interp, u, ro, rd = setup
    w = disp_weights(interp, u)
    # Beyond sigma of every center, u is EXACTLY the affine tail.
    far = jnp.asarray([[50.0, 50.0, 50.0]], jnp.float32)
    m = interp.centers.shape[0]
    affine = w[m] + far @ w[m + 1:]
    got = sample_disp_rbf(interp, w, far)
    np.testing.assert_allclose(np.asarray(got), np.asarray(affine),
                               rtol=0, atol=1e-5)


def test_wendland_pallas_matches_dense_xla(setup):
    scene, grid, g2n, nodes, interp, u, ro, rd = setup
    w = disp_weights(interp, u)
    t1, h1 = trace_deformed_rbf(scene, interp, w, ro, rd)
    t2, h2 = jax.jit(
        lambda w_, o, d: trace_deformed_rbf_fast(
            scene, interp, w_, o, d, interpret=True, need_grads=False
        )
    )(w, ro, rd)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert (h1 == h2).mean() > 0.995, (h1 != h2).sum()
    m = h1 & h2
    diff = np.abs(np.asarray(t1)[m] - np.asarray(t2)[m])
    assert np.median(diff) < 5e-3, np.median(diff)
    assert diff.max() < 5e-2, diff.max()


def test_wendland_matches_exact_trilinear_tracer(setup):
    scene, grid, g2n, nodes, interp, u, ro, rd = setup
    w = disp_weights(interp, u)
    u_grid = displacement_grid(grid, g2n, u)
    t0, h0 = trace_deformed(scene, grid, u_grid, ro, rd)
    t2, h2 = trace_deformed_rbf_fast(
        scene, interp, w, ro, rd, interpret=True, need_grads=False
    )
    h0, h2 = np.asarray(h0), np.asarray(h2)
    assert (h0 == h2).mean() > 0.97
    m = h0 & h2
    assert np.median(np.abs(np.asarray(t0)[m] - np.asarray(t2)[m])) < 2e-2


def test_wendland_spec_bounds_cover_dense_samples(setup):
    scene, grid, g2n, nodes, interp, u, ro, rd = setup
    w = disp_weights(interp, u)
    spec = wendland_pallas_spec(interp, w)
    # max_disp bound covers the actual |u| at every node.
    rbf = sample_disp_rbf(interp, w, jnp.asarray(nodes, jnp.float32))
    actual = float(jnp.sqrt(jnp.sum(rbf**2, -1)).max())
    assert float(spec.max_disp) >= actual - 1e-5
    # per-block |u(c_j)| maxima match a direct evaluation at the centers.
    u_c = sample_disp_rbf(interp, w, interp.centers)
    un = jnp.sqrt(jnp.sum(u_c**2, -1))
    assert float(jnp.max(spec.bu) - jnp.max(un)) > -1e-5


def test_wendland_gradients_flow(setup):
    scene, grid, g2n, nodes, interp, u, ro, rd = setup
    # Fixed hit set: the raw where(hit, ...) loss is discontinuous when
    # silhouette rays flip across the FD stencil (a flip adds an
    # O(t_exit) jump FD sees but autodiff legitimately cannot).
    w0 = disp_weights(interp, u)
    _, hit0 = trace_deformed_rbf(scene, interp, w0, ro, rd)
    mask = jax.lax.stop_gradient(hit0)

    def loss(scale):
        w = disp_weights(interp, u * scale)
        t, hit = trace_deformed_rbf(scene, interp, w, ro, rd)
        return jnp.sum(jnp.where(mask, t, 0.0))

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    eps = 1e-2
    fd = (float(loss(jnp.float32(1 + eps)))
          - float(loss(jnp.float32(1 - eps)))) / (2 * eps)
    assert abs(g - fd) / max(1e-6, abs(fd)) < 0.2, (g, fd)


def test_error_driven_refinement_beats_uniform_fps(setup):
    """VERDICT r4 #8 (reference RBF.h:81-84 refines by fitting error):
    with a localized deformation (contact dimple), error-driven extra
    centers cut the worst-case fit error by far more than 2x at EQUAL
    center count vs uniform farthest-point sampling."""
    from fembrain_tpu.render.deformed import refine_disp_interp

    # Finer mesh than the module fixture (refinement needs node count
    # well above the center count).
    scene = load_blob(SPHERE).pack()
    grid = grid_for_scene(scene, cellsize=0.18)
    tm = extract_tet_mesh(
        scene, grid, ncap=grid.n_vertices, tetcap=grid.n_cells * 6
    )
    nodes = np.asarray(tm.nodes)[: int(tm.n_nodes)]
    y = nodes[:, 1]
    s = (y - y.min()) / max(y.max() - y.min(), 1e-6)
    u2 = np.zeros_like(nodes)
    u2[:, 1] = -0.15 * s**2
    p0 = nodes[np.argmax(nodes[:, 0])]
    r = np.linalg.norm(nodes - p0, axis=-1)
    u2[:, 0] -= 0.12 * np.exp(-((r / 0.3) ** 2))
    u2 = jnp.asarray(u2, jnp.float32)

    def err(it):
        w = disp_weights(it, u2)
        return float(jnp.abs(
            sample_disp_rbf(it, w, jnp.asarray(nodes, jnp.float32)) - u2
        ).max())

    base = build_disp_interp(nodes, n_centers=64, kernel="wendland",
                             sigma_fill=2.5)
    uniform96 = build_disp_interp(nodes, n_centers=96, kernel="wendland",
                                  sigma_fill=2.5)
    refined = refine_disp_interp(base, nodes, np.asarray(u2), n_extra=32)
    assert refined.centers.shape[0] == 96
    # At this small test mesh the uniform sampling is already fairly
    # dense, so pin a >=30% equal-M gain here; at app scale the gain is
    # ~26x (0.0035 vs 0.092 max err on the ventricle mesh — see the
    # refine_disp_interp commit message).
    assert err(refined) < 0.7 * err(uniform96), (err(refined),
                                                 err(uniform96))


def test_certified_bounds_dominate_sampled_and_trace_agrees(setup):
    """ADVICE r4 #2: wendland_pallas_spec(certified=True) produces
    RIGOROUS per-block bounds (weight sums over reachable blocks) that
    dominate the sampled ones everywhere; the march under certified
    bounds still finds the same surface (slower steps, same roots)."""
    scene, grid, g2n, nodes, interp, u, ro, rd = setup
    w = disp_weights(interp, u)
    s_samp = wendland_pallas_spec(interp, w)
    s_cert = wendland_pallas_spec(interp, w, certified=True)
    # Certified >= sampled per block (the sampled values are exact |u|
    # and |grad u| at center points, which any sound bound must cover).
    assert float(jnp.min(s_cert.bu - s_samp.bu)) >= -1e-6
    assert float(jnp.min(s_cert.bg - s_samp.bg)) >= -1e-6
    assert float(s_cert.max_disp) >= float(s_samp.max_disp) - 1e-6

    from fembrain_tpu.render.pallas_trace import trace_pallas

    t1, h1 = trace_pallas(scene, ro, rd, interpret=True, disp=s_samp)
    t2, h2 = trace_pallas(scene, ro, rd, interpret=True, disp=s_cert)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert (h1 == h2).mean() > 0.99
    m = h1 & h2
    assert np.median(np.abs(np.asarray(t1)[m] - np.asarray(t2)[m])) < 5e-3
