"""Pallas sphere-trace kernel vs the XLA tracer (interpret mode on CPU)."""
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.ops.field import supports_rows_fast_path
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render.pallas_trace import trace_fast, trace_pallas
from fembrain_tpu.render.sphere_trace import trace

BLOB_DIR = Path("/root/reference/data/models/blobtree")


@pytest.mark.parametrize("name,zoom", [("sphere", 2.0), ("tumor", 7.0),
                                       ("spheredif", 3.0)])
def test_pallas_matches_xla(name, zoom):
    scene = load_blob(BLOB_DIR / f"{name}.blob").pack()
    assert supports_rows_fast_path(scene)
    cam = Camera.orbit(25, 20, zoom)
    ro, rd = generate_rays(cam, 40, 26)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    t1, h1 = trace(scene, ro, rd)
    t2, h2 = trace_pallas(scene, ro, rd, interpret=True)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert (h1 == h2).mean() > 0.999
    m = h1 & h2
    assert np.abs(np.asarray(t1)[m] - np.asarray(t2)[m]).max() < 1e-4


def test_dif_scene_uses_fixed_steps():
    """Non-monotone ops (DIFFERENCE) disable the adaptive bound."""
    scene = load_blob(BLOB_DIR / "spheredif.blob").pack()
    assert not scene.monotone_field
    scene2 = load_blob(BLOB_DIR / "tumor.blob").pack()
    assert scene2.monotone_field


def test_trace_fast_gradients_match():
    """trace_fast (pallas forward) carries the same implicit-diff gradient
    as the XLA path."""
    import dataclasses

    import jax

    scene = load_blob(BLOB_DIR / "sphere.blob").pack()
    cam = Camera.orbit(10, 10, 2.0)
    ro, rd = generate_rays(cam, 16, 16)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)

    def loss_fast(pos):
        s = dataclasses.replace(scene, prim_pos=pos)
        t, h = trace_fast(s, ro, rd, interpret=True)
        return jnp.sum(jnp.where(h, t, 0.0))

    def loss_xla(pos):
        s = dataclasses.replace(scene, prim_pos=pos)
        t, h = trace(s, ro, rd)
        return jnp.sum(jnp.where(h, t, 0.0))

    g1 = np.asarray(jax.grad(loss_fast)(scene.prim_pos))
    g2 = np.asarray(jax.grad(loss_xla)(scene.prim_pos))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-5)


def test_is_additive_detection():
    """Blobby scenes (root BLEND over all prims) are additive; DIF scenes
    and warp scenes are not."""
    assert load_blob(BLOB_DIR / "tumor.blob").pack().is_additive
    assert load_blob(BLOB_DIR / "ventricle.blob").pack().is_additive
    assert not load_blob(BLOB_DIR / "spheredif.blob").pack().is_additive


def test_additive_culled_path_matches_xla_brain():
    """The Morton-sorted, block-culled additive kernel path must agree
    with the XLA tracer on the many-prim brain scene (the scene the
    culling exists for)."""
    sc = load_blob("/root/repo/data/models/blobtree/brain.blob")
    sc.flatten_instances()
    scene = sc.pack()
    assert scene.is_additive
    cam = Camera.orbit(30, 20, 8.0)
    ro, rd = generate_rays(cam, 32, 20)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    t1, h1 = trace(scene, ro, rd)
    t2, h2 = trace_pallas(scene, ro, rd, interpret=True)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert (h1 == h2).mean() > 0.999
    m = h1 & h2
    if m.any():
        assert np.abs(np.asarray(t1)[m] - np.asarray(t2)[m]).max() < 1e-4


def test_warp_scene_on_kernel_fast_path():
    """Blend+warp scenes (BASELINE config #2) now run in the kernel:
    supports_rows_fast_path is true and the Pallas trace matches the XLA
    tracer (warp math shared via ops.warp.warp_components)."""
    from fembrain_tpu.blob.scene import OpDef, PrimDef, SceneDef
    from fembrain_tpu.blob.types import OpType, PrimType

    sc = SceneDef()
    sc.add_prim(PrimDef(PrimType.POINT, pos=np.array([-0.4, 0.0, 0.0])))
    sc.add_prim(PrimDef(PrimType.POINT, pos=np.array([0.4, 0.0, 0.0])))
    blend = sc.add_op(OpDef(OpType.BLEND, left=0, right=1))
    twist = sc.add_op(
        OpDef(OpType.WARP_TWIST, left=blend, left_is_op=True, is_unary=True,
              params=np.array([0.9, 0.0, 0.0, 0.0]))
    )
    sc.root_is_op, sc.root_idx = True, twist
    scene = sc.pack()
    assert len(scene.warp_groups[0][0]) == 1  # prims carry a warp chain
    assert supports_rows_fast_path(scene)
    assert not scene.is_additive  # warps forbid the additive cull path

    cam = Camera.orbit(25, 20, 2.5)
    ro, rd = generate_rays(cam, 40, 26)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    t1, h1 = trace(scene, ro, rd)
    t2, h2 = trace_pallas(scene, ro, rd, interpret=True)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert h1.sum() > 20
    assert (h1 == h2).mean() > 0.999
    m = h1 & h2
    assert np.abs(np.asarray(t1)[m] - np.asarray(t2)[m]).max() < 1e-4
