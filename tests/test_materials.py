"""Material registry (reference ShaderManager/TexManager analog,
src/graphics/ShaderManager.h:37, loaded at src/main.cpp:675)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.graphics.materials import (
    FLAT,
    PHONG,
    Material,
    MaterialRegistry,
)
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render.sphere_trace import TraceParams, shade, trace

BLOB = "/root/reference/data/models/blobtree/sphere.blob"


def test_registry_and_ini_roundtrip(tmp_path):
    reg = MaterialRegistry()
    assert "phong" in reg and "flat" in reg
    reg.add("soft", Material(ambient=0.4, diffuse=0.5, specular=0.1,
                             shininess=8.0))
    assert reg.get("soft").shininess == 8.0

    (tmp_path / "tissue.mat").write_text(
        "[MATERIAL]\nambient=0.3\ndiffuse=0.6\nspecular=0.2\nshininess=16\n"
    )
    n = reg.add_from_folder(tmp_path)
    assert n == 1
    m = reg.get("tissue")
    assert m.ambient == 0.3 and m.shininess == 16.0
    assert "tissue" in reg.names()


def test_materials_change_tracer_shading():
    sc = load_blob(BLOB)
    sc.flatten_instances()
    scene = sc.pack()
    cam = Camera.orbit(30.0, 20.0, 5.0)
    ro, rd = generate_rays(cam, 32, 24)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    t, hit = trace(scene, ro, rd, TraceParams())
    assert bool(hit.any())
    img_p = np.asarray(shade(scene, ro, rd, t, hit, material=PHONG))
    img_f = np.asarray(shade(scene, ro, rd, t, hit, material=FLAT))
    h = np.asarray(hit)
    # flat = pure albedo (no lighting variation across the ball)
    assert np.ptp(img_f[h], axis=0).max() < 1e-5
    assert np.ptp(img_p[h], axis=0).max() > 0.05
    # background unaffected
    assert np.allclose(img_p[~h], img_f[~h])


def test_materials_change_raster_shading():
    from fembrain_tpu.graphics.raster import rasterize
    from fembrain_tpu.graphics.scenegraph import DrawBatch

    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float64
    )
    faces = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    batch = DrawBatch(
        name="tri", verts=verts, faces=faces, color=(0.8, 0.2, 0.2, 1.0)
    )
    cam = Camera.orbit(30.0, 20.0, 4.0)
    img_p = rasterize([batch], cam, 64, 48, material=PHONG)
    img_f = rasterize([batch], cam, 64, 48, material=FLAT)
    drawn = (img_p != 1.0).any(-1)
    assert drawn.any()
    assert not np.allclose(img_p[drawn], img_f[drawn])
