"""Block-coherent image tracing (trace_pallas_image) vs the XLA tracer."""
from pathlib import Path

import numpy as np

from fembrain_tpu.blob.reader import load_blob
from fembrain_tpu.render.camera import Camera, generate_rays
from fembrain_tpu.render.pallas_trace import block_permutation, trace_pallas_image
from fembrain_tpu.render.sphere_trace import trace

BLOB_DIR = Path("/root/reference/data/models/blobtree")


def test_block_permutation_is_bijective():
    perm = block_permutation(50, 70, bh=8, bw=16)
    live = perm[perm >= 0]
    assert len(live) == 50 * 70
    assert len(np.unique(live)) == 50 * 70
    assert perm.size % (8 * 16) == 0


def test_blocked_image_matches_xla():
    scene = load_blob(BLOB_DIR / "tumor.blob").pack()
    cam = Camera.orbit(25, 20, 7.0)
    w, h = 36, 20
    ro, rd = generate_rays(cam, w, h)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    t1, h1 = trace(scene, ro, rd)
    t2, h2 = trace_pallas_image(scene, ro, rd, h, w, interpret=True)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert (h1 != h2).sum() <= 2  # grazing-edge rays may flip
    m = h1 & h2
    assert np.abs(np.asarray(t1)[m] - np.asarray(t2)[m]).max() < 1e-4
