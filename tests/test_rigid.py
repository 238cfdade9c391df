"""Rigid environment: falling box vs floor and vs soft tissue (the
reference's Bullet demo staging, main.cpp:685-712,863-870, without
Bullet — fem.rigid penalty contact)."""
import numpy as np

import jax
import jax.numpy as jnp

from fembrain_tpu.fem import rigid
from fembrain_tpu.fem.integrator import FemState
from fembrain_tpu.fem.rigid import RigidBoxState
from fembrain_tpu.fem.tetmesh import build_fem_mesh
from fembrain_tpu.mesh import samples

HE = np.array([0.2, 0.2, 0.2])


def test_box_falls_and_rests_on_floor():
    st = RigidBoxState.at_rest([0.0, 2.0, 0.0])
    step = jax.jit(
        lambda s: rigid.rigid_step(s, HE, mass=1.0, h=0.01, ground_y=0.0)
    )
    for _ in range(400):
        st = step(st)
    # Rests with its bottom face on the floor.
    assert abs(float(st.pos[1]) - 0.2) < 1e-3
    assert abs(float(st.vel[1])) < 0.05


def test_box_deforms_tissue_and_gets_supported():
    """Drop a box onto a fixed-bottom truth cube: the tissue dents under
    the box and the box decelerates to rest ABOVE the floor (supported by
    tissue reaction), closing the falling-cube-vs-tissue behavior."""
    n = 5
    nodes, tets = samples.truth_cube(n, n, n, 0.1)  # 0.4^3 cube at origin
    mesh = build_fem_mesh(nodes, tets, fixed=samples.bottom_nodes(nodes))
    top = float(np.asarray(mesh.rest)[:, 1].max())
    cx = float(np.asarray(mesh.rest)[:, 0].mean())
    cz = float(np.asarray(mesh.rest)[:, 2].mean())

    box = RigidBoxState.at_rest([cx, top + 0.5, cz])
    fem_state = FemState.rest(mesh)

    step = jax.jit(
        lambda b, s: rigid.coupled_box_tissue_step(
            b, HE, 20.0, mesh, s, h=0.005, ground_y=-1.0
        )
    )
    min_bottom = 1e9
    for _ in range(300):
        box, fem_state, _ = step(box, fem_state)
        min_bottom = min(min_bottom, float(box.pos[1]) - HE[1])

    q = np.asarray(fem_state.q)
    assert np.isfinite(q).all()
    # Tissue dented downward under the box (E = 1e7: dents are small).
    assert q[:, 1].min() < -2e-5
    # Box never reached the floor: tissue carried it.
    assert min_bottom > -0.9
    # And it ended up near the (dented) tissue top, not in free fall.
    assert float(box.pos[1]) - HE[1] < top + 0.05
    assert float(box.pos[1]) - HE[1] > top - 0.2
