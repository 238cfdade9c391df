"""Partitioned-node sharded FEM (SURVEY §2.6 P7, VERDICT r1 item 7):
halo-exchange solve must equal the single-device solver, with
per-iteration communication scaling with the boundary, not N."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fembrain_tpu.fem import integrator as integ
from fembrain_tpu.fem.integrator import FemState
from fembrain_tpu.fem.partitioned import (
    NODE_AXIS,
    build_partitioned,
    from_partition_order,
    partitioned_timestep,
    to_partition_order,
)
from fembrain_tpu.fem.tetmesh import build_fem_mesh
from fembrain_tpu.mesh import samples

N_DEV = 4


@pytest.fixture(scope="module")
def setup():
    n = 6
    nodes, tets = samples.truth_cube(n, n, n, 0.1)
    fixed = samples.bottom_nodes(nodes)
    mesh = build_fem_mesh(nodes, tets, fixed=fixed)
    pm = build_partitioned(nodes, tets, N_DEV, fixed=fixed)
    dev_mesh = Mesh(np.array(jax.devices()[:N_DEV]), (NODE_AXIS,))
    return nodes, mesh, pm, dev_mesh


def test_partitioned_matches_replicated(setup):
    nodes, mesh, pm, dev_mesh = setup
    f = jnp.zeros((mesh.n_nodes, 3)).at[:, 1].set(-1000.0)

    st, _ = integ.timestep(mesh, FemState.rest(mesh), f, h=0.0333)

    q0 = to_partition_order(pm, jnp.zeros((mesh.n_nodes, 3)))
    v0 = to_partition_order(pm, jnp.zeros((mesh.n_nodes, 3)))
    fp = to_partition_order(pm, f)
    qp, vp, iters = jax.jit(
        lambda q, v, f: partitioned_timestep(pm, dev_mesh, q, v, f, h=0.0333)
    )(q0, v0, fp)
    q_back = from_partition_order(pm, qp)
    v_back = from_partition_order(pm, vp)

    np.testing.assert_allclose(
        np.asarray(q_back), np.asarray(st.q), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(v_back), np.asarray(st.qvel), rtol=1e-4, atol=1e-6
    )
    assert int(iters) > 0


def test_multiple_steps_stay_equal(setup):
    nodes, mesh, pm, dev_mesh = setup
    f = jnp.zeros((mesh.n_nodes, 3)).at[:, 1].set(-500.0)
    st = FemState.rest(mesh)
    # Cold-start both paths each step (partitioned path has no warm
    # start), comparing trajectories.
    q = to_partition_order(pm, st.q)
    v = to_partition_order(pm, st.qvel)
    fp = to_partition_order(pm, f)
    stepp = jax.jit(
        lambda q, v: partitioned_timestep(pm, dev_mesh, q, v, fp, h=0.01)
    )
    q_ref, v_ref = st.q, st.qvel
    for _ in range(3):
        st_ref, _ = integ.timestep(
            mesh, FemState(q=q_ref, qvel=v_ref), f, h=0.01
        )
        q_ref, v_ref = st_ref.q, st_ref.qvel
        q, v, _ = stepp(q, v)
    np.testing.assert_allclose(
        np.asarray(from_partition_order(pm, q)), np.asarray(q_ref),
        rtol=1e-3, atol=1e-6,
    )


def test_communication_scales_with_boundary():
    """The halo is one boundary layer: per-iteration exchanged bytes must
    be a small fraction of what the replicated path psums ([N, 3] full
    nodal array per CG iteration, fem/sharded.py) — and the fraction
    shrinks as the mesh grows (surface/volume)."""
    ratios = {}
    for n in (6, 10):
        nodes, tets = samples.truth_cube(n, n, n, 0.1)
        pm = build_partitioned(nodes, tets, N_DEV)
        replicated_psum_bytes = pm.n_nodes * 3 * 4
        ratios[n] = pm.halo_bytes_per_exchange / replicated_psum_bytes
        # Halo never exceeds ~2 node layers per partition.
        assert pm.n_halo <= 2 * n * n, (n, pm.n_halo)
    assert ratios[10] < 0.5
    assert ratios[10] < ratios[6]  # boundary/volume shrinks with N


def test_rejects_too_many_partitions():
    nodes, tets = samples.truth_cube(3, 3, 3, 0.1)
    with pytest.raises(ValueError):
        build_partitioned(nodes, tets, 8)
