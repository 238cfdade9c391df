"""Break down per-CG-iteration cost: gather vs einsum vs scatter vs dots."""
import sys
import time

import jax
import jax.numpy as jnp

from fembrain_tpu.fem import corotational as co
from fembrain_tpu.fem.tetmesh import build_fem_mesh
from fembrain_tpu.mesh import samples

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
nodes, tets = samples.truth_cube(n, n, n, 0.1)
mesh = build_fem_mesh(nodes, tets, fixed=samples.bottom_nodes(nodes))
print(f"backend={jax.default_backend()} nodes={mesh.n_nodes} tets={mesh.n_tets}")

_, R = co.element_kinematics(mesh, jnp.zeros_like(mesh.rest))
krot = co.rotated_stiffness(mesh, R)
v0 = jnp.ones_like(mesh.rest)
N_IT = 200
NN = mesh.n_nodes
T = mesh.n_tets


def timeit(name, fn):
    def loop(v):
        def body(_, v):
            return fn(v) * 0.9999
        return jax.lax.fori_loop(0, N_IT, body, v)

    lf = jax.jit(loop)
    jax.block_until_ready(lf(v0))
    t0 = time.perf_counter()
    jax.block_until_ready(lf(v0))
    print(f"{name:26s} {(time.perf_counter()-t0)/N_IT*1e6:8.1f} us/iter")


# Constant element payload for isolating pieces.
we_const = jnp.ones((T, 12))


def gather_only(v):
    ve = v[mesh.tets].reshape(T, 12)          # the gather
    s = ve.sum(1)                              # cheap reduce to node shape
    return jnp.broadcast_to(s[:NN, None], (NN, 3))


def einsum_only(v):
    ve = jnp.broadcast_to(v[0].sum(), (T, 12)) + we_const
    w = jnp.einsum("tij,tj->ti", krot, ve)
    return jnp.broadcast_to(w.sum() / T, (NN, 3))


def scatter_only(v):
    fe = jnp.broadcast_to(v[:1], (T * 4, 3)) + v[0]
    return co._scatter_nodes(mesh, fe)


def dots_only(v):
    a = jnp.vdot(v, v)
    b = jnp.vdot(v, v * 0.5)
    return v * (a / jnp.maximum(b, 1e-30)) * 0.5


timeit("gather v[tets]", gather_only)
timeit("einsum tij,tj", einsum_only)
timeit("scatter (gather-form)", scatter_only)
timeit("full matvec_pre", lambda v: co.stiffness_apply_pre(mesh, krot, v))
timeit("two vdots + axpy", dots_only)
