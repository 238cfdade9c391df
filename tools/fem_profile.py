"""Profile the FEM implicit step: CG iteration count + per-matvec latency.

Usage: python tools/fem_profile.py [n]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from fembrain_tpu.fem import integrator as integ
from fembrain_tpu.fem.integrator import FemState
from fembrain_tpu.fem.tetmesh import build_fem_mesh
from fembrain_tpu.fem import corotational as co
from fembrain_tpu.mesh import samples


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    nodes, tets = samples.truth_cube(n, n, n, 0.1)
    mesh = build_fem_mesh(nodes, tets, fixed=samples.bottom_nodes(nodes))
    print(f"backend={jax.default_backend()} nodes={mesh.n_nodes} tets={mesh.n_tets}")
    f = jnp.zeros((mesh.n_nodes, 3)).at[:, 1].set(-1000.0)

    step = jax.jit(lambda s: integ.timestep(mesh, s, f, h=0.0333))
    st, iters = step(FemState.rest(mesh))
    print(f"step1 iters={int(iters)}")
    # timed steps with iteration telemetry
    for k in range(5):
        t0 = time.perf_counter()
        st, iters = step(st)
        it = int(iters)  # forces readback
        dt = time.perf_counter() - t0
        print(f"step {k}: {dt*1e3:.1f} ms, cg_iters={it}, ms/iter={dt*1e3/max(it,1):.3f}")

    # isolated matvec latency
    _, R = co.element_kinematics(mesh, st.q)
    v = jnp.ones_like(st.q)
    mv = jax.jit(lambda v: co.stiffness_apply(mesh, R, v))
    r = mv(v)
    r.block_until_ready()
    t0 = time.perf_counter()
    N = 100
    for _ in range(N):
        r = mv(r)
    float(jnp.sum(r))
    print(f"matvec (jit-boundary): {(time.perf_counter()-t0)/N*1e6:.1f} us")

    # matvec inside a fori_loop (what the while_loop actually pays)
    def loop(v):
        def body(_, v):
            w = co.stiffness_apply(mesh, R, v)
            return w / jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
        return jax.lax.fori_loop(0, N, body, v)

    lf = jax.jit(loop)
    r = lf(v)
    r.block_until_ready()
    t0 = time.perf_counter()
    float(jnp.sum(lf(v)))
    print(f"matvec (in-loop): {(time.perf_counter()-t0)/N*1e6:.1f} us")


if __name__ == "__main__":
    main()
