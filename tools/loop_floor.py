"""Find the per-iteration overhead floor of lax loops on this TPU."""
import time

import jax
import jax.numpy as jnp

N_IT = 200


def timeit(name, make):
    fn, x = make()
    lf = jax.jit(fn)
    jax.block_until_ready(lf(x))
    t0 = time.perf_counter()
    jax.block_until_ready(lf(x))
    print(f"{name:38s} {(time.perf_counter()-t0)/N_IT*1e6:8.1f} us/iter")


def loop(body):
    def fn(v):
        return jax.lax.fori_loop(0, N_IT, lambda _, v: body(v), v)
    return fn


def mul_small():
    v = jnp.ones((1000, 3))
    return loop(lambda v: v * 0.9999), v


def mul_flat():
    v = jnp.ones((3072,))
    return loop(lambda v: v * 0.9999), v


def dots_flat():
    v = jnp.ones((3072,))

    def body(v):
        a = jnp.vdot(v, v)
        b = jnp.vdot(v, v * 0.5)
        return v * (a / jnp.maximum(b, 1e-30)) * 0.5

    return loop(body), v


def dots_2d():
    v = jnp.ones((24, 128))

    def body(v):
        a = jnp.vdot(v, v)
        b = jnp.vdot(v, v * 0.5)
        return v * (a / jnp.maximum(b, 1e-30)) * 0.5

    return loop(body), v


def dots_big():
    v = jnp.ones((1024, 128))

    def body(v):
        a = jnp.vdot(v, v)
        b = jnp.vdot(v, v * 0.5)
        return v * (a / jnp.maximum(b, 1e-30)) * 0.5

    return loop(body), v


def while_dots():
    v = jnp.ones((3072,))

    def fn(v):
        def cond(s):
            v, it = s
            return (jnp.vdot(v, v) > 0) & (it < N_IT)

        def body(s):
            v, it = s
            a = jnp.vdot(v, v)
            v = v * (a / jnp.maximum(a * 0.5, 1e-30)) * 0.5
            return v, it + 1

        v, _ = jax.lax.while_loop(cond, body, (v, 0))
        return v

    return fn, v


timeit("fori: v*c [1000,3]", mul_small)
timeit("fori: v*c [3072]", mul_flat)
timeit("fori: 2 vdots+axpy [3072]", dots_flat)
timeit("fori: 2 vdots+axpy [24,128]", dots_2d)
timeit("fori: 2 vdots+axpy [1024,128]", dots_big)
timeit("while: vdot cond + body [3072]", while_dots)


def dots_n3():
    v = jnp.ones((1000, 3))

    def body(v):
        a = jnp.vdot(v, v)
        b = jnp.vdot(v, v * 0.5)
        return v * (a / jnp.maximum(b, 1e-30)) * 0.5

    return loop(body), v


def reshape_roundtrip():
    v = jnp.ones((3000,))

    def body(v):
        w = v.reshape(1000, 3) * 1.0001
        return w.reshape(-1) * 0.9999

    return loop(body), v


def dots_flat_reshape():
    """CG-style: state flat, matvec views [N,3]."""
    v = jnp.ones((3000,))

    def body(v):
        w = (v.reshape(1000, 3) * 1.0001).reshape(-1)
        a = jnp.vdot(v, w)
        b = jnp.vdot(v, v)
        return v * (a / jnp.maximum(b, 1e-30)) * 0.5

    return loop(body), v


timeit("fori: 2 vdots+axpy [1000,3]", dots_n3)
timeit("fori: reshape roundtrip 3000<->[1000,3]", reshape_roundtrip)
timeit("fori: dots flat + [N,3] view", dots_flat_reshape)
