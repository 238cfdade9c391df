"""Coordinate-warp operators (twist / taper / bend / shear).

The reference declares these operators (data/opencl/Polygonizer.cl:139-143,
parsed in src/implicit/ReadSceneModel.cpp:373-425) but evaluates them as
pass-through stubs (src/implicit/Polygonizer.cpp:2048-2063). Here they are
implemented properly as Barr-style space deformations: evaluating a warped
subtree at point ``v`` evaluates the subtree at ``warp_point(v)``, the
*inverse* deformation applied to the query point.

Written in jnp so the same code runs in the JAX evaluator and (via
np.asarray on scalars) in the NumPy test oracle — one source of truth.

Parameter layout (from the `.blob` parser, ReadSceneModel.cpp:373-425):
  twist:  params = (factor, axis, -, -)
  taper:  params = (factor, base_axis, taper_axis, -)
  bend:   params = (rate, center, left_bound, right_bound)
  shear:  params = (factor, base_axis, shear_axis, -)
Axis parameters are static (scene wiring), values 0/1/2 = x/y/z.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..blob.types import OpType


def _axes_for(axis: int) -> tuple[int, int]:
    """The two axes orthogonal to `axis`, in right-handed order."""
    return ((1, 2), (2, 0), (0, 1))[axis]


def warp_point(wtype: int, params, axis_a: int, axis_b: int, v):
    """Apply the inverse deformation of one warp op to query point(s).

    v: [..., 3]; params: traced f32[4]; wtype/axis_* static ints.
    axis_a/axis_b are the integer axis params cast to static ints.
    """
    wtype = int(wtype)
    if wtype == int(OpType.WARP_TWIST):
        return _twist(v, params[0], axis_a)
    if wtype == int(OpType.WARP_TAPER):
        return _taper(v, params[0], axis_a, axis_b)
    if wtype == int(OpType.WARP_BEND):
        return _bend(v, params[0], params[1], params[2], params[3])
    if wtype == int(OpType.WARP_SHEAR):
        return _shear(v, params[0], axis_a, axis_b)
    return v


def _set_axes(v, updates: dict[int, jnp.ndarray]):
    cols = [updates.get(i, v[..., i]) for i in range(3)]
    return jnp.stack(cols, axis=-1)


def _twist(v, factor, axis: int):
    """Untwist: rotate around `axis` by -factor * coordinate-along-axis."""
    a, b = _axes_for(axis)
    ang = -factor * v[..., axis]
    c, s = jnp.cos(ang), jnp.sin(ang)
    va, vb = v[..., a], v[..., b]
    return _set_axes(v, {a: c * va - s * vb, b: s * va + c * vb})


def _taper(v, factor, base_axis: int, taper_axis: int):
    """Untaper: divide the taper coordinate by s(t) = 1 + factor * t."""
    s = 1.0 + factor * v[..., base_axis]
    safe = jnp.where(jnp.abs(s) < 1e-6, jnp.sign(s) * 1e-6 + (s == 0) * 1e-6, s)
    return _set_axes(v, {taper_axis: v[..., taper_axis] / safe})


def _bend(v, rate, center, lbound, rbound):
    """Inverse Barr bend along x into y (bend region [lbound, rbound]).

    Forward bend maps the x-axis segment to an arc of curvature `rate`
    centered at x = center. We apply the inverse map to the query point.
    """
    k = rate
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    kk = jnp.where(jnp.abs(k) < 1e-8, 1e-8, k)
    # Center of curvature of the forward bend.
    cy = 1.0 / kk
    xc = jnp.clip(x, lbound, rbound)
    # Inverse rotation angle about the curvature center.
    theta = -kk * (xc - center)
    c, s = jnp.cos(theta), jnp.sin(theta)
    xr = c * (x - center) - s * (y - cy)
    yr = s * (x - center) + c * (y - cy)
    x2 = xr + center
    y2 = yr + cy
    # Outside the bend region the map is a rigid continuation; the clamped
    # rotation above already reduces to identity at theta(lbound/rbound).
    small = jnp.abs(k) < 1e-8
    return _set_axes(v, {0: jnp.where(small, x, x2), 1: jnp.where(small, y, y2), 2: z})


def _shear(v, factor, base_axis: int, shear_axis: int):
    """Unshear: subtract factor * base coordinate from the shear coordinate."""
    return _set_axes(
        v, {shear_axis: v[..., shear_axis] - factor * v[..., base_axis]}
    )
