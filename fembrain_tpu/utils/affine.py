"""Host-side affine transform helpers (NumPy).

Conventions mirror the reference's column-vector math
(reference: src/base/Matrix.h:420-456, 648-678): a node transform is
``forward = T @ R @ S`` and primitives are evaluated in local space using
``backward = inv(forward)`` (reference: src/implicit/ReadSceneModel.cpp:686-748).
"""
from __future__ import annotations

import numpy as np


def quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """Quaternion (x, y, z, w) -> 3x3 rotation matrix.

    Matches reference src/base/Matrix.h:648-678 (standard Hamilton convention).
    """
    x, y, z, w = (float(v) for v in q)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return np.array(
        [
            [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
        ],
        dtype=np.float64,
    )


def compose_trs(
    translate, rotate_quat, scale
) -> tuple[np.ndarray, np.ndarray]:
    """Build (forward, backward) 4x4 matrices for T(R(S p)).

    Returns float64 matrices; forward maps local->world, backward world->local.
    """
    fwd = np.eye(4, dtype=np.float64)
    fwd[:3, :3] = quat_to_matrix(rotate_quat) @ np.diag(
        np.asarray(scale, dtype=np.float64)
    )
    fwd[:3, 3] = np.asarray(translate, dtype=np.float64)
    bwd = np.linalg.inv(fwd)
    return fwd, bwd


def is_identity(m: np.ndarray, tol: float = 1e-12) -> bool:
    return bool(np.allclose(m, np.eye(4), atol=tol))


def map_affine(m: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Apply a 4x4 (or 3x4) affine matrix to 3-vector(s); p shape (..., 3)."""
    p = np.asarray(p, dtype=np.float64)
    return p @ m[:3, :3].T + m[:3, 3]
