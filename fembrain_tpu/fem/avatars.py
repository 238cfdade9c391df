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


@dataclass
class AvatarProbe:
    """Box probe: AABB sweep vs tissue -> contact vertex spring forces
    (reference AvatarProbe::onTranslate + Deformable::hapticSetCurrentForces,
    Deformable.cpp:430-448, 712-717)."""

    half_extents: np.ndarray = field(
        default_factory=lambda: np.array([0.2, 0.2, 0.2])
    )
    force_coeff: float = DEFAULT_FORCE_COEFF
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))

    def move_to(self, new_pos, node_positions: np.ndarray):
        """Move the probe; returns (contact_indices, contact_forces) for
        nodes inside the box, with spring force coeff * delta along the
        move direction."""
        new_pos = np.asarray(new_pos, np.float64)
        delta = new_pos - self.pos
        self.pos = new_pos
        lo = new_pos - self.half_extents
        hi = new_pos + self.half_extents
        inside = np.all((node_positions >= lo) & (node_positions <= hi), axis=1)
        idx = np.where(inside)[0]
        if idx.size == 0 or not np.any(delta):
            return idx, np.zeros((0, 3))
        forces = np.tile(self.force_coeff * delta, (idx.size, 1))
        return idx, forces


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
