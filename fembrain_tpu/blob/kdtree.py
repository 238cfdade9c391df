"""KD-tree over primitive AABBs for ray picking.

Port of the reference's `KDTreeAccel` (src/implicit/KDTree.{h,cpp}:95):
median-split build (the reference uses SAH; median split is sufficient for
the <= 1024-box picking workload) and nearest-hit ray traversal.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class _Node:
    lo: np.ndarray
    hi: np.ndarray
    axis: int = -1
    split: float = 0.0
    left: "_Node | None" = None
    right: "_Node | None" = None
    items: list[int] | None = None  # leaf


def _ray_box_t(o, inv_d, lo, hi):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = np.max(np.minimum(t0, t1))
    tmax = np.min(np.maximum(t0, t1))
    if tmax < max(tmin, 0.0):
        return None
    return max(tmin, 0.0)


class KDTree:
    def __init__(self, boxes: list[tuple[np.ndarray, np.ndarray]],
                 leaf_size: int = 4, max_depth: int = 16):
        self.los = np.asarray([b[0] for b in boxes], np.float64)
        self.his = np.asarray([b[1] for b in boxes], np.float64)
        self.leaf_size = leaf_size
        items = list(range(len(boxes)))
        self.root = self._build(items, 0, max_depth)

    def _bounds(self, items):
        return self.los[items].min(0), self.his[items].max(0)

    def _build(self, items, depth, max_depth) -> _Node:
        lo, hi = self._bounds(items)
        node = _Node(lo=lo, hi=hi)
        if len(items) <= self.leaf_size or depth >= max_depth:
            node.items = items
            return node
        centers = 0.5 * (self.los[items] + self.his[items])
        axis = int(np.argmax(hi - lo))
        split = float(np.median(centers[:, axis]))
        left = [i for i in items if 0.5 * (self.los[i, axis] + self.his[i, axis]) <= split]
        right = [i for i in items if i not in set(left)]
        if not left or not right:
            node.items = items
            return node
        node.axis, node.split = axis, split
        node.left = self._build(left, depth + 1, max_depth)
        node.right = self._build(right, depth + 1, max_depth)
        return node

    def pick(self, origin, direction) -> int:
        """Index of the nearest box hit by the ray, or -1."""
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        inv = 1.0 / np.where(np.abs(d) < 1e-12, np.copysign(1e-12, d + 1e-15), d)
        best = [-1, np.inf]

        def visit(node: _Node):
            t = _ray_box_t(o, inv, node.lo, node.hi)
            if t is None or t >= best[1]:
                return
            if node.items is not None:
                for i in node.items:
                    ti = _ray_box_t(o, inv, self.los[i], self.his[i])
                    if ti is not None and ti < best[1]:
                        best[0], best[1] = i, ti
                return
            visit(node.left)
            visit(node.right)

        visit(self.root)
        return best[0]
