"""Marching-tetrahedra tables over the Kuhn 6-tet cube decomposition.

The reference polygonizes with multi-pass marching cubes driven by large
looked-up tables (src/implicit/_CellConfigTableCompact.*,
data/opencl/Polygonizer.cl:1564-1670) and separately extracts 6 tets per
voxel (data/opencl/Tetrahedralizer.cl:67-132). Here both the surface and
the embedded tet mesh come from ONE decomposition: the Kuhn (permutation)
split of each voxel into 6 tetrahedra, which is face-consistent across
neighboring cells, and whose 16-case marching-tets tables are small enough
to *generate* programmatically below (no hand-copied tables).

Corner encoding: cube corner mask b = x | y<<1 | z<<2.
Tet k (k-th permutation of (x,y,z)): corners are the monotone path
0 -> e_{p0} -> e_{p0}|e_{p1} -> 7.

Every tet edge connects comparable corners (a ⊂ b), so each global edge is
identified by (base grid vertex, direction mask m ∈ 1..7): 12 voxel edges,
6 face diagonals, 1 main diagonal per cell — 7 edge slots per grid vertex.
"""
from __future__ import annotations

from itertools import permutations

import numpy as np

# ----------------------------------------------------------------- geometry
CORNER_OFFSET = np.array(
    [[(b >> 0) & 1, (b >> 1) & 1, (b >> 2) & 1] for b in range(8)], np.int32
)

# 6 permutations in a fixed order.
PERMS = list(permutations((0, 1, 2)))

# TET_CORNERS[k][j] = cube-corner mask of tet k's j-th corner.
# Corner order is canonicalized to positive orientation (det > 0) so every
# extracted tet has positive signed volume (odd permutations are mirrored).
TET_CORNERS = np.zeros((6, 4), np.int32)
for k, perm in enumerate(PERMS):
    m = 0
    TET_CORNERS[k, 0] = 0
    for j, axis in enumerate(perm):
        m |= 1 << axis
        TET_CORNERS[k, j + 1] = m
    p = CORNER_OFFSET[TET_CORNERS[k]].astype(np.float64)
    vol6 = np.dot(p[1] - p[0], np.cross(p[2] - p[0], p[3] - p[0]))
    if vol6 < 0:
        TET_CORNERS[k, 1], TET_CORNERS[k, 2] = (
            TET_CORNERS[k, 2],
            TET_CORNERS[k, 1],
        )

# Local tet edges as (corner index i, corner index j), i < j.
EDGE_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

# TET_EDGE_BASE[k][e] = cube-corner mask of the edge's lower corner;
# TET_EDGE_DIR[k][e]  = direction mask m (1..7).
TET_EDGE_BASE = np.zeros((6, 6), np.int32)
TET_EDGE_DIR = np.zeros((6, 6), np.int32)
for k in range(6):
    for e, (i, j) in enumerate(EDGE_PAIRS):
        a, b = TET_CORNERS[k, i], TET_CORNERS[k, j]
        # Corners on an edge are always comparable (a ⊂ b or b ⊂ a), so the
        # lower corner is a & b and the direction mask is a ^ b — robust to
        # the orientation-canonicalizing corner swap above.
        assert (a & b) in (a, b)
        TET_EDGE_BASE[k, e] = a & b
        TET_EDGE_DIR[k, e] = a ^ b


def _build_case_tables():
    """TRI_TABLE[k, case, t, 3] local-edge ids (-1 pad), TRI_COUNT[k, case].

    Winding is chosen per (tet, case) from actual corner geometry so the
    triangle normal points toward the *outside* (field < iso) region.
    """
    tri_table = np.full((6, 16, 2, 3), -1, np.int8)
    tri_count = np.zeros((6, 16), np.int8)

    for k in range(6):
        corners = CORNER_OFFSET[TET_CORNERS[k]].astype(np.float64)  # [4,3]
        for case in range(1, 15):
            inside = [(case >> i) & 1 for i in range(4)]
            crossed = [
                e
                for e, (i, j) in enumerate(EDGE_PAIRS)
                if inside[i] != inside[j]
            ]
            # Midpoint vertex positions (iso at f=0.5 with f in {0,1}).
            mid = {
                e: 0.5 * (corners[EDGE_PAIRS[e][0]] + corners[EDGE_PAIRS[e][1]])
                for e in crossed
            }
            c_in = np.mean(
                [corners[i] for i in range(4) if inside[i]], axis=0
            )

            if len(crossed) == 3:
                tris = [list(crossed)]
            else:  # 4 crossed edges: order them cyclically around the quad.
                assert len(crossed) == 4
                # Two crossed edges are quad-adjacent iff they share a tet
                # face (their corner sets fit in a common 3-subset).
                def shares_face(e1, e2):
                    s = set(EDGE_PAIRS[e1]) | set(EDGE_PAIRS[e2])
                    return len(s) == 3

                e0 = crossed[0]
                adj = [e for e in crossed[1:] if shares_face(e0, e)]
                opp = [e for e in crossed[1:] if not shares_face(e0, e)]
                assert len(adj) == 2 and len(opp) == 1
                cyc = [e0, adj[0], opp[0], adj[1]]
                tris = [[cyc[0], cyc[1], cyc[2]], [cyc[0], cyc[2], cyc[3]]]

            oriented = []
            for tri in tris:
                p0, p1, p2 = (mid[e] for e in tri)
                n = np.cross(p1 - p0, p2 - p0)
                centroid = (p0 + p1 + p2) / 3.0
                # Outward normal points away from the inside region.
                if np.dot(n, c_in - centroid) > 0:
                    tri = [tri[0], tri[2], tri[1]]
                oriented.append(tri)

            tri_count[k, case] = len(oriented)
            for t, tri in enumerate(oriented):
                tri_table[k, case, t] = tri
    return tri_table, tri_count


TRI_TABLE, TRI_COUNT = _build_case_tables()

# Direction-mask -> integer xyz offset, index 0 unused.
DIR_OFFSET = np.array(
    [[(m >> 0) & 1, (m >> 1) & 1, (m >> 2) & 1] for m in range(8)], np.int32
)
