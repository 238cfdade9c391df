"""BlobTree node type enums and flags.

Numeric values mirror the reference's enums so that packed scenes are
directly comparable (reference: data/opencl/Polygonizer.cl:136-143).
"""
from __future__ import annotations

import enum


class PrimType(enum.IntEnum):
    """Skeletal primitive types (reference Polygonizer.cl:136-137)."""

    POINT = 0
    LINE = 1
    CYLINDER = 2
    DISC = 3
    RING = 4
    CUBE = 5
    TRIANGLE = 6
    QUADRIC_POINT = 7
    NULL = 8
    INSTANCE = 9
    RBF = 10


class OpType(enum.IntEnum):
    """BlobTree operator types (reference Polygonizer.cl:139-143)."""

    UNION = 0
    INTERSECT = 1
    DIF = 2
    SMOOTH_DIF = 3
    BLEND = 4
    RICCI_BLEND = 5
    GRADIENT_BLEND = 6
    FAST_QUADRIC_POINT_SET = 7
    CACHE = 8
    WARP_TWIST = 9
    WARP_TAPER = 10
    WARP_BEND = 11
    WARP_SHEAR = 12


class OpFlags(enum.IntFlag):
    """Operator flags (reference Polygonizer.cl:145)."""

    RIGHT_CHILD_IS_OP = 1
    LEFT_CHILD_IS_OP = 2
    CHILD_INDEX_IS_RANGE = 4
    IS_UNARY_OP = 8
    IS_RIGHT_OP = 16
    BREAK = 32


WARP_OPS = frozenset(
    {OpType.WARP_TWIST, OpType.WARP_TAPER, OpType.WARP_BEND, OpType.WARP_SHEAR}
)

# Script-name tables (reference src/implicit/ReadSceneModel.cpp:26-136).
OP_NAME_TO_TYPE = {
    "FASTQUADRICPOINTSET": OpType.FAST_QUADRIC_POINT_SET,
    "UNION": OpType.UNION,
    "BLEND": OpType.BLEND,
    "RICCI BLEND": OpType.RICCI_BLEND,
    "INTERSECTION": OpType.INTERSECT,
    "DIFFERENCE": OpType.DIF,
    "SMOOTH DIFFERENCE": OpType.SMOOTH_DIF,
    "CACHE": OpType.CACHE,
    "TWIST": OpType.WARP_TWIST,
    "TAPER": OpType.WARP_TAPER,
    "BEND": OpType.WARP_BEND,
    "SHEAR": OpType.WARP_SHEAR,
}
OP_TYPE_TO_NAME = {v: k for k, v in OP_NAME_TO_TYPE.items()}

PRIM_NAME_TO_TYPE = {
    "QUADRICPOINT": PrimType.QUADRIC_POINT,
    "POINT": PrimType.POINT,
    "LINE": PrimType.LINE,
    "CYLINDER": PrimType.CYLINDER,
    "DISC": PrimType.DISC,
    "RING": PrimType.RING,
    "CUBE": PrimType.CUBE,
    "TRIANGLE": PrimType.TRIANGLE,
    "INSTANCE": PrimType.INSTANCE,
    "NULL": PrimType.NULL,
}
PRIM_TYPE_TO_NAME = {v: k for k, v in PRIM_NAME_TO_TYPE.items()}

# Scene capacity caps (reference src/implicit/Polygonizer.h:71-72).
MAX_TREE_NODES = 1024
# Iso-surface constants (reference data/opencl/Polygonizer.cl:68-70).
ISO_VALUE = 0.5
FIELD_VALUE_EPSILON = 0.001
NORMAL_DELTA = 1e-4
DEFAULT_CELL_SIZE = 0.14
