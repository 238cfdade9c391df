"""`.blob` scene-file parser.

Semantics-parity port of the reference's `ModelReader`
(reference: src/implicit/ReadSceneModel.cpp:238-748): INI-style files with
`[BLOBNODE i]` sections and a `[Global]` section (FileVersion >= 6,
RootIDs). Nodes are read recursively from the root; script node ids are
remapped to SOA indices in read order so range-children stay contiguous.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .scene import OpDef, PrimDef, SceneDef
from .types import (
    OP_NAME_TO_TYPE,
    PRIM_NAME_TO_TYPE,
    MAX_TREE_NODES,
    OpType,
    PrimType,
)
from ..utils.affine import compose_trs
from ..utils.ini import SettingsScript

MIN_FILE_VERSION = 6


class BlobReadError(RuntimeError):
    pass


def load_blob(path: str | Path) -> SceneDef:
    """Parse a `.blob` file into a SceneDef (instances NOT yet flattened)."""
    path = Path(path)
    script = SettingsScript.load(path)
    version = script.read_int("Global", "FileVersion", 0)
    if version < MIN_FILE_VERSION:
        raise BlobReadError(f"file version {version} < {MIN_FILE_VERSION}: {path}")
    roots = script.read_int_array("Global", "RootIDs")
    if not roots:
        raise BlobReadError(f"no RootIDs in {path}")

    scene = SceneDef(name=path.stem)
    reader = _Reader(script, scene)
    root_idx, root_is_op = reader.read_node(roots[0])
    scene.root_idx, scene.root_is_op = root_idx, root_is_op
    reader.resolve_instances()

    ct_prims = script.read_int("Global", "CountPrimitives", 0)
    ct_ops = script.read_int("Global", "CountOperators", 0)
    total = len(scene.prims) + len(scene.ops)
    if ct_prims + ct_ops > 0 and total != ct_prims + ct_ops:
        # Mirror of the reference's warning (ReadSceneModel.cpp:311-316);
        # unreachable nodes (not under the root) simply don't contribute.
        pass
    return scene


class _Reader:
    def __init__(self, script: SettingsScript, scene: SceneDef):
        self.script = script
        self.scene = scene
        # script node id -> (soa index, is_op), in read order
        self.read_map: dict[int, tuple[int, bool]] = {}

    # ---------------------------------------------------------------- nodes
    def read_node(self, nid: int) -> tuple[int, bool]:
        if len(self.scene.prims) + len(self.scene.ops) > 2 * MAX_TREE_NODES:
            raise BlobReadError("node overflow")
        sec = f"BLOBNODE {nid}"
        if not self.script.has_section(sec):
            raise BlobReadError(f"missing section {sec}")
        is_op = self.script.read_bool(sec, "IsOperator")
        idx = self._read_op(sec) if is_op else self._read_prim(sec, nid)
        self.read_map[nid] = (idx, is_op)
        return idx, is_op

    def _read_op(self, sec: str) -> int:
        s = self.script
        # Some assets use lowercase names / stray whitespace.
        name = s.read_str(sec, "OperatorType", "UNION").strip().upper()
        otype = OP_NAME_TO_TYPE.get(name, OpType.UNION)
        op = OpDef(otype=otype)
        idx = self.scene.add_op(op)

        # Operator parameters (reference ReadSceneModel.cpp:364-425).
        if otype == OpType.RICCI_BLEND:
            power = s.read_float(sec, "power", 1.0)
            op.params = np.array([power, 1.0 / power, 0.0, 0.0])
        elif otype == OpType.WARP_TWIST:
            op.params = np.array(
                [s.read_float(sec, "factor", 1.0), s.read_int(sec, "axis", 2), 0, 0],
                dtype=np.float64,
            )
            op.is_unary = True
        elif otype == OpType.WARP_TAPER:
            op.params = np.array(
                [
                    s.read_float(sec, "factor", 1.0),
                    s.read_int(sec, "base axis", 0),
                    s.read_int(sec, "taper axis", 2),
                    0,
                ],
                dtype=np.float64,
            )
            op.is_unary = True
        elif otype == OpType.WARP_BEND:
            op.params = np.array(
                [
                    s.read_float(sec, "rate", 1.0),
                    s.read_float(sec, "center", 0.5),
                    s.read_float(sec, "left bound", 0.0),
                    s.read_float(sec, "right bound", 1.0),
                ]
            )
            op.is_unary = True
        elif otype == OpType.WARP_SHEAR:
            op.params = np.array(
                [
                    s.read_float(sec, "factor", 1.0),
                    s.read_int(sec, "base axis", 0),
                    s.read_int(sec, "shear axis", 2),
                    0,
                ],
                dtype=np.float64,
            )
            op.is_unary = True
        elif otype == OpType.CACHE:
            op.is_unary = True

        # Children (reference ReadSceneModel.cpp:427-500).
        use_range = s.read_bool(sec, "ChildrenIDsUseRange", False)
        if use_range:
            rng = s.read_int_array(sec, "ChildrenIDsRange")
            if len(rng) != 2:
                raise BlobReadError(f"{sec}: bad ChildrenIDsRange")
            child_idx = [self.read_node(i)[0] for i in range(rng[0], rng[1] + 1)]
            op.left, op.right = child_idx[0], child_idx[-1]
            op.is_range = True
        else:
            ids = s.read_int_array(sec, "ChildrenIDs")
            if not op.is_unary and len(ids) < 2:
                raise BlobReadError(f"{sec}: binary op needs 2 children")
            op.left, op.left_is_op = self.read_node(ids[0])
            if not op.is_unary:
                op.right, op.right_is_op = self.read_node(ids[1])
        return idx

    def _read_prim(self, sec: str, nid: int) -> int:
        s = self.script
        name = s.read_str(sec, "PrimitiveType", "NULL").strip().upper()
        ptype = PRIM_NAME_TO_TYPE.get(name, PrimType.NULL)
        prim = PrimDef(ptype=ptype)
        prim.color = np.array(s.read_vec4(sec, "MtrlDiffused", [1, 1, 1, 1]))

        # Primitive parameters (reference ReadSceneModel.cpp:508-678).
        if ptype == PrimType.QUADRIC_POINT:
            pos = s.read_vec3(sec, "position")
            scale = s.read_float(sec, "scale")
            radius = s.read_float(sec, "radius")
            prim.pos = np.array(pos)
            prim.dir = np.array([scale, radius, radius * radius])
            prim.res = np.array(
                [
                    scale / radius**4,
                    -2.0 * scale / radius**2,
                    scale,
                    0.0,
                ]
            )
        elif ptype == PrimType.POINT:
            prim.pos = np.array(s.read_vec3(sec, "position"))
        elif ptype == PrimType.LINE:
            prim.pos = np.array(s.read_vec3(sec, "start"))
            prim.dir = np.array(s.read_vec3(sec, "end"))
        elif ptype in (PrimType.RING, PrimType.DISC):
            prim.pos = np.array(s.read_vec3(sec, "position"))
            prim.dir = np.array(s.read_vec3(sec, "direction"))
            prim.res = np.array([s.read_float(sec, "radius"), 0, 0, 0])
        elif ptype == PrimType.CYLINDER:
            prim.pos = np.array(s.read_vec3(sec, "position"))
            prim.dir = np.array(s.read_vec3(sec, "direction"))
            prim.res = np.array(
                [s.read_float(sec, "radius"), s.read_float(sec, "height"), 0, 0]
            )
        elif ptype == PrimType.CUBE:
            prim.pos = np.array(s.read_vec3(sec, "position"))
            prim.res = np.array([s.read_float(sec, "side"), 0, 0, 0])
        elif ptype == PrimType.TRIANGLE:
            prim.pos = np.array(s.read_vec3(sec, "corner0"))
            prim.dir = np.array(s.read_vec3(sec, "corner1"))
            prim.res = np.array(s.read_vec3(sec, "corner2") + [0.0])
        elif ptype == PrimType.INSTANCE:
            prim.instance_origin = s.read_int(sec, "OriginalNodeIndex", -1)
            prim.instance_origin_is_op = bool(
                s.read_int(sec, "OriginalNodeIsOp", 0)
            )

        scale = s.read_vec3(sec, "AffineScale", [1, 1, 1])
        rot = s.read_vec4(sec, "AffineRotate", [0, 0, 0, 1])
        trans = s.read_vec3(sec, "AffineTranslate", [0, 0, 0])
        prim.fwd, prim.bwd = compose_trs(trans, rot, scale)
        prim.affine = (tuple(scale), tuple(rot), tuple(trans))
        return self.scene.add_prim(prim)

    # ---------------------------------------------------------------- instances
    def resolve_instances(self) -> None:
        """Rewrite instance origin script-ids to SOA indices
        (reference ModelReader::setAllInstancedNodes)."""
        for prim in self.scene.prims:
            if prim.ptype != PrimType.INSTANCE:
                continue
            entry = self.read_map.get(prim.instance_origin)
            if entry is None:
                prim.instance_origin = -1
            else:
                prim.instance_origin, prim.instance_origin_is_op = entry
