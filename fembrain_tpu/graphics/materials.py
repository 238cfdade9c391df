"""Material / shading-program registry.

TPU-native analog of the reference's named GLSL program store + texture
manager (src/graphics/ShaderManager.h:37, TexManager, GLSurface; programs
loaded from data/shaders/ at src/main.cpp:675). GLSL programs don't exist
here — shading is jitted JAX math — so a "shader" becomes a named set of
shading PARAMETERS (a `Material`) consumed by both renderers:

  * the differentiable sphere tracer (render.sphere_trace.shade and
    render.deformed.shade_deformed take `material=`),
  * the host rasterizer (graphics.raster.rasterize).

Registries can be populated programmatically or from an INI folder the
way the reference scans data/shaders/ (one [MATERIAL] section per file —
utils.ini.IniFile is the SettingsScript analog). Image textures remain
descoped by design: the reference's textures feed GL quads/HUD surfaces,
not the implicit-surface pipeline; material colors here come from the
BlobTree per-primitive colors, field-weighted (Polygonizer.cl:895-1128).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Material:
    """Blinn-Phong shading parameters (the phong.{vsh,fsh} analog)."""

    ambient: float = 0.25
    diffuse: float = 0.75
    specular: float = 0.3
    shininess: float = 32.0

    @classmethod
    def from_ini(cls, path) -> "Material":
        from ..utils.ini import SettingsScript

        ini = SettingsScript.load(path)
        sec = "MATERIAL"
        return cls(
            ambient=ini.read_float(sec, "ambient", cls.ambient),
            diffuse=ini.read_float(sec, "diffuse", cls.diffuse),
            specular=ini.read_float(sec, "specular", cls.specular),
            shininess=ini.read_float(sec, "shininess", cls.shininess),
        )


# The reference's stock programs, as parameter presets.
PHONG = Material()
FLAT = Material(ambient=1.0, diffuse=0.0, specular=0.0)          # "green"
EDGES = Material(ambient=0.6, diffuse=0.4, specular=0.0)  # "avataredges"


class MaterialRegistry:
    """Named material store (TheShaderManager analog)."""

    def __init__(self):
        self._store: dict[str, Material] = {
            "phong": PHONG, "flat": FLAT, "edges": EDGES,
        }

    def add(self, name: str, mat: Material) -> None:
        self._store[name] = mat

    def get(self, name: str) -> Material:
        return self._store[name]

    def __contains__(self, name: str) -> bool:
        return name in self._store

    def names(self) -> list[str]:
        return sorted(self._store)

    def add_from_folder(self, folder) -> int:
        """Load every *.mat INI in `folder` (addFromFolder analog,
        src/main.cpp:675). Returns the number loaded."""
        n = 0
        for p in sorted(Path(folder).glob("*.mat")):
            self.add(p.stem, Material.from_ini(p))
            n += 1
        return n


the_materials = MaterialRegistry()
