"""INI-style settings script reader/writer.

Feature-parity replacement for the reference's `SettingsScript`
(reference: src/base/SettingsScript.{h,cpp}) used for `.blob` scene files,
`.sim` simulation configs, and sketch-action scripts.

Format notes (matching the reference parser):
  * sections are `[NAME]` lines; keys are `key=value`;
  * tuple values are written as `(a, b, c)`;
  * keys are case-sensitive, values may contain spaces.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable, Sequence


def _parse_tuple(text: str) -> list[str]:
    text = text.strip()
    if text.startswith("(") and text.endswith(")"):
        text = text[1:-1]
    return [t.strip() for t in text.split(",") if t.strip() != ""]


@dataclass
class SettingsScript:
    """Ordered section -> {key: raw string value} store."""

    sections: dict[str, dict[str, str]] = field(default_factory=dict)

    # ---------------------------------------------------------------- load/save
    @classmethod
    def load(cls, path: str | Path) -> "SettingsScript":
        script = cls()
        current: dict[str, str] | None = None
        for raw in Path(path).read_text().splitlines():
            line = raw.strip()
            if not line or line.startswith((";", "#")):
                continue
            if line.startswith("[") and line.endswith("]"):
                name = line[1:-1].strip()
                current = script.sections.setdefault(name, {})
                continue
            if "=" in line and current is not None:
                key, _, value = line.partition("=")
                current[key.strip()] = value.strip()
        return script

    def save(self, path: str | Path) -> None:
        lines: list[str] = []
        for name, kv in self.sections.items():
            lines.append(f"[{name}]")
            for key, value in kv.items():
                lines.append(f"{key}={value}")
        Path(path).write_text("\n".join(lines) + "\n")

    # ---------------------------------------------------------------- typed reads
    def has_section(self, section: str) -> bool:
        return section in self.sections

    def read_str(self, section: str, key: str, default: str = "") -> str:
        return self.sections.get(section, {}).get(key, default)

    def read_bool(self, section: str, key: str, default: bool = False) -> bool:
        raw = self.read_str(section, key, "")
        if raw == "":
            return default
        return raw.strip().lower() in ("1", "true", "yes")

    def read_int(self, section: str, key: str, default: int = 0) -> int:
        raw = self.read_str(section, key, "")
        try:
            return int(float(raw))
        except ValueError:
            return default

    def read_float(self, section: str, key: str, default: float = 0.0) -> float:
        raw = self.read_str(section, key, "")
        try:
            return float(raw)
        except ValueError:
            return default

    def read_int_array(self, section: str, key: str) -> list[int]:
        raw = self.read_str(section, key, "")
        if raw == "":
            return []
        return [int(float(t)) for t in _parse_tuple(raw)]

    def read_vec(self, section: str, key: str, n: int, default=None) -> list[float]:
        raw = self.read_str(section, key, "")
        if raw == "":
            return list(default) if default is not None else [0.0] * n
        vals = [float(t) for t in _parse_tuple(raw)]
        if len(vals) < n:
            vals = vals + [0.0] * (n - len(vals))
        return vals[:n]

    def read_vec3(self, section: str, key: str, default=None) -> list[float]:
        return self.read_vec(section, key, 3, default)

    def read_vec4(self, section: str, key: str, default=None) -> list[float]:
        return self.read_vec(section, key, 4, default)

    # ---------------------------------------------------------------- typed writes
    def write_value(self, section: str, key: str, value) -> None:
        kv = self.sections.setdefault(section, {})
        if isinstance(value, bool):
            kv[key] = "1" if value else "0"
        elif isinstance(value, (list, tuple)):
            kv[key] = "(" + ", ".join(_fmt(v) for v in value) + ")"
        else:
            kv[key] = _fmt(value)


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)
