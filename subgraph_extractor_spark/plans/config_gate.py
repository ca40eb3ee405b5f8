"""Dataset-config immutability gate.

The reference stores the dataset definition as ``config.yaml`` next to the
data and aborts a re-run whose in-memory config differs (DeepDiff equality,
reference cli.py:205-217).  Datasets are immutable-by-definition: changing
partition sizes or column mappings silently re-interpreting existing files
would corrupt the snapshot contract.
"""

from __future__ import annotations

from typing import Any

from subgraph_extractor_spark import fsio


class ConfigMismatchError(RuntimeError):
    """Raised when a stored dataset config differs from the supplied one."""


def _diff(a: Any, b: Any, path: str = "$") -> list[str]:
    """Minimal recursive structural diff (stand-in for DeepDiff)."""
    if type(a) is not type(b) and not (
        isinstance(a, (int, float)) and isinstance(b, (int, float))
    ):
        return [f"{path}: type {type(a).__name__} != {type(b).__name__}"]
    if isinstance(a, dict):
        out = []
        for k in sorted(set(a) | set(b)):
            if k not in a:
                out.append(f"{path}.{k}: added")
            elif k not in b:
                out.append(f"{path}.{k}: removed")
            else:
                out.extend(_diff(a[k], b[k], f"{path}.{k}"))
        return out
    if isinstance(a, (list, tuple)):
        if len(a) != len(b):
            return [f"{path}: length {len(a)} != {len(b)}"]
        out = []
        for i, (x, y) in enumerate(zip(a, b)):
            out.extend(_diff(x, y, f"{path}[{i}]"))
        return out
    return [] if a == b else [f"{path}: {a!r} != {b!r}"]


def ensure_config_unchanged(dataset_dir: str, config: dict) -> None:
    """Write config.yaml on first run; on re-runs raise ConfigMismatchError
    if the stored config differs in any way.  Works on any fsio-resolvable
    location (local, s3://, mock:// …)."""
    fs, base = fsio.resolve(dataset_dir)
    fsio.makedirs(fs, base)
    path = fsio.join(base, "config.yaml")
    if fsio.exists(fs, path):
        stored = fsio.read_yaml(fs, path)
        problems = _diff(stored, config)
        if problems:
            raise ConfigMismatchError(
                "dataset config drift (datasets are immutable):\n  "
                + "\n  ".join(problems)
            )
        return
    fsio.write_yaml_atomic(fs, path, config)
