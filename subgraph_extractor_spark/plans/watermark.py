"""Watermark state (``latest.yaml``) — the run-level commit point.

Reference behaviour (cli.py:290-294, 329-339; crash-semantics regression
test at tests/test_get_column_info.py:181-225): work is planned from the
stored watermark, never from listing written files, so a crashed run simply
re-plans the same delta next time; the watermark is written only after all
tables' files and manifests are committed.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Any

import yaml


def _watermark_path(dataset_dir: str) -> str:
    return os.path.join(dataset_dir, "latest.yaml")


def read_watermark(dataset_dir: str) -> dict[str, Any]:
    """Return the stored watermark, or {} on first run (reference: empty
    dict when latest.yaml is absent)."""
    path = _watermark_path(dataset_dir)
    if not os.path.exists(path):
        return {}
    with open(path, "r", encoding="utf-8") as fh:
        return yaml.safe_load(fh) or {}


def write_watermark(
    dataset_dir: str, earliest_block: int, latest_block: int
) -> dict[str, Any]:
    """Commit the new watermark AFTER files + manifests (ordering is the
    crash-recovery contract — SURVEY §4.2 atomicity)."""
    state = {
        "earliest_block": int(earliest_block),
        "latest_block": int(latest_block),
        "updated": _dt.datetime.now(_dt.timezone.utc).isoformat(),
    }
    os.makedirs(dataset_dir, exist_ok=True)
    tmp = _watermark_path(dataset_dir) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        yaml.safe_dump(state, fh)
    os.replace(tmp, _watermark_path(dataset_dir))
    return state
