"""Watermark state (``latest.yaml``) — the run-level commit point.

Reference behaviour (cli.py:290-294, 329-339; crash-semantics regression
test at tests/test_get_column_info.py:181-225): work is planned from the
stored watermark, never from listing written files, so a crashed run simply
re-plans the same delta next time; the watermark is written only after all
tables' files and manifests are committed.

I/O goes through ``fsio`` so the watermark commits to the same local or
cloud location as the data (reference cli.py:329-339 uploads it via
cloudpathlib).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from subgraph_extractor_spark import fsio


def _watermark_path(dataset_dir: str) -> str:
    return fsio.join(dataset_dir, "latest.yaml")


def read_watermark(dataset_dir: str) -> dict[str, Any]:
    """Return the stored watermark, or {} on first run (reference: empty
    dict when latest.yaml is absent)."""
    fs, _ = fsio.resolve(dataset_dir)
    _, path = fsio.resolve(_watermark_path(dataset_dir))
    if not fsio.exists(fs, path):
        return {}
    return fsio.read_yaml(fs, path) or {}


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
    fs, _ = fsio.resolve(dataset_dir)
    _, path = fsio.resolve(_watermark_path(dataset_dir))
    fsio.write_yaml_atomic(fs, path, state)
    return state
