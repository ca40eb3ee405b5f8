"""Packaging contract: pyproject console scripts exist, resolve to real
callables, and the installed binary runs the reference-shaped workflow
(suggest-config -> extract) end to end.

Reference parity: the reference ships a pip package exposing
``subgraph_extractor`` and ``subgraph_config_generator`` console scripts
(reference setup.py:36-41); this engine exposes the same two faces (plus
a multiplexed ``subgraph-extractor-spark {extract,suggest-config}``).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

EXPECTED_SCRIPTS = {
    "subgraph-extractor-spark": "main",
    "subgraph-extractor-spark-extract": "main_extract",
    "subgraph-extractor-spark-config-generator": "main_suggest_config",
}


def test_console_script_metadata_resolves():
    """Every declared console script loads to a callable in cli.py."""
    try:
        import tomllib
    except ImportError:  # pragma: no cover - py<3.11
        pytest.skip("tomllib unavailable")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    scripts = meta["project"]["scripts"]
    assert set(scripts) == set(EXPECTED_SCRIPTS)
    import subgraph_extractor_spark.cli as cli

    for name, target in scripts.items():
        mod_path, func = target.split(":")
        assert mod_path == "subgraph_extractor_spark.cli"
        assert func == EXPECTED_SCRIPTS[name]
        assert callable(getattr(cli, func))


def _find_script(name: str) -> str | None:
    """Locate an installed console script: PATH first, then the running
    interpreter's bin dir (pyenv shims may not be rehashed)."""
    found = shutil.which(name)
    if found:
        return found
    cand = os.path.join(os.path.dirname(sys.executable), name)
    return cand if os.path.exists(cand) else None


def test_installed_entry_point_end_to_end(tmp_path):
    """The installed binary performs the reference workflow on a tiny
    synthetic entity table: suggest-config writes YAML, extract commits
    partitioned parquet + _metadata manifest, readable by pyarrow."""
    exe = _find_script("subgraph-extractor-spark")
    if exe is None:
        pytest.skip("console script not installed (pip install -e . first)")

    import pyarrow as pa
    import pyarrow.parquet as pq

    tables_dir = tmp_path / "tables"
    tables_dir.mkdir()
    # 3000 blocks -> exactly two COMPLETE 1024-block partitions (the
    # suggested config's smallest size); incomplete tails are withheld
    # by design, so expect 2048 exported rows
    n = 3000
    tbl = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "val": pa.array([i * 10 for i in range(n)], pa.int64()),
            "_block_number": pa.array(range(n), pa.int64()),
        }
    )
    pq.write_table(tbl, tables_dir / "entity.parquet")

    cfg = tmp_path / "config.yaml"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r1 = subprocess.run(
        [
            exe,
            "suggest-config",
            "--tables-dir",
            str(tables_dir),
            "--name",
            "pkg_test",
            "--subgraph",
            "QmPkgTest",
            "--output",
            str(cfg),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert cfg.exists()

    out_dir = tmp_path / "out"
    r2 = subprocess.run(
        [
            exe,
            "extract",
            "--config",
            str(cfg),
            "--tables-dir",
            str(tables_dir),
            "--output",
            str(out_dir),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]

    import pyarrow.dataset as ds

    roots = [
        os.path.join(dirpath, "_metadata")
        for dirpath, _dirs, files in os.walk(out_dir)
        if "_metadata" in files
    ]
    assert roots, f"no _metadata manifest under {out_dir}"
    data = ds.parquet_dataset(roots[0]).to_table()
    assert data.num_rows == 2048
