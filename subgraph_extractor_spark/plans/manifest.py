"""Consolidated ``_metadata`` manifest — the snapshot commit point.

The reference writes, per table directory, a Parquet metadata-only file
whose row-group list (with relative file paths) enumerates exactly the
files of the current partition cover (reference cli.py:245-273; readers
open it as a dataset, tests/test_get_column_info.py:117-122).  Stale
superseded files (re-coarsening, SURVEY §2.11) may linger on disk but are
not referenced — the manifest IS the consistency mechanism.

Spark has no native equivalent (Delta/Iceberg subsume it; out of scope for
a pure-PySpark build), so this stays a small driver-side pyarrow helper:
Spark executors write the data files in parallel, the driver then collects
their footers (metadata only — no data I/O) and commits the manifest.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def write_consolidated_metadata(table_dir: str, data_files: list[str]) -> str:
    """Write ``<table_dir>/_metadata`` referencing exactly ``data_files``
    (paths relative to ``table_dir`` or absolute beneath it).

    Readers then do ``pq.ParquetDataset(table_dir + '/_metadata')`` (or
    ``pq.read_table``) and see only the committed cover, regardless of what
    other files exist under the directory.
    """
    table_dir = os.path.abspath(table_dir)
    collector = []
    schema = None
    for f in sorted(data_files):
        abs_f = f if os.path.isabs(f) else os.path.join(table_dir, f)
        rel = os.path.relpath(abs_f, table_dir)
        md = pq.read_metadata(abs_f)
        md.set_file_path(rel)
        if schema is None:
            schema = pq.read_schema(abs_f)
        collector.append(md)
    if schema is None:
        raise ValueError("cannot write a manifest over zero files")
    out = os.path.join(table_dir, "_metadata")
    tmp = out + ".tmp"
    pq.write_metadata(schema, tmp, metadata_collector=collector)
    os.replace(tmp, out)  # atomic swap = commit
    return out


def read_manifest_files(table_dir: str) -> list[str]:
    """List the file paths the current manifest references (relative)."""
    md = pq.read_metadata(os.path.join(table_dir, "_metadata"))
    return sorted(
        {md.row_group(i).column(0).file_path for i in range(md.num_row_groups)}
    )
