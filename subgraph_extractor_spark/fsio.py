"""Filesystem abstraction for the commit machinery (cloud-storage path).

The reference uploads every artifact through cloudpathlib so the same
pipeline commits to local disk or S3 (reference cli.py:226-243, layout at
cli.py:251-255).  Round 1 of this repo was ``os.path``-only — the Spark
data write accepted any Hadoop URI but the manifest/watermark/config-gate
commit helpers did not.  This module closes that gap over
``pyarrow.fs.FileSystem`` (LocalFileSystem, S3FileSystem, GcsFileSystem,
HadoopFileSystem — all public pyarrow), which the manifest helper needs
anyway for remote footer reads.

Scheme handling:

- plain paths / ``file://``  -> LocalFileSystem
- ``s3://`` / ``s3a://`` / ``s3n://`` -> pyarrow S3FileSystem (the a/n
  prefixes are Hadoop-connector spellings of the same object store; Spark
  keeps the original URI for its own data writes)
- ``mock://`` -> SubTreeFileSystem over a backing root from
  ``$SPARK_GRAFT_MOCK_FS_ROOT`` — a non-file scheme for tests that forces
  every byte through this abstraction (and works from executor workers,
  which inherit the env in local mode)
- anything else -> ``pyarrow.fs.FileSystem.from_uri``

All joins are POSIX (URIs and object-store keys are ``/``-separated).
"""

from __future__ import annotations

import io
import os
import posixpath

import pyarrow.fs as pafs

_CLOUD_SCHEMES = {"s3", "s3a", "s3n", "gs", "gcs", "hdfs", "abfs", "abfss"}


def scheme_of(path: str) -> str | None:
    if "://" not in path:
        return None
    return path.split("://", 1)[0].lower()


def is_remote(path: str) -> bool:
    return scheme_of(path) not in (None, "file")


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """URI/path -> (pyarrow FileSystem, fs-local path)."""
    sch = scheme_of(path)
    if sch is None:
        return pafs.LocalFileSystem(), path
    rest = path.split("://", 1)[1]
    if sch == "file":
        return pafs.LocalFileSystem(), "/" + rest.lstrip("/")
    if sch == "mock":
        root = os.environ.get("SPARK_GRAFT_MOCK_FS_ROOT")
        if not root:
            raise ValueError(
                "mock:// paths need SPARK_GRAFT_MOCK_FS_ROOT set to a backing dir"
            )
        return pafs.SubTreeFileSystem(root, pafs.LocalFileSystem()), rest
    if sch in ("s3a", "s3n"):
        # Hadoop-connector spellings; pyarrow's native client speaks s3://
        return pafs.FileSystem.from_uri("s3://" + rest)
    return pafs.FileSystem.from_uri(path)


def join(base: str, *parts: str) -> str:
    """POSIX join that leaves the scheme prefix intact."""
    return posixpath.join(base, *parts)


def exists(fs: pafs.FileSystem, p: str) -> bool:
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(fs: pafs.FileSystem, p: str) -> None:
    fs.create_dir(p, recursive=True)


def read_bytes(fs: pafs.FileSystem, p: str) -> bytes:
    with fs.open_input_stream(p) as f:
        return f.read()


def write_bytes_atomic(fs: pafs.FileSystem, p: str, data: bytes) -> None:
    """Write-then-move commit.  Atomic on POSIX rename semantics; on object
    stores move is copy+delete — same exposure window as the reference's
    cloudpathlib upload, and the watermark-last ordering (not file
    atomicity) is the pipeline's real crash contract."""
    parent = posixpath.dirname(p)
    if parent:
        makedirs(fs, parent)
    tmp = p + ".tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(data)
    move(fs, tmp, p)


def move(fs: pafs.FileSystem, src: str, dest: str) -> None:
    fs.move(src, dest)


def listdir(fs: pafs.FileSystem, d: str) -> list[str]:
    """Names (not paths) of plain files directly under d; [] if absent."""
    sel = pafs.FileSelector(d, allow_not_found=True, recursive=False)
    return sorted(
        posixpath.basename(fi.path)
        for fi in fs.get_file_info(sel)
        if fi.type == pafs.FileType.File
    )


def read_yaml(fs: pafs.FileSystem, p: str):
    import yaml

    return yaml.safe_load(io.BytesIO(read_bytes(fs, p)))


def write_yaml_atomic(fs: pafs.FileSystem, p: str, obj) -> None:
    import yaml

    write_bytes_atomic(fs, p, yaml.safe_dump(obj).encode("utf-8"))
