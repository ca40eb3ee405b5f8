"""fsio: URI resolution + commit-helper I/O through the non-file scheme.

The mock:// scheme routes every byte through pyarrow FileSystem methods
(SubTreeFileSystem), proving the commit machinery never touches os.path —
the same code path a real s3://, gs:// or hdfs:// destination takes.
"""

import pytest

from subgraph_extractor_spark import fsio


@pytest.fixture()
def mock_root(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MOCK_FS_ROOT", str(tmp_path))
    return tmp_path


def test_scheme_parsing():
    assert fsio.scheme_of("/plain/path") is None
    assert fsio.scheme_of("file:///x") == "file"
    assert fsio.scheme_of("s3a://bucket/key") == "s3a"
    assert not fsio.is_remote("/plain/path")
    assert not fsio.is_remote("file:///x")
    assert fsio.is_remote("mock://bucket/x")
    assert fsio.join("mock://b/a", "c", "d") == "mock://b/a/c/d"


def test_local_resolution():
    import pyarrow.fs as pafs

    fs, p = fsio.resolve("/plain/path")
    assert isinstance(fs, pafs.LocalFileSystem) and p == "/plain/path"
    fs, p = fsio.resolve("file:///x/y")
    assert isinstance(fs, pafs.LocalFileSystem) and p == "/x/y"


def test_mock_requires_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_MOCK_FS_ROOT", raising=False)
    with pytest.raises(ValueError, match="SPARK_GRAFT_MOCK_FS_ROOT"):
        fsio.resolve("mock://bucket/x")


def test_mock_roundtrip_atomic_write(mock_root):
    fs, p = fsio.resolve("mock://data/sub/file.bin")
    assert not fsio.exists(fs, p)
    fsio.write_bytes_atomic(fs, p, b"hello")
    assert fsio.exists(fs, p)
    assert fsio.read_bytes(fs, p) == b"hello"
    # no .tmp residue after the move-commit
    fs2, d = fsio.resolve("mock://data/sub")
    assert fsio.listdir(fs2, d) == ["file.bin"]
    # overwrite through the same path
    fsio.write_bytes_atomic(fs, p, b"world")
    assert fsio.read_bytes(fs, p) == b"world"
    # bytes physically live under the backing root (nothing escaped)
    assert (mock_root / "data" / "sub" / "file.bin").read_bytes() == b"world"


def test_yaml_roundtrip(mock_root):
    fs, p = fsio.resolve("mock://ds/latest.yaml")
    fsio.write_yaml_atomic(fs, p, {"latest_block": 12, "earliest_block": 3})
    assert fsio.read_yaml(fs, p) == {"latest_block": 12, "earliest_block": 3}


def test_listdir_missing_dir_is_empty(mock_root):
    fs, d = fsio.resolve("mock://nope/nothing")
    assert fsio.listdir(fs, d) == []
