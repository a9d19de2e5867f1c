"""pipeline.fsio — publish/commit filesystem mechanics through the
pyarrow FileSystem API (round 5). Both marker-publish strategies are
covered: tmp+rename (atomic-rename backends) and direct single-PUT
(object stores)."""

import pytest

from esmarc_spark.pipeline import fsio

pafs = pytest.importorskip("pyarrow.fs")


def test_read_write_text_roundtrip(tmp_path):
    p = str(tmp_path / "marker" / "_LATEST")
    fsio.mkdirs(str(tmp_path / "marker"))
    assert fsio.read_text(p) is None
    fsio.write_text_atomic(p, "41")
    assert fsio.read_text(p) == "41"
    fsio.write_text_atomic(p, "42")  # overwrite (re-publish)
    assert fsio.read_text(p) == "42"
    # no tmp residue after the rename publish
    assert sorted(x.name for x in (tmp_path / "marker").iterdir()) == ["_LATEST"]


def test_write_text_uri_backend(tmp_path):
    """file:// URIs resolve through FileSystem.from_uri — zero posix
    calls in the write path."""
    p = f"file://{tmp_path}/_LATEST"
    fsio.write_text_atomic(p, "7")
    assert fsio.read_text(p) == "7"
    assert (tmp_path / "_LATEST").read_text() == "7"


def test_direct_put_branch(tmp_path, monkeypatch):
    """Backends without atomic rename (object stores) publish via a
    single overwrite PUT, never a copy+delete move."""
    class NoMoveFS:
        def __init__(self, inner):
            self._inner = inner

        def open_output_stream(self, p):
            return self._inner.open_output_stream(p)

        def open_input_stream(self, p):
            return self._inner.open_input_stream(p)

        def move(self, a, b):
            raise AssertionError("object-store branch must not rename")

    monkeypatch.setattr(
        fsio, "_fs", lambda path: (NoMoveFS(pafs.LocalFileSystem()), path)
    )
    monkeypatch.setattr(fsio, "_rename_is_atomic", lambda fs: False)
    p = str(tmp_path / "_LATEST")
    fsio.write_text_atomic(p, "9")
    assert fsio.read_text(p) == "9"


def test_rename_atomicity_classification():
    local = pafs.LocalFileSystem()
    assert fsio._rename_is_atomic(local)
    assert fsio._rename_is_atomic(pafs.SubTreeFileSystem("/tmp", local))


def test_list_child_dirs_and_gc(tmp_path):
    root = str(tmp_path / "t")
    for n in ("batch_id=2", "batch_id=0", "batch_id=10", "other"):
        fsio.mkdirs(fsio.join(root, n))
    assert fsio.list_child_dirs(root, "batch_id=") == [
        "batch_id=0", "batch_id=10", "batch_id=2",
    ]
    assert fsio.list_child_dirs(str(tmp_path / "missing"), "x") == []
    fsio.delete_dir(fsio.join(root, "batch_id=0"))
    fsio.delete_dir(fsio.join(root, "batch_id=0"))  # idempotent GC
    assert "batch_id=0" not in fsio.list_child_dirs(root, "batch_id=")


def test_join_is_uri_safe():
    assert fsio.join("s3://b/t/", "batch_id=3") == "s3://b/t/batch_id=3"
    assert fsio.join("/a/b", "c", "d") == "/a/b/c/d"
    assert fsio.join("file:///x", "y") == "file:///x/y"


def test_transient_errors_propagate(tmp_path, monkeypatch):
    """ADVICE r5: only confirmed absence maps to None/[] — a throttle or
    auth blip reading the commit marker must raise, not silently read as
    'no marker' (which would let readers merge a GC'd table state)."""
    class FlakyFS:
        """get_file_info says the path EXISTS; reads fail transiently."""

        def open_input_stream(self, p):
            raise OSError("AWS Error SLOW_DOWN during GetObject")

        def get_file_info(self, sel):
            if isinstance(sel, pafs.FileSelector):
                raise OSError("AWS Error SLOW_DOWN during ListObjectsV2")
            info = pafs.LocalFileSystem().get_file_info(__file__)
            return info

        def delete_dir(self, p):
            raise OSError("AWS Error SLOW_DOWN during DeleteObjects")

    monkeypatch.setattr(fsio, "_fs", lambda path: (FlakyFS(), path))
    with pytest.raises(OSError):
        fsio.read_text("s3://bucket/t/_LATEST")
    with pytest.raises(OSError):
        fsio.list_child_dirs("s3://bucket/t", "batch_id=")
    with pytest.raises(OSError):
        fsio.delete_dir("s3://bucket/t/batch_id=0")


def test_confirmed_absence_is_still_none(tmp_path):
    """The narrowed handler keeps the absent-marker contract."""
    missing = str(tmp_path / "nope" / "_LATEST")
    assert fsio.read_text(missing) is None
    assert fsio.list_child_dirs(str(tmp_path / "nope"), "b") == []
    fsio.delete_dir(str(tmp_path / "nope"))  # no-op, no raise
