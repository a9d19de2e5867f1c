"""Filesystem mechanics for publish/commit protocols, behind the
pyarrow FileSystem API (round 5 — VERDICT r4 #2).

The round-4 write-then-publish compaction PROTOCOL was object-store
shaped (plain writes, one small marker object as the commit point, GC
that is safe to crash/resume), but its implementation spoke posix
(``os.replace``/``shutil.rmtree``/``Path.iterdir``). These helpers are
the same operations through ``pyarrow.fs``, so the identical code path
runs on a local path, a ``file://`` URI, or (on a real cluster) an
``s3://``/``gs://``/``hdfs://`` URI — anything
``pyarrow.fs.FileSystem.from_uri`` resolves.

Atomicity of the marker publish is per-backend:

* local filesystems: write to a ``.tmp`` sibling + ``move`` (posix
  rename atomicity — same guarantee ``os.replace`` gave);
* object stores: a single small ``open_output_stream`` PUT — the write
  is all-or-nothing at the object level, and a copy+delete ``move``
  (pyarrow's S3 move) would be WEAKER, so the tmp step is skipped.

Spark keeps reading/writing the parquet payloads by URI; only the
metadata operations (marker, listing, GC) go through these helpers.
"""

from __future__ import annotations


def _fs(path: str):
    """(FileSystem, fs-relative path) for a plain path or URI."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _rename_is_atomic(fs) -> bool:
    import pyarrow.fs as pafs

    if isinstance(fs, pafs.SubTreeFileSystem):
        return _rename_is_atomic(fs.base_fs)
    return isinstance(fs, (pafs.LocalFileSystem, pafs.HadoopFileSystem))


def read_text(path: str) -> str | None:
    """Contents of a small text object, or None when absent.

    Only *absence* maps to None. Transient IO errors (throttle, auth
    blip, timeout) must propagate: this reads commit markers, and
    treating a failed read of ``_LATEST`` as "no marker" would make
    readers silently fall back to live batch dirs that compaction GC
    may already have removed — an incomplete table, not an error.
    """
    import pyarrow.fs as pafs

    fs, rel = _fs(path)
    try:
        with fs.open_input_stream(rel) as f:
            return f.read().decode("utf-8")
    except FileNotFoundError:
        return None
    except OSError:
        # Some backends raise plain OSError for a missing key; only a
        # confirmed NotFound is "absent" — everything else re-raises.
        if fs.get_file_info(rel).type == pafs.FileType.NotFound:
            return None
        raise


def write_text_atomic(path: str, text: str) -> None:
    """Publish a small text object as a commit point (see module
    docstring for the per-backend atomicity strategy)."""
    fs, rel = _fs(path)
    if _rename_is_atomic(fs):
        tmp = rel + ".tmp"
        with fs.open_output_stream(tmp) as f:
            f.write(text.encode("utf-8"))
        fs.move(tmp, rel)
    else:
        with fs.open_output_stream(rel) as f:
            f.write(text.encode("utf-8"))


def exists(path: str) -> bool:
    import pyarrow.fs as pafs

    fs, rel = _fs(path)
    return fs.get_file_info(rel).type != pafs.FileType.NotFound


def mkdirs(path: str) -> None:
    fs, rel = _fs(path)
    fs.create_dir(rel, recursive=True)


def list_child_dirs(path: str, prefix: str) -> list[str]:
    """Names (not paths) of the immediate child directories whose name
    starts with ``prefix``; [] when the path does not exist. On
    object stores "directories" are common prefixes — pyarrow
    normalizes both views."""
    import pyarrow.fs as pafs

    fs, rel = _fs(path)
    try:
        infos = fs.get_file_info(
            pafs.FileSelector(rel, recursive=False, allow_not_found=True)
        )
    except (FileNotFoundError, NotADirectoryError):
        # allow_not_found covers a missing base on most backends; these
        # are the residual "path absent / not a dir" shapes. Real IO
        # errors propagate — a throttled listing must not read as
        # "no batches" (same consistency argument as read_text).
        return []
    return sorted(
        i.base_name
        for i in infos
        if i.type == pafs.FileType.Directory and i.base_name.startswith(prefix)
    )


def delete_dir(path: str) -> None:
    """Recursive delete; a missing path is a no-op (GC semantics —
    a crashed GC rerun meets already-deleted dirs). Other IO errors
    propagate: GC runs after the commit point, so a failure here is
    safe to surface and resume."""
    import pyarrow.fs as pafs

    fs, rel = _fs(path)
    try:
        fs.delete_dir(rel)
    except FileNotFoundError:
        pass
    except OSError:
        if fs.get_file_info(rel).type == pafs.FileType.NotFound:
            return
        raise


def join(base: str, *parts: str) -> str:
    """URI-safe path join (posix separators on every backend)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out
