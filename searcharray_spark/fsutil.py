"""Filesystem abstraction for index tables: local paths and URIs.

A 100 TB index lives in object storage; every driver/executor-side
metadata or side-input read (meta.json, doclens/tombstone side tables,
parquet footer walks) is routed through ``pyarrow.fs`` so any scheme
``pyarrow.fs.FileSystem.from_uri`` supports (file://, s3://, hdfs://,
gcs://...) works without code changes. Spark's own table scans take the
original URI (Hadoop FS layer). Plain local paths skip URI parsing.

The sandbox can only exercise LocalFileSystem (via bare paths and
file://), which is exactly what tests/test_remote_fs.py proves
end-to-end; unsupported schemes fail fast with a clear message.
"""
from __future__ import annotations

import json
import posixpath
from typing import List, Tuple


def resolve(path: str):
    """(pyarrow FileSystem, fs-internal path) for a path or URI."""
    from pyarrow import fs as pafs
    if "://" in path:
        try:
            return pafs.FileSystem.from_uri(path)
        except Exception as exc:
            scheme = path.split("://", 1)[0]
            raise NotImplementedError(
                f"unsupported index location scheme '{scheme}://' "
                f"(pyarrow.fs could not resolve it: {exc})") from exc
    return pafs.LocalFileSystem(), path


def join(base: str, *parts: str) -> str:
    """Path join that preserves a URI scheme (posix separator)."""
    return posixpath.join(base, *parts)


def read_json(path: str):
    fs, p = resolve(path)
    with fs.open_input_stream(p) as fh:
        return json.loads(fh.read().decode("utf-8"))


def exists(path: str) -> bool:
    from pyarrow import fs as pafs
    f, p = resolve(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def isdir(path: str) -> bool:
    from pyarrow import fs as pafs
    f, p = resolve(path)
    return f.get_file_info(p).type == pafs.FileType.Directory


def listdir(path: str) -> List[str]:
    """Base names of direct children (empty if missing)."""
    from pyarrow import fs as pafs
    f, p = resolve(path)
    if f.get_file_info(p).type != pafs.FileType.Directory:
        return []
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return [posixpath.basename(i.path) for i in f.get_file_info(sel)]


def list_parquet_files(root: str) -> List[Tuple[str, int]]:
    """[(full path-or-URI, size)] of every .parquet under root,
    recursive, sorted by path (empty if root missing)."""
    from pyarrow import fs as pafs
    f, p = resolve(root)
    if f.get_file_info(p).type != pafs.FileType.Directory:
        return []
    sel = pafs.FileSelector(p, recursive=True, allow_not_found=True)
    prefix = root[: len(root) - len(p)]  # scheme prefix ('' for local)
    out = []
    for info in f.get_file_info(sel):
        if info.is_file and info.path.endswith(".parquet"):
            out.append((prefix + info.path, int(info.size)))
    out.sort()
    return out


def read_parquet(path: str, columns=None, filters=None):
    """pyarrow table read that works for paths and URIs (file or dir)."""
    import pyarrow.parquet as pq
    f, p = resolve(path)
    return pq.read_table(p, columns=columns, filters=filters, filesystem=f)


def parquet_file(path: str):
    """pyarrow.parquet.ParquetFile for a path or URI (footer access)."""
    import pyarrow.parquet as pq
    f, p = resolve(path)
    return pq.ParquetFile(p, filesystem=f)


def write_json(path: str, obj) -> None:
    f, p = resolve(path)
    with f.open_output_stream(p) as fh:
        fh.write(json.dumps(obj).encode("utf-8"))


def write_json_atomic(path: str, obj) -> None:
    """Write via a temp name + move (atomic rename on LocalFileSystem;
    best-effort on object stores, where the read path tolerates a
    missing/stale file by re-deriving)."""
    f, p = resolve(path)
    f.create_dir(posixpath.dirname(p), recursive=True)
    tmp = p + ".tmp"
    with f.open_output_stream(tmp) as fh:
        fh.write(json.dumps(obj).encode("utf-8"))
    f.move(tmp, p)


def rmtree(path: str) -> None:
    from pyarrow import fs as pafs
    f, p = resolve(path)
    if f.get_file_info(p).type == pafs.FileType.Directory:
        f.delete_dir(p)


def move(path_src: str, path_dst: str) -> None:
    f, ps = resolve(path_src)
    _, pd = resolve(path_dst)
    f.move(ps, pd)


def local_path(path: str) -> str:
    """POSIX path for a local path or file:// URI. Index MUTATIONS that
    shell out to the (local-filesystem) build pipeline use this; truly
    remote indexes get a clear NotImplementedError instead of a broken
    os.* call."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if "://" in path:
        raise NotImplementedError(
            f"this operation builds new segments with local-filesystem "
            f"tooling; got remote location {path!r}")
    return path


def is_local(path: str) -> bool:
    from pyarrow import fs as pafs
    f, _ = resolve(path)
    return isinstance(f, pafs.LocalFileSystem)
