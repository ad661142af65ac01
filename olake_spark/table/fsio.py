"""Filesystem abstraction for the engine's direct byte paths.

``table.location`` may be a plain POSIX path (tests, NFS, FUSE mounts)
or a URI (``file://``, ``s3://``, ``hdfs://`` …). Everything that
touches bytes OUTSIDE Spark — the compaction row-group copy
(operators/compaction._copy_bins) and the footer-stats harvest
(table/stats.file_entry) — resolves its filesystem through
``pyarrow.fs.FileSystem.from_uri`` here, so the no-decode fast paths
survive non-POSIX object storage unchanged (pyarrow ships S3/GCS/HDFS
implementations behind the same interface).

The commit protocol is abstracted separately: commit atomicity is a
pluggable backend (table/format.FileCommitBackend — POSIX ``O_EXCL``
default — vs CasCatalogBackend, the catalog-CAS shape object stores
need) — see README "Deployment surfaces".
"""

from __future__ import annotations

import os

from pyarrow import fs as pafs


def fs_for(path: str) -> tuple[pafs.FileSystem, str]:
    """Path or URI → ``(FileSystem, filesystem-native path)``.

    Plain paths (no scheme) map to ``LocalFileSystem`` with the path
    absolutized; URIs go through ``FileSystem.from_uri`` (which strips
    the scheme from the returned path).
    """
    if "://" not in path:
        return pafs.LocalFileSystem(), os.path.abspath(path)
    f, p = pafs.FileSystem.from_uri(path)
    return f, p


def file_size(path: str, fs: pafs.FileSystem | None = None) -> int:
    if fs is None:
        fs, path = fs_for(path)
    info = fs.get_file_info(path)
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    return info.size
