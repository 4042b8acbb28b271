"""Filesystem primitives over ``pyarrow.fs`` so stage directories work on
both local paths and shared-filesystem/object-store URIs (s3://, hdfs://,
file://). On a multi-node cluster the blocks side-writes land in ONE
shared store that the driver's finalize step also sees — the round-1
single-node ``os.path`` side-writes silently committed only the driver
node's subset.

Atomicity: LocalFileSystem.move is an atomic rename. Object-store moves
are copy+delete (not atomic), so correctness there rests on (a) part
file names being deterministic per bucket — concurrent retries write the
same bytes — and (b) the stage manifest validating per-file row counts
before a stage is ever treated as done.
"""

from __future__ import annotations

import json
import posixpath

import pyarrow.parquet as pq
from pyarrow import fs as pafs


def fs_path(path: str) -> tuple[pafs.FileSystem, str]:
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def exists(path: str) -> bool:
    f, p = fs_path(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str) -> None:
    f, p = fs_path(path)
    f.create_dir(p, recursive=True)


def rmtree(path: str, ignore_errors: bool = True) -> None:
    f, p = fs_path(path)
    try:
        f.delete_dir(p)
    except FileNotFoundError:
        if not ignore_errors:
            raise
    except OSError:
        if not ignore_errors:
            raise


def listdir(path: str) -> list[str]:
    f, p = fs_path(path)
    infos = f.get_file_info(pafs.FileSelector(p, allow_not_found=True))
    return sorted(posixpath.basename(i.path) for i in infos)


def rename(src: str, dst: str) -> None:
    f, p_src = fs_path(src)
    _, p_dst = fs_path(dst)
    f.move(p_src, p_dst)


def write_text(path: str, text: str) -> None:
    f, p = fs_path(path)
    with f.open_output_stream(p) as out:
        out.write(text.encode())


def read_text(path: str) -> str:
    f, p = fs_path(path)
    with f.open_input_stream(p) as inp:
        return inp.read().decode()


def write_json(path: str, obj) -> None:
    write_text(path, json.dumps(obj, indent=1, sort_keys=True))


def read_json(path: str):
    return json.loads(read_text(path))


def file_size(path: str) -> int:
    f, p = fs_path(path)
    return int(f.get_file_info(p).size or 0)


def parquet_metadata(path: str):
    f, p = fs_path(path)
    return pq.ParquetFile(f.open_input_file(p)).metadata


def read_parquet(path: str):
    f, p = fs_path(path)
    return pq.read_table(f.open_input_file(p))


def write_parquet_atomic(table, final_path: str, token: str) -> None:
    """Write a parquet file and move it into place. ``token`` makes the
    temp name unique per writer (e.g. pid) so concurrent retries never
    collide; the deterministic final name makes the commit idempotent."""
    f, p = fs_path(final_path)
    tmp = f"{p}.tmp{token}"
    with f.open_output_stream(tmp) as out:
        pq.write_table(table, out)
    f.move(tmp, p)
