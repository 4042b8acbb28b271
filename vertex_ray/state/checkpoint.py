"""Checkpoint / manifest / lineage for resumable tier outputs.

The reference's durability model — tail-source fingerprint checkpoints
(lib/tail/src/checkpoint.rs:31-190) and end-to-end acks
(lib/finalize/src/finalization.rs) — becomes, for a batch engine, an
output-commit protocol (SURVEY.md §3.4): every stage writes to a temp
directory, is renamed into place atomically, and records a manifest
(per-file row counts + input lineage). A rerun skips any stage whose
manifest validates, so a killed run resumes where it stopped and
retried write tasks can never double-commit into a finalized stage.

All paths go through ``state/fsio`` (pyarrow.fs), so stages work on local
disk and on shared-filesystem / object-store URIs alike — on a multi-node
cluster the driver's finalize sees the same store the workers wrote to.
"""

from __future__ import annotations

import posixpath

from vertex_ray.state import fsio

MANIFEST = "manifest.json"
SUCCESS = "_SUCCESS"


def stage_done(path: str) -> bool:
    """A stage is complete iff its manifest exists and matches the files
    actually present (guards against truncated/partial copies)."""
    mpath = posixpath.join(path, MANIFEST)
    if not fsio.exists(mpath):
        return False
    try:
        manifest = fsio.read_json(mpath)
        for fname, meta in manifest["files"].items():
            md = fsio.parquet_metadata(posixpath.join(path, fname))
            if md.num_rows != meta["rows"]:
                return False
        return True
    except Exception:
        return False


def finalize_stage(tmp_path: str, final_path: str, lineage: dict | None = None) -> dict:
    """Seal a stage: write manifest into the temp dir, then atomically
    rename it into place. Returns the manifest."""
    files = {}
    for fname in fsio.listdir(tmp_path):
        if fname.endswith(".parquet"):
            md = fsio.parquet_metadata(posixpath.join(tmp_path, fname))
            files[fname] = {"rows": md.num_rows, "bytes": md.serialized_size}
    manifest = {"files": files, "rows": sum(m["rows"] for m in files.values()),
                "lineage": lineage or {}}
    fsio.write_json(posixpath.join(tmp_path, MANIFEST), manifest)
    fsio.write_text(posixpath.join(tmp_path, SUCCESS), "")
    parent = posixpath.dirname(final_path.rstrip("/"))
    if parent:
        fsio.makedirs(parent)
    if fsio.exists(final_path):
        fsio.rmtree(final_path)
    fsio.rename(tmp_path, final_path)
    return manifest


def stage_files(path: str) -> list[str]:
    """Data files of a stage (excludes manifest/_SUCCESS markers)."""
    return [
        posixpath.join(path, f) for f in fsio.listdir(path) if f.endswith(".parquet")
    ]


def read_manifest(path: str) -> dict:
    return fsio.read_json(posixpath.join(path, MANIFEST))


def write_stage(ds, final_path: str, lineage: dict | None = None) -> dict:
    """Write a Dataset to a stage directory with commit semantics.

    If the stage already validates, it is skipped (resume path) and its
    existing manifest returned. Stage wall time is recorded in the
    manifest lineage (per-stage counters, SURVEY.md §3.4)."""
    import time

    if stage_done(final_path):
        return read_manifest(final_path)
    tmp = final_path.rstrip("/") + ".__tmp__"
    if fsio.exists(tmp):
        fsio.rmtree(tmp)
    t0 = time.time()
    ds.write_parquet(tmp)
    lineage = dict(lineage or {})
    lineage["wall_seconds"] = round(time.time() - t0, 3)
    return finalize_stage(tmp, final_path, lineage)
