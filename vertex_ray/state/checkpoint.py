"""Checkpoint / manifest / lineage for resumable tier outputs.

The reference's durability model — tail-source fingerprint checkpoints
(lib/tail/src/checkpoint.rs:31-190) and end-to-end acks
(lib/finalize/src/finalization.rs) — becomes, for a batch engine, an
output-commit protocol (SURVEY.md §3.4): every stage writes to a temp
directory, is renamed into place atomically, and records a manifest
(per-file row counts + input lineage). A rerun skips any stage whose
manifest validates, so a killed run resumes where it stopped and
retried write tasks can never double-commit into a finalized stage.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq

MANIFEST = "manifest.json"
SUCCESS = "_SUCCESS"


def stage_done(path: str) -> bool:
    """A stage is complete iff its manifest exists and matches the files
    actually present (guards against truncated/partial copies)."""
    mpath = os.path.join(path, MANIFEST)
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            manifest = json.load(f)
        for fname, meta in manifest["files"].items():
            if pq.ParquetFile(os.path.join(path, fname)).metadata.num_rows != meta["rows"]:
                return False
        return True
    except Exception:
        return False


def finalize_stage(tmp_path: str, final_path: str, lineage: dict | None = None) -> dict:
    """Seal a stage: write manifest into the temp dir, then atomically
    rename it into place. Returns the manifest."""
    files = {}
    for fname in sorted(os.listdir(tmp_path)):
        if fname.endswith(".parquet"):
            md = pq.ParquetFile(os.path.join(tmp_path, fname)).metadata
            files[fname] = {"rows": md.num_rows, "bytes": md.serialized_size}
    manifest = {"files": files, "rows": sum(m["rows"] for m in files.values()),
                "lineage": lineage or {}}
    with open(os.path.join(tmp_path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    open(os.path.join(tmp_path, SUCCESS), "w").close()
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    if os.path.exists(final_path):
        shutil.rmtree(final_path)
    os.rename(tmp_path, final_path)
    return manifest


def stage_files(path: str) -> list[str]:
    """Data files of a stage (excludes manifest/_SUCCESS markers)."""
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def write_stage(ds, final_path: str, lineage: dict | None = None) -> dict:
    """Write a Dataset to a stage directory with commit semantics.

    If the stage already validates, it is skipped (resume path) and its
    existing manifest returned. Stage wall time is recorded in the
    manifest lineage (per-stage counters, SURVEY.md §3.4)."""
    import time

    if stage_done(final_path):
        return read_manifest(final_path)
    tmp = final_path.rstrip("/") + ".__tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.time()
    ds.write_parquet(tmp)
    lineage = dict(lineage or {})
    lineage["wall_seconds"] = round(time.time() - t0, 3)
    return finalize_stage(tmp, final_path, lineage)
