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


def _footer_rows(paths: list[str]) -> list[int]:
    """Parquet footer row counts, read concurrently — a serial driver-side
    footer loop over hundreds of stage files is a fixed tail that does not
    shrink with cluster size."""
    from concurrent.futures import ThreadPoolExecutor

    if len(paths) <= 2:
        return [fsio.parquet_metadata(p).num_rows for p in paths]
    with ThreadPoolExecutor(max_workers=16) as ex:
        return list(ex.map(lambda p: fsio.parquet_metadata(p).num_rows, paths))


def stage_done(path: str) -> bool:
    """A stage is complete iff its manifest exists and matches the files
    actually present (guards against truncated/partial copies)."""
    mpath = posixpath.join(path, MANIFEST)
    if not fsio.exists(mpath):
        return False
    try:
        manifest = fsio.read_json(mpath)
        names = sorted(manifest["files"])
        rows = _footer_rows([posixpath.join(path, f) for f in names])
        return all(
            manifest["files"][f]["rows"] == r for f, r in zip(names, rows)
        )
    except Exception:
        return False


def finalize_stage(tmp_path: str, final_path: str, lineage: dict | None = None) -> dict:
    """Seal a stage: write manifest into the temp dir, then atomically
    rename it into place. Returns the manifest."""
    from concurrent.futures import ThreadPoolExecutor

    names = [f for f in fsio.listdir(tmp_path) if f.endswith(".parquet")]

    def meta(fname: str):
        fpath = posixpath.join(tmp_path, fname)
        md = fsio.parquet_metadata(fpath)
        # bytes = actual file size (serialized_size is only the parquet
        # FOOTER metadata size — it under-reported stage bytes ~1000x)
        return fname, {"rows": md.num_rows, "bytes": fsio.file_size(fpath)}

    with ThreadPoolExecutor(max_workers=16) as ex:
        files = dict(ex.map(meta, names))
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


def pipeline_counters(out_dir: str):
    """Per-stage / per-partition counters table — the engine's analogue of
    the reference's internal_metrics source + `vertex top` view
    (src/sources/internal_metrics.rs:35-60, src/top.rs:42-55): one row per
    committed stage file plus a per-stage total row, with rows, bytes and
    the stage's recorded wall time. Reads only manifests (no data files),
    so it is free at any scale."""
    import pyarrow as pa

    stages, files, rows, bytes_, wall = [], [], [], [], []
    names: list[str] = []
    for entry in sorted(fsio.listdir(out_dir)):
        if fsio.exists(posixpath.join(out_dir, entry, MANIFEST)):
            names.append(entry)
        else:
            # one nesting level: epoch-incremental layout (epoch-<s>/agg …)
            for sub in sorted(fsio.listdir(posixpath.join(out_dir, entry))):
                if fsio.exists(posixpath.join(out_dir, entry, sub, MANIFEST)):
                    names.append(f"{entry}/{sub}")
    for entry in names:
        mpath = posixpath.join(out_dir, entry, MANIFEST)
        manifest = fsio.read_json(mpath)
        w = float(manifest.get("lineage", {}).get("wall_seconds", float("nan")))
        for fname in sorted(manifest["files"]):
            meta = manifest["files"][fname]
            stages.append(entry)
            files.append(fname)
            rows.append(int(meta["rows"]))
            bytes_.append(int(meta["bytes"]))
            wall.append(float("nan"))
        stages.append(entry)
        files.append("__total__")
        rows.append(int(manifest["rows"]))
        bytes_.append(sum(int(m["bytes"]) for m in manifest["files"].values()))
        wall.append(w)
    return pa.table(
        {
            "stage": pa.array(stages, type=pa.string()),
            "file": pa.array(files, type=pa.string()),
            "rows": pa.array(rows, type=pa.int64()),
            "bytes": pa.array(bytes_, type=pa.int64()),
            "wall_seconds": pa.array(wall, type=pa.float64()),
        }
    )


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
    # an EMPTY dataset writes zero files and never creates the dir —
    # the stage must still commit (manifest with rows=0), e.g. a scrape
    # of a payload with no matching family
    fsio.makedirs(tmp)
    lineage = dict(lineage or {})
    lineage["wall_seconds"] = round(time.time() - t0, 3)
    return finalize_stage(tmp, final_path, lineage)
