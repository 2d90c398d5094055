"""Stage-boundary checkpointing with lineage manifests (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference has no resume story — its writers open files in append
mode, so a re-run duplicates every record
(/root/reference/biocypher_metta/metta_writer.py:99,120). Here every
checkpointed stage writes

    {root}/{stage}/part-*.parquet        the stage output (parquet only)
    {root}/{stage}.manifest.json         lineage + metrics:
        fingerprint   caller-supplied hash of the stage inputs/config
        rows          output row count
        schema        output column names
        files         part files (deterministic once written)
        completed     true only once the data directory is final

Commit protocol: parquet is written to a temp directory, the directory
is atomically renamed into place, and the manifest (the commit point)
is written last via atomic rename. A crashed run leaves either no
manifest or a stale-fingerprint one; both trigger recompute. Partial
output is never observed by a resumer.

Resume semantics: if the manifest exists, is ``completed`` and its
fingerprint matches, the stage is NOT recomputed — the Parquet reads
back as a Dataset.

Granularity: whole-stage atomic swap. At 100 TB you'd additionally
shard the stage by input partition range (one manifest per shard,
same fingerprint logic, skip finished shards); the fingerprint field
already carries the caller's partition description to support that.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Callable

import ray.data


def _manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, f"{stage}.manifest.json")


def read_manifest(root: str, stage: str) -> dict | None:
    try:
        with open(_manifest_path(root, stage)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def run_stage(
    root: str,
    stage: str,
    fingerprint: str,
    ds_factory: Callable[[], ray.data.Dataset],
    metrics: dict | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Execute (or resume) a checkpointed stage.

    Returns ``(dataset, manifest)``; ``manifest['resumed']`` tells
    whether the checkpoint was reused.
    """
    os.makedirs(root, exist_ok=True)
    man = read_manifest(root, stage)
    stage_dir = os.path.join(root, stage)
    if (
        man
        and man.get("completed")
        and man.get("fingerprint") == fingerprint
        and os.path.isdir(stage_dir)
    ):
        return ray.data.read_parquet(stage_dir), dict(man, resumed=True)

    # a SIGKILLed run can leave temp dirs behind; sweep only STALE ones
    # (mtime > 1h) so a concurrent run's live tmp dir is never deleted
    import time

    now = time.time()
    for stale in os.listdir(root):
        if stale.startswith(f".{stage}.tmp-"):
            p = os.path.join(root, stale)
            try:
                if now - os.path.getmtime(p) > 3600:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    tmp_dir = os.path.join(root, f".{stage}.tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp_dir, exist_ok=True)
    try:
        ds = ds_factory()
        ds.write_parquet(tmp_dir)
        # manifest stats from parquet FOOTERS only — a full read-back
        # (ray read_parquet + count) re-scans the entire stage output,
        # which at corpus scale doubles the checkpoint's cost; the
        # footers carry exact row counts and the schema for free
        import pyarrow.parquet as _pq

        files = sorted(f for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
        rows = sum(
            _pq.ParquetFile(os.path.join(tmp_dir, f)).metadata.num_rows
            for f in files
        )
        schema_names = (
            _pq.ParquetFile(os.path.join(tmp_dir, files[0])).schema_arrow.names
            if files else []
        )
        if os.path.isdir(stage_dir):
            shutil.rmtree(stage_dir)
        os.replace(tmp_dir, stage_dir)
        manifest = {
            "stage": stage,
            "fingerprint": fingerprint,
            "rows": rows,
            "schema": schema_names,
            "files": files,
            "metrics": metrics or {},
            "completed": True,
            "resumed": False,
        }
        mp = _manifest_path(root, stage)
        with open(mp + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(mp + ".tmp", mp)
    except BaseException:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise
    return ray.data.read_parquet(stage_dir), manifest


def overwrite_parquet(ds: ray.data.Dataset, path: str, **write_kwargs) -> None:
    """Write a dataset's parquet output with overwrite semantics.

    ``Dataset.write_parquet`` names files with a per-execution UUID, so
    writing into an existing directory APPENDS a second copy of every
    row — the same rerun-duplication bug the reference writer has
    (metta_writer.py append mode). Protocol: write to a temp sibling
    dir, then atomically swap it into place.
    """
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(
        parent, f".{os.path.basename(path)}.tmp-{uuid.uuid4().hex[:8]}"
    )
    try:
        ds.write_parquet(tmp, **write_kwargs)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def run_stage_sharded(
    root: str,
    stage: str,
    fingerprint: str,
    shards: dict[str, Callable[[], ray.data.Dataset]],
    metrics: dict | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Per-partition checkpointing: each shard (e.g. an input file
    range or key range) is its own atomic checkpoint ``{stage}/{name}``
    with its own manifest; a resumed run recomputes ONLY the shards
    whose manifest is missing, incomplete or fingerprint-stale and
    reads the rest back (north_rule: resumable with per-partition
    lineage). The returned dataset is the union of all shard outputs;
    the combined manifest maps shard name -> shard manifest.
    """
    stage_root = os.path.join(root, stage)
    out_ds = None
    combined: dict = {"stage": stage, "fingerprint": fingerprint,
                      "shards": {}, "resumed_shards": [],
                      "computed_shards": []}
    for name in sorted(shards):
        ds, man = run_stage(
            stage_root, name, fingerprint, shards[name], metrics=metrics
        )
        combined["shards"][name] = man
        (combined["resumed_shards"] if man.get("resumed")
         else combined["computed_shards"]).append(name)
        out_ds = ds if out_ds is None else out_ds.union(ds)
    combined["rows"] = sum(m["rows"] for m in combined["shards"].values())
    return out_ds, combined
