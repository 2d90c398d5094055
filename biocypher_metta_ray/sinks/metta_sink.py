"""MeTTa s-expression sink: distributed text-file writes + type defs.

Replaces the reference's append-mode single-file writer
(/root/reference/biocypher_metta/metta_writer.py:91-126 — which
appends on rerun and therefore duplicates output) with an
overwrite-idempotent, partition-per-task layout:

    {out_dir}/{group}/part-{task:05d}.metta   one file per write task
    {out_dir}/type_defs.metta                 driver-side one-shot
    {out_dir}/{group}/_MANIFEST.json          lineage (files, rows, bytes)

Files are written to a temp name and atomically renamed, so a re-run
(or a resumed run) can safely overwrite a partial partition. A shared
filesystem is assumed for multi-node runs (object-store-backed blocks
arrive at the writer task regardless of origin node).
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable

import pyarrow as pa
import ray.data
from ray.data import Datasink
from ray.data.datasource import WriteResult


class MettaDatasink(Datasink):
    """Writes a dataset with a ``line`` string column as .metta files,
    one per write task, deterministic names, atomic rename."""

    def __init__(self, out_dir: str, group: str, ext: str = ".metta"):
        self.dir = os.path.join(out_dir, group)
        self.group = group
        self.ext = ext

    def on_write_start(self) -> None:
        os.makedirs(self.dir, exist_ok=True)
        # a rerun with FEWER write tasks would otherwise leave the old
        # run's higher-numbered part files in place (stale duplicates);
        # part names are deterministic, so clear them all up front
        for f in os.listdir(self.dir):
            if (f.startswith("part-") and f.endswith((self.ext, ".tmp"))) \
                    or f == "_MANIFEST.json":
                try:
                    os.remove(os.path.join(self.dir, f))
                except OSError:
                    pass

    def write(self, blocks: Iterable, ctx) -> Any:
        rows = 0
        nbytes = 0
        path = os.path.join(self.dir, f"part-{ctx.task_idx:05d}{self.ext}")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for block in blocks:
                if len(block) == 0 or "line" not in (
                    block.column_names
                    if isinstance(block, pa.Table)
                    else block.columns
                ):
                    continue  # empty blocks can carry an empty schema
                if isinstance(block, pa.Table):
                    lines = block["line"].to_pylist()
                else:  # pandas
                    lines = list(block["line"])
                for line in lines:
                    f.write(line)
                    f.write("\n")
                    rows += 1
                    nbytes += len(line) + 1
        os.replace(tmp, path)
        return {"path": path, "rows": rows, "bytes": nbytes}

    def on_write_complete(self, write_result: "WriteResult") -> None:
        parts = [r for r in write_result.write_returns if r]
        manifest = {
            "group": self.group,
            "num_files": len(parts),
            "rows": sum(p["rows"] for p in parts),
            "bytes": sum(p["bytes"] for p in parts),
            "files": sorted(p["path"] for p in parts),
        }
        with open(os.path.join(self.dir, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)


def write_metta(lines_ds: ray.data.Dataset, out_dir: str, group: str,
                ext: str = ".metta") -> dict:
    """Write a ``line``-column dataset under ``{out_dir}/{group}/`` and
    return the manifest."""
    lines_ds.write_datasink(MettaDatasink(out_dir, group, ext))
    with open(os.path.join(out_dir, group, "_MANIFEST.json")) as f:
        return json.load(f)


def write_type_defs(schema, out_dir: str) -> str:
    """Driver-side one-shot ``type_defs.metta`` (tiny; mirrors
    metta_writer.py:28-88)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "type_defs.metta")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(schema.type_defs_text())
    os.replace(tmp, path)
    return path
