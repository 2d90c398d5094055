"""Data-staging analogue of the reference's scripts/download_data.py.

The reference script pulls each source over HTTP/GCS into a
per-source subdirectory (download_data.py:15-60) that the adapter
config then points at. This sandbox has no network, so the staging
layer here works from a YAML manifest of LOCAL (or mounted) source
paths and produces the same per-source layout — plus the properties a
100 TB ingest actually needs and the reference lacks:

- **resumable**: every staged file gets a sha256 + size entry in
  ``_STAGING_MANIFEST.json``; a re-run skips files whose digest
  matches (the reference re-downloads everything).
- **atomic**: files copy to a ``.tmp`` name and rename into place; a
  killed run never leaves a half-file that a build would read.
- **verifiable**: ``verify`` recomputes digests against the manifest.

Manifest format:

```yaml
sources:
  gencode:
    files: [/mnt/raw/gencode.annotation.gtf.gz]
  reactome:
    files:
      - /mnt/raw/ReactomePathways.txt
      - /mnt/raw/Ensembl2Reactome_All_Levels.txt
```

Usage:
    python tools/stage_data.py stage  --manifest sources.yaml --out /data
    python tools/stage_data.py verify --out /data
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys

import yaml

MANIFEST_NAME = "_STAGING_MANIFEST.json"


def _sha256(path: str, bufsize: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(bufsize)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def _load_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, MANIFEST_NAME)
    try:
        with open(p) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"files": {}}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    p = os.path.join(out_dir, MANIFEST_NAME)
    with open(p + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(p + ".tmp", p)


def stage(manifest_path: str, out_dir: str,
          verify_dest: bool = False) -> dict:
    """Stage every manifest file. Resume discipline:

    - fast path: if the source's (size, mtime_ns) matches the manifest
      AND the staged file exists with the recorded byte count, skip
      without reading a byte (O(metadata) no-op reruns);
    - otherwise the source is re-hashed; a digest match with an intact
      dest skips, anything else re-copies atomically;
    - the manifest is saved after EVERY file, so a mid-run crash keeps
      all completed work;
    - ``verify_dest=True`` additionally re-hashes each staged file
      (repairs same-size corruption that the size check cannot see —
      the cheap path for that is ``verify`` + re-stage with this flag).

    Duplicate basenames within one source are an ERROR (the second
    file would silently clobber the first in the staged layout).
    """
    with open(manifest_path) as f:
        spec = yaml.safe_load(f)
    os.makedirs(out_dir, exist_ok=True)
    manifest = _load_manifest(out_dir)
    staged, skipped = [], []
    for source, cfg in (spec.get("sources") or {}).items():
        dest_dir = os.path.join(out_dir, source)
        os.makedirs(dest_dir, exist_ok=True)
        seen: dict[str, str] = {}
        for src in cfg.get("files") or []:
            name = os.path.basename(src)
            rel = f"{source}/{name}"
            if rel in seen:
                raise ValueError(
                    f"duplicate staged name {rel!r}: {seen[rel]} and "
                    f"{src} would overwrite each other"
                )
            seen[rel] = src
            dest = os.path.join(dest_dir, name)
            st = os.stat(src)
            src_stat = [st.st_size, st.st_mtime_ns]
            entry = manifest["files"].get(rel)
            dest_intact = (
                entry is not None
                and os.path.isfile(dest)
                and os.path.getsize(dest) == entry.get("bytes")
                and (not verify_dest or _sha256(dest) == entry.get("sha256"))
            )
            if entry and entry.get("src_stat") == src_stat and dest_intact:
                skipped.append(rel)
                continue
            digest = _sha256(src)
            if (
                entry
                and entry.get("sha256") == digest
                and dest_intact
            ):
                entry["src_stat"] = src_stat  # refresh the fast path
                _save_manifest(out_dir, manifest)
                skipped.append(rel)
                continue
            tmp = dest + ".tmp"
            shutil.copyfile(src, tmp)
            os.replace(tmp, dest)
            manifest["files"][rel] = {
                "sha256": digest,
                "bytes": os.path.getsize(dest),
                "src_stat": src_stat,
                "source_path": os.path.abspath(src),
            }
            _save_manifest(out_dir, manifest)  # per-file commit point
            staged.append(rel)
    _save_manifest(out_dir, manifest)
    return {"staged": staged, "skipped": skipped}


def verify(out_dir: str) -> dict:
    manifest = _load_manifest(out_dir)
    ok, bad, missing = [], [], []
    for rel, entry in manifest["files"].items():
        p = os.path.join(out_dir, rel)
        if not os.path.isfile(p):
            missing.append(rel)
        elif _sha256(p) != entry["sha256"]:
            bad.append(rel)
        else:
            ok.append(rel)
    return {"ok": ok, "corrupt": bad, "missing": missing}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    st = sub.add_parser("stage")
    st.add_argument("--manifest", required=True)
    st.add_argument("--out", required=True)
    st.add_argument("--verify-dest", action="store_true")
    vf = sub.add_parser("verify")
    vf.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    if args.cmd == "stage":
        report = stage(args.manifest, args.out,
                       verify_dest=args.verify_dest)
    else:
        report = verify(args.out)
        if report["corrupt"] or report["missing"]:
            print(json.dumps(report, indent=1))
            sys.exit(1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
