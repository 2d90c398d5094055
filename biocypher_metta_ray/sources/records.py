"""Record-structured and directory-shaped sources.

Covers the reference source kinds that are not line-oriented
(SURVEY §2.3.1):

- :func:`read_swissprot` — SwissProt flat records (``//`` terminated;
  Bio.SwissProt.parse analogue, uniprot_protein_adapter.py:46-62):
  per-file task splits the byte stream into records, then a vectorized
  kernel extracts accessions / names / dbxrefs.
- :func:`read_gaf` — GO annotation rows (``!`` comments, 17 tab
  columns; gaf_adapter.py:82-103).
- :func:`read_obo` — OBO ontology stanzas -> term rows with is_a
  parents (text-format stand-in for the reference's OWL loading,
  ontologies_adapter.py:47-147; hierarchy edges preserved).
- :func:`read_keyed_dir` — directory of per-key files where the
  FILENAME is the key (coxpressdb_adapter.py:34-47): uses
  ``read_binary_files(include_paths=True)`` so the key rides along.

Parsers handle gzip transparently (suffix-sniffed) and follow
log-and-skip for malformed records.
"""

from __future__ import annotations

import gzip as _gzip
import os
import re

import pandas as pd
import ray.data


def _decode(b: bytes, path: str) -> str:
    # sniff, don't trust the extension: ray.data.read_binary_files may
    # already have decompressed .gz via Arrow's codec detection
    if b[:2] == b"\x1f\x8b":
        b = _gzip.decompress(b)
    return b.decode("utf-8", errors="replace")


def read_swissprot(path: str) -> ray.data.Dataset:
    """-> rows (accession, entry_name, protein_name, dbxrefs list str
    'DB:ID'). One task per file; records split on '//' lines."""
    ds = ray.data.read_binary_files(path, include_paths=True)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"accession": [], "entry_name": [], "protein_name": [],
                "dbxrefs": []}
        for b, p in zip(df["bytes"], df["path"]):
            text = _decode(b, p)
            for rec in re.split(r"^//\s*$", text, flags=re.M):
                if "AC   " not in rec:
                    continue
                acc_lines = re.findall(r"^AC   (.+)$", rec, flags=re.M)
                accs = [
                    a.strip().rstrip(";")
                    for line in acc_lines
                    for a in line.split(";") if a.strip()
                ]
                if not accs:
                    continue
                idm = re.search(r"^ID   (\S+)", rec, flags=re.M)
                namem = re.search(
                    r"^DE   RecName: Full=([^;{]+)", rec, flags=re.M
                )
                drs = re.findall(r"^DR   (\w+); ([^;]+);", rec, flags=re.M)
                rows["accession"].append(accs[0])
                rows["entry_name"].append(idm.group(1) if idm else None)
                rows["protein_name"].append(
                    namem.group(1).strip() if namem else None
                )
                rows["dbxrefs"].append(
                    sorted(f"{db}:{val.strip()}" for db, val in drs)
                )
        return pd.DataFrame(rows)

    return ds.map_batches(parse, batch_format="pandas")


GAF_COLS = (
    "db", "db_object_id", "db_object_symbol", "qualifier", "go_id",
    "db_reference", "evidence_code", "with_from", "aspect",
)


def read_gaf(path: str) -> ray.data.Dataset:
    """GAF 2.x rows -> first 9 typed columns (gaf_adapter.py:82-103)."""
    from .bio_formats import read_lines

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"]
        lines = lines[~lines.str.startswith("!")]
        if lines.empty:
            return pd.DataFrame(columns=list(GAF_COLS))
        parts = lines.str.split("\t", expand=True)
        if parts.shape[1] < len(GAF_COLS):
            return pd.DataFrame(columns=list(GAF_COLS))
        out = parts.iloc[:, : len(GAF_COLS)].set_axis(list(GAF_COLS), axis=1)
        return out[out["go_id"].str.startswith("GO:", na=False)].reset_index(
            drop=True
        )

    return read_lines(path).map_batches(parse, batch_format="pandas")


def read_obo(path: str) -> ray.data.Dataset:
    """OBO stanzas -> rows (id, name, namespace, is_a list, is_obsolete).

    Stanza-level parse inside per-file tasks; hierarchy edges derive
    from ``is_a`` (the reference keeps OWL subclass edges,
    ontologies_adapter.py:88-147).
    """
    ds = ray.data.read_binary_files(path, include_paths=True)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"id": [], "name": [], "namespace": [], "is_a": [],
                "is_obsolete": []}
        for b, p in zip(df["bytes"], df["path"]):
            text = _decode(b, p)
            for stanza in text.split("\n[")[0:]:
                header, _, body = stanza.partition("\n")
                if not header.strip().lstrip("[").startswith("Term"):
                    continue
                fields: dict[str, list[str]] = {}
                for line in body.splitlines():
                    if ":" not in line:
                        continue
                    k, _, v = line.partition(":")
                    fields.setdefault(k.strip(), []).append(v.strip())
                tid = (fields.get("id") or [None])[0]
                if not tid:
                    continue
                rows["id"].append(tid)
                rows["name"].append((fields.get("name") or [None])[0])
                rows["namespace"].append((fields.get("namespace") or [None])[0])
                rows["is_a"].append(
                    sorted(v.split("!")[0].strip() for v in fields.get("is_a", []))
                )
                rows["is_obsolete"].append(
                    (fields.get("is_obsolete") or ["false"])[0] == "true"
                )
        return pd.DataFrame(rows)

    return ds.map_batches(parse, batch_format="pandas")


def read_keyed_dir(dir_path: str, key_name: str = "key") -> ray.data.Dataset:
    """Directory of per-key text files -> (key, text) rows; the key is
    the filename stem (coxpressdb_adapter.py:34-41)."""
    ds = ray.data.read_binary_files(dir_path, include_paths=True)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        keys, texts = [], []
        for b, p in zip(df["bytes"], df["path"]):
            stem = os.path.basename(p)
            for suf in (".gz", ".txt", ".csv", ".tsv"):
                if stem.endswith(suf):
                    stem = stem[: -len(suf)]
            keys.append(stem)
            texts.append(_decode(b, p))
        return pd.DataFrame({key_name: keys, "text": texts})

    return ds.map_batches(parse, batch_format="pandas")


def read_two_col_tsv(path: str, names=("a", "b"),
                     prefix_filter: tuple[str, str] | None = None) -> ray.data.Dataset:
    """2-column TSV (reactome_adapter.py:48-76); optional per-column
    prefix filters (e.g. keep only ``R-HSA`` pathway rows)."""
    from .bio_formats import read_lines

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["text"].str.split("\t", expand=True)
        if parts.shape[1] < 2:
            return pd.DataFrame(columns=list(names))
        out = parts.iloc[:, :2].set_axis(list(names), axis=1).dropna()
        if prefix_filter is not None:
            for col, pref in zip(names, prefix_filter):
                if pref:
                    out = out[out[col].str.startswith(pref)]
        return out.reset_index(drop=True)

    return read_lines(path).map_batches(parse, batch_format="pandas")
