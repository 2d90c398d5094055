"""Bioinformatics flat-file sources and parse kernels, Ray-Data-first.

The reference ingests ~30 gzip'd text formats through per-row Python
generators (SURVEY §2.3.1). Here each format is (a) a
``ray.data.read_text``-based source (Ray handles gzip via
``arrow_open_stream_args`` or transparent file decompression) and (b)
a vectorized ``map_batches`` parse kernel over the line column:

- GTF: tab-split + ``key "value";`` attribute grammar
  (/root/reference/biocypher_metta/adapters/gencode_gene_adapter.py:37-42,86-90)
- VCF: ``#`` comment skip + tab fields + ``k=v;`` INFO parse with
  comma-split lists (dbsnp_adapter.py:25-42)
- BED-like: whitespace fields with the 0->1-based ``+1`` coordinate
  shift (epd_adapter.py:39-40, dgv_variant_adapter.py:36-37)

All kernels are pandas-vectorized (``str.split``/``str.extract``) and
per-row-error tolerant: malformed lines are dropped and counted, never
fatal (log-and-skip, gtex_eqtl_adapter.py:93-95).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

GTF_COLS = [
    "chr", "source", "type", "start", "end", "score", "strand", "frame",
    "attributes",
]
VCF_COLS = ["chr", "pos", "id", "ref", "alt", "qual", "filter", "info"]


def first_lines_of(path: str) -> list[str]:
    """First line of every file ``path`` resolves to (file, dir, or
    glob) — tiny driver-side reads used to identify header lines so a
    distributed text read can filter them by VALUE. Positional
    header-skipping is unsound once Ray splits files into blocks.

    Constraint (documented trade): filtering is by value, so (a) a
    data line byte-equal to a header line is dropped too, and (b) in a
    multi-file directory every file is assumed to carry the header
    convention — a HEADERLESS file would blacklist its own first data
    value across the directory. Callers count dropped lines via
    state.metrics for visibility; the reference's positional skip is
    lossier (it silently eats one DATA line per headerless file)."""
    import glob as _glob
    import gzip
    import os

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        )
    elif any(ch in path for ch in "*?["):
        files = sorted(_glob.glob(path))
    else:
        files = [path]
    out = []
    for f in files:
        opener = gzip.open if f.endswith(".gz") else open
        try:
            with opener(f, "rt") as fh:
                line = fh.readline()
        except OSError:
            continue
        if line:
            out.append(line.rstrip("\n").rstrip("\r"))
    return out


def read_lines(path: str, **kwargs) -> ray.data.Dataset:
    """Text-line source (gzip transparent via Arrow's compressed
    stream when the filename ends in .gz)."""
    if path.endswith(".gz"):
        kwargs.setdefault(
            "arrow_open_stream_args", {"compression": "gzip"}
        )
    return ray.data.read_text(path, **kwargs)


def parse_gtf_batch(
    df: pd.DataFrame,
    type_filter: str | None = None,
    attr_keys: tuple[str, ...] = ("gene_id", "gene_name", "gene_type"),
) -> pd.DataFrame:
    """GTF lines -> typed frame with requested attributes extracted.

    ``gene_id`` values get the reference's version strip +
    ``_PAR_Y`` suffix handling (gencode_gene_adapter.py:95-102).
    """
    empty = pd.DataFrame(
        columns=["chr", "type", "start", "end", "strand", *attr_keys]
    )
    lines = df["text"]
    lines = lines[~lines.str.startswith("#")]
    if lines.empty:
        return empty
    parts = lines.str.split("\t", n=8, expand=True)
    if 8 not in parts.columns:
        return empty
    parts = parts[parts[8].notna()]
    if parts.empty:
        return empty
    out = pd.DataFrame(
        {
            "chr": parts[0],
            "type": parts[2],
            "start": pd.to_numeric(parts[3], errors="coerce"),
            "end": pd.to_numeric(parts[4], errors="coerce"),
            "strand": parts[6],
        }
    )
    for key in attr_keys:
        out[key] = parts[8].str.extract(rf'{key} "([^"]*)"', expand=False)
    out = out[out["start"].notna() & out["end"].notna()]
    out["start"] = out["start"].astype("int64")
    out["end"] = out["end"].astype("int64")
    if type_filter is not None:
        out = out[out["type"] == type_filter]
    if "gene_id" in out.columns:
        gid = out["gene_id"].fillna("")
        par = gid.str.endswith("_PAR_Y")
        base = gid.str.split(".", n=1).str[0]
        out["gene_id"] = np.where(par, base + "_PAR_Y", base)
    return out.reset_index(drop=True)


def parse_vcf_batch(
    df: pd.DataFrame, info_keys: tuple[str, ...] = ()
) -> pd.DataFrame:
    """VCF lines -> typed frame; ``chr`` normalized with the reference's
    ``'chr' +`` prefix (dbsnp_adapter.py:55); INFO ``k=v`` pairs for
    ``info_keys`` extracted (comma values kept as strings)."""
    empty = pd.DataFrame(columns=["chr", "pos", "id", "ref", "alt", *info_keys])
    lines = df["text"]
    lines = lines[~lines.str.startswith("#")]
    if lines.empty:
        return empty
    parts = lines.str.split("\t", n=7, expand=True)
    if 4 not in parts.columns:
        return empty
    parts = parts[parts[4].notna()]
    if parts.empty:
        return empty
    out = pd.DataFrame(
        {
            "chr": "chr" + parts[0].astype(str).str.removeprefix("chr"),
            "pos": pd.to_numeric(parts[1], errors="coerce"),
            "id": parts[2],
            "ref": parts[3],
            "alt": parts[4],
        }
    )
    info = parts[7] if 7 in parts.columns else pd.Series("", index=parts.index)
    for key in info_keys:
        out[key] = info.str.extract(
            rf"(?:^|;){key}=([^;]*)", expand=False
        )
    out = out[out["pos"].notna()]
    out["pos"] = out["pos"].astype("int64")
    return out.reset_index(drop=True)


def parse_bed_batch(
    df: pd.DataFrame,
    names: tuple[str, ...] = ("chr", "start", "end", "name"),
    one_based: bool = True,
    sep: str | None = None,
) -> pd.DataFrame:
    """BED-like whitespace/tab rows; optional 0->1-based ``+1`` shift
    of ``start``/``end`` (epd_adapter.py:39-40)."""
    lines = df["text"]
    lines = lines[~lines.str.startswith(("#", "track", "browser"))]
    parts = lines.str.split(sep, expand=True)
    if parts.empty or parts.shape[1] < len(names):
        return pd.DataFrame(columns=list(names))
    out = parts.iloc[:, : len(names)].set_axis(list(names), axis=1)
    for c in ("start", "end"):
        if c in out.columns:
            out[c] = pd.to_numeric(out[c], errors="coerce")
    out = out[out.get("start").notna() & out.get("end").notna()]
    out["start"] = out["start"].astype("int64")
    out["end"] = out["end"].astype("int64")
    if one_based:
        out["start"] += 1
        out["end"] += 1
    return out.reset_index(drop=True)


def read_gtf(path: str, type_filter: str | None = None,
             attr_keys: tuple[str, ...] = ("gene_id", "gene_name")) -> ray.data.Dataset:
    return read_lines(path).map_batches(
        lambda df: parse_gtf_batch(df, type_filter, attr_keys),
        batch_format="pandas",
    )


def read_vcf(path: str, info_keys: tuple[str, ...] = ()) -> ray.data.Dataset:
    return read_lines(path).map_batches(
        lambda df: parse_vcf_batch(df, info_keys), batch_format="pandas"
    )


def read_bed(path: str, names=("chr", "start", "end", "name"),
             one_based: bool = True) -> ray.data.Dataset:
    return read_lines(path).map_batches(
        lambda df: parse_bed_batch(df, names, one_based),
        batch_format="pandas",
    )
