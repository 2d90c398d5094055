"""Regulatory/variant long-tail extractors (the bespoke adapter family).

Each function mirrors one reference adapter's record semantics —
composite-key grammars, id-map joins, liftover, giant-index probes —
re-expressed as vectorized Ray Data stages:

- :func:`cadd_extractor` — cadd_adapter.py:37-66 (rsid->pos via the
  dbSNP index, window filter, float score props)
- :func:`roadmap_extractor` — roadmap_adapter.py:50-86 (keyed dir of
  csvs, rsid->(chr,pos) probe, tissue->ontology map, drop-on-miss)
- :func:`tadmap_extractor` — tadmap_adapter.py:43-79 (the ``|``/``;``
  mini-grammar for loc_info + per-TAD gene lists)
- :func:`hocomoco_extractor` — hocomoco_motif_adapter.py:40-77
  (PWM-per-file accumulation + model->TF->ensembl two-hop map)
- :func:`gtex_eqtl_extractor` — gtex_eqtl_adapter.py:57-95 (per-tissue
  egenes files, ``chr_pos_ref_alt_b38`` variant grammar, clamped
  floats)
- :func:`enhancer_atlas_extractor` — enhancer_atlas_adapter.py:47-105
  (0->1-based shift, ``chr:start-end_GENE$...`` compound key)
- :func:`peregrine_extractor` — peregrine_adapter.py:64-150 (three-file
  build-side flow: enhancers + sources + links, hgnc/tissue map
  drop-on-miss)
- :func:`topld_extractor` — topld_adapter.py:35-70 (pos->rsid BOTH
  endpoints, signed r2 = sign-char + R2, cutoff)
- :func:`dbsuper_extractor` — dbsuper_adapter.py:39-95 (hg19->hg38
  liftover of +1-shifted coords, tissue + hgnc maps)

Broadcast-map discipline: every small map (tissue->ontology,
hgnc->ensembl, model->tf) ships via ``ray.put`` once; the only big
state — the dbSNP rsid/pos index — goes through the
stages/rsid_index.py actor pools. All parse kernels are
pandas-vectorized ``str.split``/``str.extract``; error rows drop and
count (log-and-skip with accounting).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.helpers import build_region_id, in_window
from ..sources.bio_formats import first_lines_of, read_lines


def _get(ref):
    return ray.get(ref) if not isinstance(ref, (dict, type(None))) else ref


def _window_mask(df: pd.DataFrame, chrom, lo, hi, chr_col="chr",
                 s_col="start", e_col="end") -> pd.Series:
    """check_genomic_location semantics (helpers.py:118-142): None
    chrom selects everything; otherwise chr equality + window."""
    if chrom is None:
        return pd.Series(True, index=df.index)
    m = df[chr_col] == chrom
    w = in_window(df[s_col].to_numpy(np.int64), df[e_col].to_numpy(np.int64),
                  lo, hi)
    return m & pd.Series(w, index=df.index)


# ---------------------------------------------------------------------------
# CADD (rsid-index family)
# ---------------------------------------------------------------------------

def cadd_extractor(
    path: str,
    rsid_index: dict,
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """CADD csv (rsid,chr,pos,ref,alt,raw,phred) -> sequence_variant
    nodes; the POSITION comes from the dbSNP rsid index (the reference
    ignores the file's own position column, cadd_adapter.py:41-42),
    rsid misses drop with accounting."""
    from ..stages.rsid_index import resolve_rsids

    headers = frozenset(first_lines_of(path))

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"]
        lines = lines[~lines.isin(headers)]
        parts = lines.str.split(",", expand=True)
        if parts.shape[1] < 7:
            return pd.DataFrame(columns=["rsid", "file_chr", "ref", "alt",
                                         "raw_cadd_score", "phred_score"])
        out = pd.DataFrame(
            {
                "rsid": parts[0],
                "file_chr": parts[1],
                "ref": parts[3],
                "alt": parts[4],
                "raw_cadd_score": pd.to_numeric(parts[5], errors="coerce"),
                "phred_score": pd.to_numeric(parts[6], errors="coerce"),
            }
        )
        return out[out["raw_cadd_score"].notna()]

    rows = read_lines(path).map_batches(parse, batch_format="pandas")
    resolved = resolve_rsids(rows, rsid_index, rsid_col="rsid")

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        keep = _window_mask(
            df.assign(start=df["pos"], end=df["pos"]), chrom, start, end,
            chr_col="file_chr",
        )
        df = df[keep]
        props = [
            json.dumps(
                {
                    "chr": c, "start": int(p), "end": int(p), "rsid": r,
                    "ref": rf, "alt": al,
                    "raw_cadd_score": float(rs), "phred_score": float(ph),
                },
                sort_keys=True,
            )
            for c, p, r, rf, al, rs, ph in zip(
                df["file_chr"], df["pos"], df["rsid"], df["ref"],
                df["alt"], df["raw_cadd_score"], df["phred_score"],
            )
        ]
        return pd.DataFrame(
            {"id": df["rsid"], "label": "sequence_variant",
             "props_json": props}
        )

    return {"nodes": resolved.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


# ---------------------------------------------------------------------------
# ABC (rsid-index family, nodes + edges)
# ---------------------------------------------------------------------------

def abc_extractor(
    path: str,
    rsid_index: dict,
    hgnc_ensembl_map: dict,
    tissue_ontology_map: dict,
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """Activity-By-Contact csv -> regulatory_region nodes (rsid keyed,
    position from the dbSNP index) + regulatory_region_gene edges
    (target gene via the hgnc map, score kept as the raw string,
    abc_adapter.py:44-100). Rows whose rsid, tissue or gene miss their
    map drop with accounting. Deviation (documented): the reference's
    ``get_edges`` probes ``dbsnp_rsid_map[rsid]`` without ``["pos"]``
    (abc_adapter.py:76), so its window filter compares a dict — we
    filter on the indexed position as intended."""
    from ..stages.rsid_index import resolve_rsids

    he_ref = ray.put(hgnc_ensembl_map)
    tmap_ref = ray.put(tissue_ontology_map)
    headers = frozenset(first_lines_of(path))

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"]
        lines = lines[~lines.isin(headers)]
        parts = lines.str.split(",", expand=True)
        if parts.shape[1] < 28:
            return pd.DataFrame(columns=["rsid", "file_chr", "gene",
                                         "abc_score", "cell_type"])
        return pd.DataFrame(
            {
                "rsid": parts[0],
                "file_chr": parts[1],
                "gene": parts[10].str.strip(),
                "abc_score": parts[24],
                "cell_type": parts[27],
            }
        )

    rows = read_lines(path).map_batches(parse, batch_format="pandas")
    # nodes AND edges consume this lineage: materialize once so the
    # read + parse + index probe don't execute twice
    resolved = resolve_rsids(rows, rsid_index, rsid_col="rsid").materialize()

    def windowed(df: pd.DataFrame) -> pd.DataFrame:
        keep = _window_mask(
            df.assign(start=df["pos"], end=df["pos"]), chrom, start, end,
            chr_col="file_chr",
        )
        return df[keep]

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        tmap = _get(tmap_ref)
        df = windowed(df)
        ctx = df["cell_type"].map(tmap)
        ok = ctx.notna()
        if (~ok).any():
            from ..state.metrics import incr

            incr("abc", "tissue_misses", int((~ok).sum()))
        df = df[ok]
        props = [
            json.dumps(
                {
                    "chr": c, "start": int(p), "end": int(p),
                    "biochemical_activity": "DNase I hypersensitive",
                    "biological_context": b,
                },
                sort_keys=True,
            )
            for c, p, b in zip(df["file_chr"], df["pos"], ctx[df.index])
        ]
        return pd.DataFrame(
            {"id": df["rsid"], "label": "regulatory_region",
             "props_json": props}
        )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        he = _get(he_ref)
        tmap = _get(tmap_ref)
        df = windowed(df)
        gene = df["gene"].map(he)
        ctx = df["cell_type"].map(tmap)
        ok = gene.notna() & ctx.notna()
        if (~ok).any():
            from ..state.metrics import incr

            incr("abc", "edge_misses", int((~ok).sum()))
        df = df[ok]
        props = [
            json.dumps(
                {"score": s, "biological_context": b}, sort_keys=True
            )
            for s, b in zip(df["abc_score"], ctx[df.index])
        ]
        return pd.DataFrame(
            {"subj": df["rsid"], "pred": "regulatory_region_gene",
             "obj": gene[df.index], "props_json": props}
        )

    return {
        "nodes": resolved.map_batches(to_nodes, batch_format="pandas"),
        "edges": resolved.map_batches(to_edges, batch_format="pandas"),
    }


# ---------------------------------------------------------------------------
# Roadmap (rsid-index + tissue-map family, keyed dir)
# ---------------------------------------------------------------------------

def roadmap_extractor(
    dir_path: str,
    rsid_index: dict,
    tissue_ontology_map: dict,
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """Keyed dir of (rsid,dataset,cell,tissue,datatype) csvs ->
    regulatory_region nodes; rsid probe for (chr,pos), tissue ->
    ontology id with drop-on-miss (roadmap_adapter.py:50-86)."""
    from ..stages.rsid_index import resolve_rsids

    tmap_ref = ray.put(tissue_ontology_map)
    headers = frozenset(first_lines_of(dir_path))

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"]
        lines = lines[~lines.isin(headers)]
        parts = lines.str.split(",", expand=True)
        if parts.shape[1] < 5:
            return pd.DataFrame(columns=["rsid", "cell", "tissue",
                                         "datatype"])
        return pd.DataFrame(
            {
                "rsid": parts[0],
                "cell": parts[2].str.replace('"', "").str.replace("'", ""),
                "tissue": parts[3].str.replace('"', "").str.replace("'", ""),
                "datatype": parts[4].str.replace('"', ""),
            }
        )

    rows = read_lines(dir_path).map_batches(parse, batch_format="pandas")
    resolved = resolve_rsids(rows, rsid_index, rsid_col="rsid")

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        tmap = _get(tmap_ref)
        ctx = df["tissue"].map(tmap)
        ok = ctx.notna()
        if (~ok).any():
            from ..state.metrics import incr

            incr("roadmap", "tissue_misses", int((~ok).sum()))
        df = df[ok]
        keep = _window_mask(
            df.assign(start=df["pos"], end=df["pos"]), chrom, start, end,
        )
        df = df[keep]
        props = [
            json.dumps(
                {"cell": c, "biological_context": b,
                 "biochemical_activity": d},
                sort_keys=True,
            )
            for c, b, d in zip(df["cell"], ctx[df.index], df["datatype"])
        ]
        return pd.DataFrame(
            {"id": df["rsid"], "label": "regulatory_region",
             "props_json": props}
        )

    return {"nodes": resolved.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


# ---------------------------------------------------------------------------
# TADMap mini-grammar
# ---------------------------------------------------------------------------

def tadmap_extractor(
    path: str,
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """TADMap csv: loc_info 'chr|start|end', genes
    'x|gene:ENSG..|..;x|gene:ENSG..' -> tad nodes with a genes list
    (tadmap_adapter.py:43-79; malformed gene entries skip)."""
    headers = frozenset(first_lines_of(path))

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"].str.strip()
        lines = lines[~lines.isin(headers)]
        parts = lines.str.split(",", expand=True)
        if parts.shape[1] < 2:
            return pd.DataFrame(
                columns=["id", "label", "props_json"]
            )
        loc = parts[0].str.split("|", expand=True)
        if loc.shape[1] < 3:
            return pd.DataFrame(columns=["id", "label", "props_json"])
        out = pd.DataFrame(
            {
                "chr": loc[0],
                "start": pd.to_numeric(loc[1], errors="coerce"),
                "end": pd.to_numeric(loc[2], errors="coerce"),
                "genes_raw": parts[1].fillna(""),
            }
        )
        out = out[out["start"].notna() & out["end"].notna()]
        out["start"] = out["start"].astype("int64")
        out["end"] = out["end"].astype("int64")
        keep = _window_mask(out, chrom, start, end)
        out = out[keep]

        def genes_of(raw: str) -> list[str]:
            genes = []
            for g in raw.split(";"):
                try:
                    genes.append(g.split("|")[1].split(":")[1])
                except IndexError:
                    continue
            return genes

        rows = {
            "id": [
                build_region_id(c, s, e)
                for c, s, e in zip(out["chr"], out["start"], out["end"])
            ],
            "label": "tad",
            "props_json": [
                json.dumps(
                    {"chr": c, "start": int(s), "end": int(e),
                     "genes": genes_of(g)},
                    sort_keys=True,
                )
                for c, s, e, g in zip(out["chr"], out["start"], out["end"],
                                      out["genes_raw"])
            ],
        }
        return pd.DataFrame(rows)

    return {"nodes": read_lines(path).map_batches(parse, batch_format="pandas"),
            "edges": None}


# ---------------------------------------------------------------------------
# HOCOMOCO PWM-per-file
# ---------------------------------------------------------------------------

def hocomoco_extractor(
    dir_path: str,
    model_tf_map: dict,
    hgnc_ensembl_map: dict,
) -> dict:
    """Dir of ``<MODEL>.pwm`` files (one PWM matrix each, header line +
    4 tab columns A C G T) -> motif nodes keyed by the model's TF's
    ensembl id; models whose TF or ensembl mapping misses drop
    (hocomoco_motif_adapter.py:49-77). One file = one record, so files
    parse whole via read_binary_files (a per-LINE read would shred the
    matrix)."""
    mt_ref = ray.put(model_tf_map)
    he_ref = ray.put(hgnc_ensembl_map)
    files = ray.data.read_binary_files(dir_path, include_paths=True)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        import os

        mt = _get(mt_ref)
        he = _get(he_ref)
        rows = {"id": [], "label": [], "props_json": []}
        for path_, data in zip(df["path"], df["bytes"]):
            name = os.path.basename(str(path_))
            if not name.endswith(".pwm"):
                continue
            model = name[: -len(".pwm")]
            try:
                lines = bytes(data).decode("utf-8").strip().splitlines()[1:]
                mat = np.array(
                    [[float(x) for x in ln.split("\t")] for ln in lines],
                    dtype=np.float64,
                )
                if mat.ndim != 2 or mat.shape[1] < 4 or not len(mat):
                    raise ValueError("not a 4-column PWM matrix")
            except (ValueError, UnicodeDecodeError):
                from ..state.metrics import incr

                incr("hocomoco", "malformed_pwm", 1)
                continue
            tf = mt.get(model)
            eid = he.get(tf) if tf is not None else None
            if eid is None:
                from ..state.metrics import incr

                incr("hocomoco", "model_misses", 1)
                continue
            props = {
                "tf_name": tf,
                "pwm_A": mat[:, 0].tolist(),
                "pwm_C": mat[:, 1].tolist(),
                "pwm_G": mat[:, 2].tolist(),
                "pwm_T": mat[:, 3].tolist(),
                "length": int(mat.shape[0]),
            }
            rows["id"].append(eid)
            rows["label"].append("motif")
            rows["props_json"].append(json.dumps(props, sort_keys=True))
        return pd.DataFrame(rows)

    return {"nodes": files.map_batches(parse, batch_format="pandas"),
            "edges": None}


# ---------------------------------------------------------------------------
# GTEx eQTL per-tissue dirs
# ---------------------------------------------------------------------------

def gtex_eqtl_extractor(
    dir_path: str,
    tissue_ontology_map: dict,
    tissue_names: list[str] | None = None,
) -> dict:
    """Per-tissue ``<tissue>.v8.egenes.txt.gz`` files -> variant->gene
    edges. variant grammar col11 = ``chr_pos_ref_alt_b38`` (non-b38
    assemblies drop), source id col18, target gene col0 version-strip,
    floats via the exponent-clamped to_float
    (gtex_eqtl_adapter.py:57-95). The tissue comes from the FILE NAME,
    so parsing runs per file (read_binary_files)."""
    from ..functions.helpers import to_float

    tmap_ref = ray.put(tissue_ontology_map)
    files = ray.data.read_binary_files(dir_path, include_paths=True)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        import gzip as _gz
        import os

        tmap = _get(tmap_ref)
        frames = []
        for path_, data in zip(df["path"], df["bytes"]):
            name = os.path.basename(str(path_))
            if "egenes" not in name:
                continue
            tissue = name.split(".")[0]
            if tissue_names is not None and tissue not in tissue_names:
                continue
            if tissue not in tmap:
                from ..state.metrics import incr

                incr("gtex_eqtl", "tissue_misses", 1)
                continue
            raw = bytes(data)
            if raw[:2] == b"\x1f\x8b":
                raw = _gz.decompress(raw)
            lines = raw.decode("utf-8").splitlines()[1:]
            parts = pd.Series(lines).str.split("\t", expand=True)
            if parts.empty or parts.shape[1] < 29:
                continue
            var = parts[11].str.split("_", expand=True)
            if var.shape[1] < 5:
                continue
            sub = pd.DataFrame(
                {
                    "variant": parts[18],
                    "gene": parts[0].str.split(".").str[0],
                    "chr": var[0],
                    "pos": pd.to_numeric(var[1], errors="coerce"),
                    "assembly": var[4],
                    "maf": parts[21],
                    "slope": parts[24],
                    "p_value": parts[27],
                    "q_value": parts[28],
                }
            )
            n0 = len(sub)
            sub = sub[(sub["assembly"] == "b38") & sub["pos"].notna()]
            if n0 - len(sub):
                from ..state.metrics import incr

                incr("gtex_eqtl", "bad_variant_rows", n0 - len(sub))
            props = [
                json.dumps(
                    {
                        "maf": to_float(m), "slope": to_float(s),
                        "p_value": to_float(p), "q_value": to_float(q),
                        "biological_context": tmap[tissue],
                    },
                    sort_keys=True,
                )
                for m, s, p, q in zip(sub["maf"], sub["slope"],
                                      sub["p_value"], sub["q_value"])
            ]
            frames.append(
                pd.DataFrame(
                    {"subj": sub["variant"], "pred": "gtex_variant_gene",
                     "obj": sub["gene"], "props_json": props}
                )
            )
        if not frames:
            return pd.DataFrame(
                columns=["subj", "pred", "obj", "props_json"]
            )
        return pd.concat(frames, ignore_index=True)

    return {"nodes": None,
            "edges": files.map_batches(parse, batch_format="pandas")}


# ---------------------------------------------------------------------------
# EnhancerAtlas compound-key
# ---------------------------------------------------------------------------

def enhancer_atlas_extractor(
    enhancer_path: str,
    enhancer_gene_dir: str,
    tissue_ontology_map: dict,
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """Enhancer bed (0-based, +1 shift) -> enhancer nodes; per-tissue
    ``<tissue>_EP.txt`` files with the ``chr:start-end_GENE$...``
    compound key -> enhancer_gene edges with the tissue ontology id
    (enhancer_atlas_adapter.py:47-105)."""
    tmap_ref = ray.put(tissue_ontology_map)

    def parse_nodes(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["text"].str.strip().str.split("\t", expand=True)
        if parts.shape[1] < 3:
            return pd.DataFrame(columns=["id", "label", "props_json"])
        out = pd.DataFrame(
            {
                "chr": parts[0],
                "start": pd.to_numeric(parts[1], errors="coerce") + 1,
                "end": pd.to_numeric(parts[2], errors="coerce") + 1,
            }
        )
        out = out[out["start"].notna() & out["end"].notna()]
        out["start"] = out["start"].astype("int64")
        out["end"] = out["end"].astype("int64")
        out = out[_window_mask(out, chrom, start, end)]
        return pd.DataFrame(
            {
                "id": [build_region_id(c, s, e) for c, s, e in
                       zip(out["chr"], out["start"], out["end"])],
                "label": "enhancer",
                "props_json": [
                    json.dumps({"chr": c, "start": int(s), "end": int(e)},
                               sort_keys=True)
                    for c, s, e in zip(out["chr"], out["start"], out["end"])
                ],
            }
        )

    nodes = read_lines(enhancer_path).map_batches(
        parse_nodes, batch_format="pandas"
    )

    # per-tissue edges: tissue id = file name minus _EP.txt; files with
    # no ontology mapping are skipped entirely (reference behavior)
    files = ray.data.read_binary_files(enhancer_gene_dir, include_paths=True)

    def parse_edges(df: pd.DataFrame) -> pd.DataFrame:
        import os

        tmap = _get(tmap_ref)
        frames = []
        for path_, data in zip(df["path"], df["bytes"]):
            tissue = os.path.basename(str(path_)).replace("_EP.txt", "")
            ctx = tmap.get(tissue)
            if ctx is None:
                from ..state.metrics import incr

                incr("enhancer_atlas", "tissue_misses", 1)
                continue
            lines = bytes(data).decode("utf-8").strip().splitlines()
            parts = pd.Series(lines).str.split("\t", expand=True)
            if parts.empty or parts.shape[1] < 2:
                continue
            # compound key: chr:start-end_GENE$...  (0-based, +1)
            key = parts[0]
            enh = key.str.split("_").str[0]
            gene = key.str.split("_").str[1].str.split("$").str[0]
            chr_ = enh.str.split(":").str[0]
            coords = enh.str.split(":").str[1]
            s = pd.to_numeric(coords.str.split("-").str[0],
                              errors="coerce") + 1
            e = pd.to_numeric(coords.str.split("-").str[1],
                              errors="coerce") + 1
            score = pd.to_numeric(parts[1], errors="coerce")
            sub = pd.DataFrame(
                {"chr": chr_, "start": s, "end": e, "gene": gene,
                 "score": score}
            )
            sub = sub.dropna(subset=["start", "end", "gene", "score"])
            sub["start"] = sub["start"].astype("int64")
            sub["end"] = sub["end"].astype("int64")
            sub = sub[_window_mask(sub, chrom, start, end)]
            frames.append(
                pd.DataFrame(
                    {
                        "subj": [build_region_id(c, s_, e_) for c, s_, e_
                                 in zip(sub["chr"], sub["start"],
                                        sub["end"])],
                        "pred": "enhancer_gene",
                        "obj": sub["gene"],
                        "props_json": [
                            json.dumps(
                                {"biological_context": ctx,
                                 "score": float(sc)},
                                sort_keys=True,
                            )
                            for sc in sub["score"]
                        ],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(columns=["subj", "pred", "obj", "props_json"])
        return pd.concat(frames, ignore_index=True)

    return {"nodes": nodes,
            "edges": files.map_batches(parse_edges, batch_format="pandas")}


# ---------------------------------------------------------------------------
# PEREGRINE three-file build-side flow
# ---------------------------------------------------------------------------

def peregrine_extractor(
    enhancers_path: str,
    links_path: str,
    sources_path: str,
    hgnc_ensembl_map: dict,
    tissue_ontology_map: dict,
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """Enhancers (chr,start,end,id) + sources (id,source) + links
    (enhancer,gene,...,tissue,...,score) -> enhancer nodes + tissue-
    scoped enhancer_gene edges (peregrine_adapter.py:64-150).

    The enhancer and source tables are BUILD sides (dimension-scale):
    both load once into broadcast dicts; the links stream is the probe
    side and flows through map_batches with drop-on-miss on enhancer
    id, hgnc map and tissue map."""
    he_ref = ray.put(hgnc_ensembl_map)
    tmap_ref = ray.put(tissue_ontology_map)

    # build sides, read once on the driver (dimension-scale)
    enh = (
        read_lines(enhancers_path)
        .map_batches(
            lambda df: df["text"].str.strip().str.split("\t", expand=True)
            .set_axis(["chr", "start", "end", "id"], axis=1),
            batch_format="pandas",
        )
        .to_pandas()
    )
    enh["start"] = enh["start"].astype("int64")
    enh["end"] = enh["end"].astype("int64")
    enh = enh[_window_mask(enh, chrom, start, end)]
    enh["region_id"] = [
        build_region_id(c, s, e)
        for c, s, e in zip(enh["chr"], enh["start"], enh["end"])
    ]
    src = (
        read_lines(sources_path)
        .map_batches(
            lambda df: df["text"].str.strip().str.split("\t", expand=True)
            .set_axis(["id", "source"], axis=1),
            batch_format="pandas",
        )
        .to_pandas()
    )
    source_map = dict(zip(src["id"], src["source"]))
    id_region = dict(zip(enh["id"], enh["region_id"]))
    id_region_ref = ray.put(id_region)

    node_rows = pd.DataFrame(
        {
            "id": enh["region_id"],
            "label": "enhancer",
            "props_json": [
                json.dumps(
                    {"id": i, "chr": c, "start": int(s), "end": int(e),
                     "data_source": source_map.get(i)},
                    sort_keys=True,
                )
                for i, c, s, e in zip(enh["id"], enh["chr"], enh["start"],
                                      enh["end"])
            ],
        }
    )
    nodes = ray.data.from_pandas(node_rows)

    headers = frozenset(first_lines_of(links_path))

    def parse_links(df: pd.DataFrame) -> pd.DataFrame:
        he = _get(he_ref)
        tmap = _get(tmap_ref)
        idr = _get(id_region_ref)
        lines = df["text"].str.strip()
        lines = lines[~lines.isin(headers)]
        parts = lines.str.split("\t", expand=True)
        if parts.shape[1] < 5:
            return pd.DataFrame(columns=["subj", "pred", "obj", "props_json"])
        region = parts[0].map(idr)
        # gene grammar: 'x|hgnc=123|...' -> 'hgnc:123'
        gene_key = (
            parts[1].str.split("|").str[1].str.replace("=", ":", regex=False)
        )
        gene = gene_key.map(he)
        tissue = parts[4]
        ctx_ok = tissue.map(lambda t: t in tmap)
        score = parts[7] if 7 in parts.columns else pd.Series(
            None, index=parts.index
        )
        ok = region.notna() & gene.notna() & ctx_ok
        if (~ok).any():
            from ..state.metrics import incr

            incr("peregrine", "link_misses", int((~ok).sum()))
        sub = pd.DataFrame(
            {"subj": region[ok], "obj": gene[ok], "tissue": tissue[ok],
             "score": score[ok]}
        )
        tm = {t: tmap[t] for t in sub["tissue"].unique() if t in tmap}
        props = [
            json.dumps(
                {"biological_context": tm[t],
                 "score": (None if sc is None else str(sc))},
                sort_keys=True,
            )
            for t, sc in zip(sub["tissue"], sub["score"])
        ]
        return pd.DataFrame(
            {"subj": sub["subj"], "pred": "enhancer_gene",
             "obj": sub["obj"], "props_json": props}
        )

    edges = read_lines(links_path).map_batches(
        parse_links, batch_format="pandas"
    )
    return {"nodes": nodes, "edges": edges}


# ---------------------------------------------------------------------------
# TopLD pos->rsid both endpoints
# ---------------------------------------------------------------------------

def topld_extractor(
    path: str,
    pos_rsid_index: dict,
    chrom: str,
    ancestry: str = "SAS",
    cutoff: float = 0.8,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """TopLD csv (SNP1,SNP2,...,R2,Dprime,+/-corr...) -> in_ld_with
    edges; BOTH positions resolve via the pos->rsid index (drop if
    either misses), r2 = signed float from the corr sign char + R2,
    |r2| < cutoff drops (topld_adapter.py:35-70)."""
    from ..functions.helpers import to_float
    from ..stages.rsid_index import resolve_positions

    headers = frozenset(first_lines_of(path))

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"].str.strip()
        lines = lines[~lines.isin(headers)]
        parts = lines.str.split(",", expand=True)
        if parts.shape[1] < 5:
            return pd.DataFrame(
                columns=["pos1", "pos2", "r2", "d_prime"]
            )
        out = pd.DataFrame(
            {
                "pos1": pd.to_numeric(parts[0], errors="coerce"),
                "pos2": pd.to_numeric(parts[1], errors="coerce"),
                "sign": parts[4],
                "r2_raw": parts[2],
                "d_prime": pd.to_numeric(parts[3], errors="coerce"),
            }
        )
        out = out.dropna(subset=["pos1", "pos2", "d_prime"])
        out["pos1"] = out["pos1"].astype("int64")
        out["pos2"] = out["pos2"].astype("int64")
        keep = pd.Series(
            in_window(out["pos1"].to_numpy(), out["pos1"].to_numpy(),
                      start, end)
            & in_window(out["pos2"].to_numpy(), out["pos2"].to_numpy(),
                        start, end),
            index=out.index,
        )
        out = out[keep]
        out["r2"] = [
            to_float(f"{sg}{r}") for sg, r in zip(out["sign"], out["r2_raw"])
        ]
        out = out[np.abs(out["r2"]) >= cutoff]
        return out[["pos1", "pos2", "r2", "d_prime"]]

    rows = read_lines(path).map_batches(parse, batch_format="pandas")
    resolved = resolve_positions(
        rows, pos_rsid_index, chrom=chrom,
        pos_cols=("pos1", "pos2"), out_cols=("rsid1", "rsid2"),
    )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        props = [
            json.dumps(
                {"r2": float(r), "d_prime": float(d), "ancestry": ancestry},
                sort_keys=True,
            )
            for r, d in zip(df["r2"], df["d_prime"])
        ]
        return pd.DataFrame(
            {"subj": df["rsid1"], "pred": "in_ld_with",
             "obj": df["rsid2"], "props_json": props}
        )

    return {"nodes": None,
            "edges": resolved.map_batches(to_edges, batch_format="pandas")}


# ---------------------------------------------------------------------------
# dbSuper end-to-end liftover flow
# ---------------------------------------------------------------------------

def dbsuper_extractor(
    path: str,
    chain: dict,
    tissues_map: dict,
    hgnc_ensembl_map: dict,
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """dbSuper tsv (chr,start,end,se_id,gene,cell) -> super_enhancer
    nodes + enhancer_gene edges with hg19->hg38 liftover of the
    +1-shifted coordinates; failed lifts, unknown genes and unknown
    cells drop (dbsuper_adapter.py:39-95). The liftover is the
    stages/liftover.py actor stage (chain injected)."""
    from ..stages.liftover import Liftover

    tmap_ref = ray.put(tissues_map)
    he_ref = ray.put(hgnc_ensembl_map)
    chain_ref = ray.put(chain)
    headers = frozenset(first_lines_of(path))

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        lines = df["text"].str.strip()
        lines = lines[~lines.isin(headers)]
        parts = lines.str.split("\t", expand=True)
        if parts.shape[1] < 6:
            return pd.DataFrame(
                columns=["chr", "start_hg19", "end_hg19", "se_id", "gene",
                         "cell"]
            )
        out = pd.DataFrame(
            {
                "chr": parts[0],
                "start_hg19": pd.to_numeric(parts[1], errors="coerce") + 1,
                "end_hg19": pd.to_numeric(parts[2], errors="coerce") + 1,
                "se_id": parts[3],
                "gene": parts[4],
                "cell": parts[5],
            }
        )
        out = out.dropna(subset=["start_hg19", "end_hg19"])
        out["start_hg19"] = out["start_hg19"].astype("int64")
        out["end_hg19"] = out["end_hg19"].astype("int64")
        return out

    rows = read_lines(path).map_batches(parse, batch_format="pandas")

    class LiftBoth:
        """Lift start and end with one per-actor chain instance."""

        def __init__(self):
            ch = _get(chain_ref)
            self.lift_s = Liftover(ch, chr_col="chr", pos_col="start_hg19",
                                   out_col="start")
            self.lift_e = Liftover(ch, chr_col="chr", pos_col="end_hg19",
                                   out_col="end")

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = self.lift_s(df)
            df = self.lift_e(df)
            return df.drop(columns=["start_hg19", "end_hg19"])

    # nodes AND edges consume the lifted rows: materialize once
    from ..stages.pool import autoscale_pool

    lifted = rows.map_batches(
        LiftBoth, batch_format="pandas", concurrency=autoscale_pool()
    ).materialize()

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        df = df[_window_mask(df, chrom, start, end)]
        return pd.DataFrame(
            {
                "id": [build_region_id(c, s, e) for c, s, e in
                       zip(df["chr"], df["start"], df["end"])],
                "label": "super_enhancer",
                "props_json": [
                    json.dumps(
                        {"id": i, "chr": c, "start": int(s), "end": int(e)},
                        sort_keys=True,
                    )
                    for i, c, s, e in zip(df["se_id"], df["chr"],
                                          df["start"], df["end"])
                ],
            }
        )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        he = _get(he_ref)
        tmap = _get(tmap_ref)
        gene = df["gene"].map(he)
        ctx = df["cell"].map(tmap)
        ok = gene.notna() & ctx.notna()
        if (~ok).any():
            from ..state.metrics import incr

            incr("dbsuper", "edge_misses", int((~ok).sum()))
        df = df[ok]
        df = df[_window_mask(df, chrom, start, end)]
        return pd.DataFrame(
            {
                "subj": [build_region_id(c, s, e) for c, s, e in
                         zip(df["chr"], df["start"], df["end"])],
                "pred": "super_enhancer_gene",
                "obj": gene[df.index],
                "props_json": [
                    json.dumps({"biological_context": x}, sort_keys=True)
                    for x in ctx[df.index]
                ],
            }
        )

    return {
        "nodes": lifted.map_batches(to_nodes, batch_format="pandas"),
        "edges": lifted.map_batches(to_edges, batch_format="pandas"),
    }
