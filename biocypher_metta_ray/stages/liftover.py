"""Coordinate liftover as a stateful actor-pool stage.

Mirrors the reference's hg19->hg38 per-row liftover with a cached
lifter (/root/reference/biocypher_metta/adapters/helpers.py:145-175,
module-global ``_lifters`` cache; used per-row at
dbsuper_adapter.py:48-49 with drop-on-failed-lift at :51-52).

The real UCSC chain files are external data, so the chain table here
is an injected mapping — tests and fixtures use
:func:`synthetic_chain` (deterministic per-chromosome piecewise
offsets, including unmapped gaps to exercise the drop path). The actor
builds interval arrays once in ``__init__`` and lifts whole batches
with ``np.searchsorted`` — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .pool import autoscale_pool


def synthetic_chain(seed: int = 42, n_chroms: int = 5, segments: int = 8):
    """Deterministic chain map: per chromosome, ``segments`` intervals
    of 1 Mb with distinct offsets; every 4th interval is an unmapped
    gap (lift fails -> row dropped)."""
    rng = np.random.default_rng(seed)
    chain = {}
    for c in range(1, n_chroms + 1):
        starts = np.arange(segments, dtype=np.int64) * 1_000_000
        offsets = rng.integers(-5000, 5000, size=segments).astype(np.int64)
        mapped = np.ones(segments, dtype=bool)
        mapped[3::4] = False
        chain[f"chr{c}"] = (starts, offsets, mapped)
    return chain


class Liftover:
    """Actor-pool stage: (chr, pos) -> lifted pos; unmapped rows are
    dropped and counted (reference drop-on-miss semantics)."""

    def __init__(self, chain=None, chr_col: str = "chr", pos_col: str = "pos",
                 out_col: str = "pos_lifted"):
        self.chain = chain if chain is not None else synthetic_chain()
        self.chr_col, self.pos_col, self.out_col = chr_col, pos_col, out_col
        self.dropped = 0

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for chrom, sub in df.groupby(self.chr_col, sort=False):
            entry = self.chain.get(chrom)
            if entry is None:
                self.dropped += len(sub)
                continue
            starts, offsets, mapped = entry
            pos = sub[self.pos_col].to_numpy(dtype=np.int64)
            seg = np.searchsorted(starts, pos, side="right") - 1
            ok = (seg >= 0) & (seg < len(starts)) & mapped[np.clip(seg, 0, len(starts) - 1)]
            self.dropped += int((~ok).sum())
            sub = sub[ok].copy()
            sub[self.out_col] = pos[ok] + offsets[seg[ok]]
            out.append(sub)
        if not out:
            res = df.head(0).copy()
            res[self.out_col] = pd.Series([], dtype="int64")
            return res
        return pd.concat(out, ignore_index=True)


def liftover(
    ds: ray.data.Dataset,
    chain=None,
    concurrency: int | tuple | None = None,
    **cols,
) -> ray.data.Dataset:
    return ds.map_batches(
        Liftover,
        fn_constructor_kwargs={"chain": chain, **cols},
        batch_format="pandas",
        concurrency=autoscale_pool(concurrency),
    )
