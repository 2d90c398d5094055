"""Sequence packing: concatenate the corpus in doc_id order and cut
it into fixed-length training rows (the concat-and-chunk packing a
causal-LM data loader consumes; tail row may be short).

The hard part at scale is the GLOBAL token offset of every document —
a prefix sum over 10^12 rows, which can neither be driver-side (the
per-doc count table is corpus-sized) nor a single sort. The shape
here is the classic two-level scan:

1. per-doc token counts, bucketed by ``doc_id // bucket_width``
   (packing order is doc_id order, so buckets are contiguous RANGES —
   this is the one operator family that needs range partitioning, not
   hash; document rows only carry two ints into this step);
2. per-bucket totals -> a tiny exclusive cumsum over bucket ids (one
   row per bucket — thousands, not trillions) broadcast via
   ``ray.put``;
3. within each bucket (hash-partitioned by bucket id, every doc of a
   bucket co-located): sort by doc_id, local exclusive cumsum + the
   bucket's offset = exact global offset, then explode tokens with
   their global index;
4. one groupby(seq_no = gidx // seq_len) reassembly, sorted by gidx.

Result is BY CONSTRUCTION independent of block layout and
parallelism (offsets derive from doc_id order alone) — asserted by
the partitioning-invariance test. Deterministic SQL mirror: a window
``sum() OVER (ORDER BY doc_id)`` prefix sum (oracle
``pack_sequences``).

No counterpart in the reference (its writers emit per-adapter files,
biocypher_metta/__init__.py write loop); packing is what a training
pipeline does AFTER the reference's output, and is first-class here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def pack_sequences(
    ds: ray.data.Dataset,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 1 << 20,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """(seq_no, text, n_tokens): the corpus concatenated in ``id_col``
    order and cut every ``seq_len`` whitespace tokens. ``bucket_width``
    sizes the range buckets of the two-level prefix sum — tune so
    bucket count stays driver-friendly (ids/2^20 at web scale) while
    single buckets fit a worker."""
    from .skew import partitioned_group_map

    bw = np.int64(bucket_width)

    # 1-2: bucket totals -> exclusive bucket offsets (tiny), broadcast
    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n = df[text_col].str.split(" ").str.len().to_numpy(np.int64)
        return pd.DataFrame(
            {"bucket": df[id_col].to_numpy(np.int64) // bw, "n": n}
        )

    from ray.data.aggregate import Sum

    totals = (
        ds.map_batches(counts, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    csum = np.concatenate(
        [[0], np.cumsum(totals["n"].to_numpy(np.int64))[:-1]]
    )
    offsets_ref = ray.put(
        dict(zip(totals["bucket"].to_numpy(np.int64).tolist(), csum.tolist()))
    )

    # 3: within-bucket scan -> token rows with exact global index
    def explode_with_gidx(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        out = []
        for bucket, b in g.groupby(g[id_col].to_numpy(np.int64) // bw):
            b = b.sort_values(id_col, kind="mergesort")
            words = b[text_col].str.split(" ")
            n = words.str.len().to_numpy(np.int64)
            doc_off = offs[int(bucket)] + np.concatenate(
                [[0], np.cumsum(n)[:-1]]
            )
            gidx = np.repeat(doc_off, n) + np.concatenate(
                [np.arange(k, dtype=np.int64) for k in n]
            )
            out.append(
                pd.DataFrame(
                    {
                        "gidx": gidx,
                        "tok": np.concatenate(
                            [np.asarray(w, dtype=object) for w in words]
                        ),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    bucketed = ds.map_batches(
        lambda df: df.assign(
            __bucket=df[id_col].to_numpy(np.int64) // bw
        ),
        batch_format="pandas",
    )
    toks = partitioned_group_map(
        bucketed, ["__bucket"], explode_with_gidx, num_partitions
    ).map_batches(
        lambda df: df.assign(seq_no=df["gidx"].to_numpy(np.int64) // seq_len),
        batch_format="pandas",
    )

    # 4: reassemble sequences
    def join_seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["seq_no", "gidx"], kind="mergesort")
        gb = g.groupby("seq_no", sort=False)["tok"]
        return pd.DataFrame(
            {
                "seq_no": gb.agg("count").index.to_numpy(np.int64),
                "text": gb.agg(" ".join).to_numpy(),
                "n_tokens": gb.agg("count").to_numpy(np.int64),
            }
        )

    return partitioned_group_map(toks, ["seq_no"], join_seq, num_partitions)
