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
   bucket's offset = exact global offset, then emit one FRAGMENT row
   per (doc x sequence) intersection — a doc usually overlaps 1-2
   sequences, so the shuffle moves ~|docs| rows, never |tokens| rows
   (an earlier draft exploded per token: 100x the volume at web
   scale for identical output);
4. one groupby(seq_no) reassembly, fragments ordered by their global
   start offset.

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

    from .relational import grouped_agg

    # grouped_agg combines map-side (one row per bucket per batch, not
    # one per DOC) and finishes size-adaptively — the raw native
    # aggregate here was the same per-row-partials sort cliff that
    # cost token_doc_freq 25 minutes at the 40M-doc rehearsal
    totals = (
        grouped_agg(
            ds.map_batches(counts, batch_format="pandas"),
            ["bucket"], sums=["n"],
        )
        .to_pandas()
        .sort_values("bucket")
    )
    csum = np.concatenate(
        [[0], np.cumsum(totals["n"].to_numpy(np.int64))[:-1]]
    )
    offsets_ref = ray.put(
        dict(zip(totals["bucket"].to_numpy(np.int64).tolist(), csum.tolist()))
    )

    # 3: within-bucket scan -> one fragment row per (doc, sequence)
    # intersection, with the fragment's global start offset. All
    # boundary arithmetic is vectorized; the only per-fragment Python
    # work is the string join, and fragments ~ docs (not tokens).
    import itertools

    def fragments(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        out = []
        for bucket, b in g.groupby(g[id_col].to_numpy(np.int64) // bw):
            b = b.sort_values(id_col, kind="mergesort")
            words = b[text_col].str.split(" ")
            n = words.str.len().to_numpy(np.int64)
            doc_off = offs[int(bucket)] + np.concatenate(
                [[0], np.cumsum(n)[:-1]]
            )
            flat = list(itertools.chain.from_iterable(words))
            flat_start = np.concatenate([[0], np.cumsum(n)[:-1]])
            q0 = doc_off // seq_len
            q1 = (doc_off + n - 1) // seq_len
            f = (q1 - q0 + 1).astype(np.int64)
            didx = np.repeat(np.arange(len(b), dtype=np.int64), f)
            first = np.concatenate([[0], np.cumsum(f)[:-1]])
            ford = np.arange(int(f.sum()), dtype=np.int64) - np.repeat(
                first, f
            )
            q = q0[didx] + ford
            a = np.maximum(0, q * seq_len - doc_off[didx])
            e = np.minimum(n[didx], (q + 1) * seq_len - doc_off[didx])
            fs = flat_start[didx]
            texts = [
                " ".join(flat[s0 + s1 : s0 + s2])
                for s0, s1, s2 in zip(fs.tolist(), a.tolist(), e.tolist())
            ]
            out.append(
                pd.DataFrame(
                    {
                        "seq_no": q,
                        "fs": doc_off[didx] + a,
                        "frag": texts,
                        "nf": e - a,
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
    frags = partitioned_group_map(
        bucketed, ["__bucket"], fragments, num_partitions
    )

    # 4: reassemble sequences from their ordered fragments
    def join_seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["seq_no", "fs"], kind="mergesort")
        gb = g.groupby("seq_no", sort=False)
        return pd.DataFrame(
            {
                "seq_no": gb["nf"].sum().index.to_numpy(np.int64),
                "text": gb["frag"].agg(" ".join).to_numpy(),
                "n_tokens": gb["nf"].sum().to_numpy(np.int64),
            }
        )

    return partitioned_group_map(frags, ["seq_no"], join_seq, num_partitions)
