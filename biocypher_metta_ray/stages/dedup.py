"""Deduplication operators over document tables.

Large-scale training-data-pipeline operators (first-class per the build
brief, alongside the reference-derived inventory):

- :func:`exact_dedup` — content-hash partition + per-group min-id
  winner. The shuffle key is the 64-bit content hash, so only (hash,
  id) pairs move, never the payload.
- :class:`MinHasher` + :func:`minhash_lsh_candidates` /
  :func:`minhash_dedup` — shingle -> minhash -> banded LSH buckets ->
  candidate pairs -> exact-verify -> connected components (min-label
  propagation, same kernel as canonicalization).
- :class:`SimHasher` + :func:`simhash_dedup` — 64-bit simhash; docs
  whose simhash matches on enough bit-bands become candidates.
- :func:`ngram_jaccard` — exact n-gram Jaccard verification for a
  candidate-pair dataset.

All per-batch kernels vectorize the hashing with numpy (multiply-shift
hash families over token ids); stateful vocab/permutation tables are
built once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.helpers import hash64_column

_M61 = np.uint64((1 << 61) - 1)


def _token_hashes(texts: list[str], n_shingle: int) -> list[np.ndarray]:
    """Per-doc array of shingle hashes (uint64). Tokens are whitespace
    words; shingles are n-grams of tokens hashed with md5 (stable)."""
    out = []
    for t in texts:
        toks = t.split()
        if len(toks) < n_shingle:
            shingles = [" ".join(toks)] if toks else []
        else:
            shingles = [
                " ".join(toks[i:i + n_shingle])
                for i in range(len(toks) - n_shingle + 1)
            ]
        arr = np.empty(len(shingles), dtype=np.uint64)
        for i, s in enumerate(shingles):
            arr[i] = int.from_bytes(
                hashlib.md5(s.encode("utf-8")).digest()[:8], "big"
            )
        out.append(arr)
    return out


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    h = hash64_column(batch[text_col])
    return batch.append_column(out_col, pa.array(h.astype(np.int64)))


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the min-id row per distinct text. Hash-partition on the
    content hash; groups verify text equality (hash collisions) before
    electing the winner."""
    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col), batch_format="pyarrow"
    )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, dedup by exact text, winner = min id
        return (
            g.sort_values(id_col)
            .drop_duplicates(subset=[text_col], keep="first")
            .drop(columns=["content_hash"])
        )

    return hashed.groupby("content_hash").map_groups(
        keep_first, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Per-doc minhash signature + banded LSH bucket rows.

    Emits one row per (doc, band): (doc_id, band, band_hash). A
    groupby((band, band_hash)) downstream yields candidate groups.
    num_perms minhash permutations via the multiply-shift family
    h_i(x) = (a_i * x + b_i) mod 2^61-1 with seeded odd constants.
    """

    def __init__(self, num_perms: int = 64, num_bands: int = 16,
                 n_shingle: int = 3, seed: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perms % num_bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perms, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _M61, size=num_perms, dtype=np.uint64)
        self.num_perms = num_perms
        self.num_bands = num_bands
        self.rows_per_band = num_perms // num_bands
        self.n_shingle = n_shingle
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.num_perms, _M61, dtype=np.uint64)
        # (P, S) = (a[:,None] * x[None,:] + b[:,None]) mod M61  — vectorized
        x = shingle_hashes[None, :]
        vals = (self.a[:, None] * x + self.b[:, None]) % _M61
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        per_doc = _token_hashes(texts, self.n_shingle)
        out_id, out_band, out_bh = [], [], []
        for did, sh in zip(ids, per_doc):
            sig = self.signature(sh)
            for band in range(self.num_bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.md5(chunk.tobytes()).digest()[:8], "big"
                ) & 0x7FFFFFFFFFFFFFFF
                out_id.append(did)
                out_band.append(band)
                out_bh.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bh, pa.int64()),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    num_perms: int = 64,
    num_bands: int = 16,
    n_shingle: int = 3,
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """documents -> candidate near-dup pairs (doc_a < doc_b), distinct."""
    bands = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perms": num_perms,
            "num_bands": num_bands,
            "n_shingle": n_shingle,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = bands.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # distinct pairs (pairs can fire in multiple bands)
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def verify_jaccard(
    candidates: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    n_shingle: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Exact n-gram Jaccard verification of candidate pairs.

    The doc texts for verification come from a broadcast id->text map:
    candidate sets are tiny relative to the corpus (LSH prunes), and
    only candidate docs are shipped. For huge candidate sets switch to
    a bucketed join on doc id.
    """
    import ray

    # restrict the broadcast map to candidate doc ids (semi-join)
    cand_df = candidates.to_pandas()
    needed = set(cand_df["doc_a"]) | set(cand_df["doc_b"])

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_col], value_set=pa.array(sorted(needed)))
        return batch.filter(mask)

    texts_df = (
        docs.map_batches(filt, batch_format="pyarrow")
        .select_columns([id_col, text_col])
        .to_pandas()
    )
    text_map_ref = ray.put(dict(zip(texts_df[id_col], texts_df[text_col])))

    class Verify:
        def __init__(self):
            self.texts = ray.get(text_map_ref)
            self.n = n_shingle

        def _shingles(self, t: str) -> set:
            toks = t.split()
            if len(toks) < self.n:
                return {" ".join(toks)} if toks else set()
            return {
                " ".join(toks[i:i + self.n])
                for i in range(len(toks) - self.n + 1)
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_ids = batch["doc_a"].to_pylist()
            b_ids = batch["doc_b"].to_pylist()
            sims = []
            for a, b in zip(a_ids, b_ids):
                sa, sb = self._shingles(self.texts[a]), self._shingles(self.texts[b])
                inter = len(sa & sb)
                union = len(sa | sb)
                sims.append(inter / union if union else 0.0)
            out = batch.append_column("jaccard", pa.array(sims, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return candidates.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 2))


def minhash_dedup(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    num_perms: int = 64,
    num_bands: int = 16,
    n_shingle: int = 3,
) -> ray.data.Dataset:
    """Full near-dup pipeline -> verified duplicate pairs (doc_a < doc_b,
    jaccard >= threshold)."""
    cand = minhash_lsh_candidates(
        docs, num_perms=num_perms, num_bands=num_bands, n_shingle=n_shingle
    )
    return verify_jaccard(cand, docs, threshold=threshold, n_shingle=n_shingle)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over token hashes; emits (doc_id, simhash, band rows).

    Bands: the 64-bit fingerprint split into ``num_bands`` chunks —
    near-dups (Hamming distance <= num_bands - matching requirement)
    collide on at least one band (pigeonhole).
    """

    def __init__(self, num_bands: int = 4, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.num_bands = num_bands
        self.bits_per_band = 64 // num_bands
        self.id_col = id_col
        self.text_col = text_col

    def fingerprint(self, token_hashes: np.ndarray) -> int:
        if len(token_hashes) == 0:
            return 0
        bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
        fp = 0
        for i in range(64):
            if score[i] > 0:
                fp |= (1 << i)
        return fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        per_doc = _token_hashes(texts, 1)  # unigram simhash
        out_id, out_fp, out_band, out_key = [], [], [], []
        mask = (1 << self.bits_per_band) - 1
        for did, th in zip(ids, per_doc):
            fp = self.fingerprint(th)
            for band in range(self.num_bands):
                key = (fp >> (band * self.bits_per_band)) & mask
                out_id.append(did)
                out_fp.append(fp - (1 << 63) if fp >= (1 << 63) else fp)  # signed
                out_band.append(band)
                out_key.append(key)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "simhash": pa.array(out_fp, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
            }
        )


def simhash_candidates(
    docs: ray.data.Dataset, num_bands: int = 4, max_hamming: int = 3,
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """Near-dup candidate pairs whose simhash Hamming distance <=
    max_hamming, found via band-key collisions."""
    bands = docs.map_batches(
        SimHasher,
        fn_constructor_kwargs={"num_bands": num_bands},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        fps = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        a, b, h = [], [], []
        for i in range(len(ids)):
            x = np.bitwise_xor(fps[i], fps[i + 1:])
            cnt = np.array([bin(int(v)).count("1") for v in x])
            ok = np.nonzero(cnt <= max_hamming)[0]
            for j in ok:
                a.append(ids[i])
                b.append(ids[i + 1 + j])
                h.append(int(cnt[j]))
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": h})

    cand = bands.groupby(["band", "band_key"]).map_groups(
        pairs, batch_format="pandas"
    )
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
