"""Similarity search over embedding columns (list<float>).

- :func:`knn_bruteforce` — exact top-k cosine against a broadcast query
  matrix: per-batch numpy matmul (the scale baseline; each task sees
  queries once via ``ray.put``), then a global top-k merge of the
  per-batch partial top-ks — only k rows per batch ever shuffle.
- :func:`embedding_dup_pairs` — near-duplicate detection: cosine >=
  threshold pairs via LSH bucketing (random-hyperplane signs) with an
  exact within-bucket verify; the all-pairs work is confined to
  buckets.

Embeddings are float32 in Arrow; all math is float64 so results match
the DuckDB (double) oracle to ~1e-12 relative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch) if len(batch) else 0
    return flat.reshape(len(batch), dim)


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    col: str = "embedding",
    exclude_id=None,
) -> pd.DataFrame:
    """Exact top-k cosine similarity to ``query_vec``.

    Returns a small pandas frame (vec_id, cos) sorted by (-cos, vec_id).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    class PartialTopK:
        def __init__(self):
            self.q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = _embedding_matrix(batch, col)
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            cos = (M @ self.q) / norms
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            if exclude_id is not None:
                keep = ids != exclude_id
                ids, cos = ids[keep], cos[keep]
            order = np.lexsort((ids, -cos))[:k]
            return pa.table(
                {
                    id_col: pa.array(ids[order]),
                    "cos": pa.array(np.round(cos[order], 6)),
                }
            )

    partials = ds.map_batches(PartialTopK, batch_format="pyarrow", concurrency=(1, 2))
    df = partials.to_pandas()  # tiny: k rows per block
    df = df.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency: int | tuple = (1, 2),
) -> ray.data.Dataset:
    """Pairs (id_a < id_b) with cosine >= threshold.

    Scale path: bucket by the sign pattern of ``num_planes`` random
    hyperplanes (similar vectors very likely share the bucket), verify
    exactly inside each bucket. For a guaranteed-exact variant at
    small scale pass ``num_planes=0`` (single bucket = all-pairs).
    """

    class Bucket:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = _embedding_matrix(batch, col)
            if num_planes == 0:
                keys = np.zeros(len(M), dtype=np.int64)
            else:
                if self.planes is None:
                    rng = np.random.default_rng(seed)
                    self.planes = rng.standard_normal((M.shape[1], num_planes))
                signs = (M @ self.planes) >= 0
                keys = signs @ (1 << np.arange(num_planes))
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            unit = M / norms[:, None]
            return pa.table(
                {
                    id_col: batch[id_col],
                    "bucket": pa.array(keys.astype(np.int64)),
                    "unit": pa.array(list(unit), pa.list_(pa.float64())),
                }
            )

    bucketed = ds.map_batches(Bucket, batch_format="pyarrow", concurrency=concurrency)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        U = np.stack(g["unit"].to_numpy())
        S = U @ U.T
        ii, jj = np.nonzero(np.triu(S >= threshold, k=1))
        return pd.DataFrame(
            {
                "id_a": ids[ii],
                "id_b": ids[jj],
                "cos": np.round(S[ii, jj], 6),
            }
        )

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")


def ivf_knn(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    num_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pd.DataFrame:
    """IVF-style approximate top-k: sample-KMeans-lite centroids
    (one Lloyd iteration over a driver-side sample — deterministic),
    assign each vector to its nearest centroid inside ``map_batches``,
    then search only the ``n_probe`` centroids nearest the query.

    Scale notes: assignment is embarrassingly parallel; the probed
    partitions are the only rows scanned at query time. At cluster
    scale the assignment would be written once as a partitioned Parquet
    layout and reused across queries.
    """
    sample = ds.limit(max(num_centroids * 20, 256)).to_pandas()
    X = np.stack(sample[col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(num_centroids, len(X)), replace=False)]
    # one Lloyd refinement
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assign = d.argmin(1)
    for c in range(len(cents)):
        pts = X[assign == c]
        if len(pts):
            cents[c] = pts.mean(0)
    cents_ref = ray.put(cents)

    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((cents - q[None, :]) ** 2).sum(-1)
    probe = set(np.argsort(qd)[:n_probe].tolist())

    class Assign:
        def __init__(self):
            self.c = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) else cents_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = _embedding_matrix(batch, col)
            d = ((M[:, None, :] - self.c[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            keep = np.isin(a, list(probe))
            return batch.filter(pa.array(keep))

    probed = ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 2))
    return knn_bruteforce(probed, q, k=k, id_col=id_col, col=col)
