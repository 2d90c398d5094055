"""Similarity search over embedding columns (list<float>).

- :func:`knn_bruteforce` — exact top-k cosine against a broadcast query
  matrix: per-batch numpy matmul (the scale baseline; each task sees
  queries once via ``ray.put``), then a global top-k merge of the
  per-batch partial top-ks — only k rows per batch ever shuffle.
- :func:`embedding_dup_pairs` — near-duplicate detection: cosine >=
  threshold pairs via banded multi-table hyperplane LSH (id-only
  candidate rows, bounded-partition collision pass) with an exact
  verify through the two-pass pair join (stages/joins.py) against
  packed unit vectors — no payload ever rides the candidate shuffle.
- :func:`ivf_knn` — IVF-style probe: seeded sample centroids + one
  Lloyd step, per-batch cell assignment, probe-filtered brute force.

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

    def partial_topk(batch: pa.Table) -> pa.Table:
        # stateless task kernel: the broadcast query lives in the object
        # store once (ray.put above); ray.get per batch is a zero-copy
        # plasma read of KB-scale state, so no actor pool — the stage
        # fans out to however many tasks the cluster can run
        qv = ray.get(q_ref)
        M = _embedding_matrix(batch, col)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        cos = (M @ qv) / norms
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

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    df = partials.to_pandas()  # tiny: k rows per block
    df = df.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def knn_bruteforce_multi(
    ds: ray.data.Dataset,
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    col: str = "embedding",
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact top-k cosine for a BATCH of queries: the whole query
    matrix broadcasts once (``ray.put``), every data batch computes one
    ``M @ Q.T`` matmul against all queries simultaneously, and only
    k rows PER QUERY per batch travel to the driver merge — the
    many-query shape a retrieval/labeling pipeline actually runs
    (per-query calls re-scan the corpus Q times; this scans once).

    Returns (query_id, vec_id, cos) with k rows per query, sorted by
    (query_id, -cos, vec_id).
    """
    Q = np.asarray(query_matrix, dtype=np.float64)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put(qn)
    qids = (np.arange(len(Q)) if query_ids is None
            else np.asarray(query_ids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        # stateless task kernel (see knn_bruteforce): broadcast query
        # matrix read zero-copy from plasma per batch, no actor cap
        qm = ray.get(q_ref)
        M = _embedding_matrix(batch, col)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        cos = (M @ qm.T) / norms[:, None]  # (rows, n_queries)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        out_q, out_id, out_cos = [], [], []
        for j in range(cos.shape[1]):
            order = np.lexsort((ids, -cos[:, j]))[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_id.append(ids[order])
            out_cos.append(cos[order, j])
        return pa.table(
            {
                "__q": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "cos": pa.array(
                    np.round(np.concatenate(out_cos), 6)
                ),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    df = partials.to_pandas()  # tiny: k rows per (block, query)
    df = (
        df.sort_values(["__q", "cos", id_col],
                       ascending=[True, False, True])
        .groupby("__q", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    df["query_id"] = qids[df["__q"].to_numpy()]
    return df[["query_id", id_col, "cos"]]


def range_search(
    ds: ray.data.Dataset,
    query_matrix: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    col: str = "embedding",
    query_ids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """Cosine RANGE search (the radius/threshold sibling of top-k):
    every (query, vector) pair with cosine >= ``threshold``. Same
    broadcast shape as :func:`knn_bruteforce_multi` — one ``ray.put``
    of the normalized query matrix, one ``M @ Q.T`` matmul per batch —
    but the result STREAMS out as a Dataset (the hit count is
    data-dependent, potentially corpus-scale at a loose threshold, so
    no driver merge is allowed; top-k's k-per-block partials are).

    Returns ``(query_id, vec_id)``."""
    Q = np.asarray(query_matrix, dtype=np.float64)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put(qn)
    qids_arr = (np.arange(len(Q), dtype=np.int64) if query_ids is None
                else np.asarray(query_ids, dtype=np.int64))

    def hits(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        M = _embedding_matrix(batch, col)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        cos = (M @ qm.T) / norms[:, None]  # (rows, n_queries)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        r, q = np.nonzero(cos >= threshold)
        return pa.table(
            {
                "query_id": pa.array(qids_arr[q]),
                id_col: pa.array(ids[r].astype(np.int64)),
            }
        )

    return ds.map_batches(hits, batch_format="pyarrow")


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 1,
    seed: int = 11,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency: int | tuple | None = None,
    max_clique_bucket: int | None = None,
) -> ray.data.Dataset:
    """Pairs (id_a < id_b) with cosine >= threshold.

    ``max_clique_bucket``: hot-bucket cutoff for CC-bound consumers —
    buckets above it emit star edges to the bucket-min id instead of
    the full clique (O(k) candidate rows; exactness/recall statement
    in stages/dedup.py::_bucket_pairs). Default None = complete pair
    list.

    Scale path — banded multi-table hyperplane LSH:

    1. each of ``num_tables`` tables hashes a vector to the sign
       pattern of its own ``num_planes`` hyperplanes (seeded,
       deterministic); only (id, table, key) rows are emitted — the
       payload never rides the candidate shuffle;
    2. candidate pairs come from same-(table, key) collisions inside
       BOUNDED hash partitions (one vectorized self-merge per
       partition, never one Python call per bucket), then a global
       pair-distinct pass;
    3. exact verification joins the id-only pair list back to the
       unit vectors with the bounded-partition hash join and computes
       row-wise dots per partition.

    Recall: a pair at angle θ collides in one table with
    p = (1-θ/π)^num_planes; P(miss) = (1-p)^num_tables — size
    num_tables for the target threshold. Bucket sizes track TRUE
    near-dup cluster sizes (keys are similarity-driven, not a fixed
    global modulus), so within-bucket work is proportional to output
    size.

    ``num_planes=0`` is the guaranteed-exact small-scale variant
    (single bucket = all-pairs verify in one partition).

    Regime boundary: hyperplane LSH prunes only when the threshold
    angle is well below random (90°). At cos >= 0.9 (θ≈26°,
    p_plane≈0.86) a few tables separate cleanly; at cos 0.45 (θ≈63°,
    p_plane≈0.65 vs 0.5 for random pairs) NO table/plane budget
    separates — candidates approach all-pairs and the verify does the
    quadratic work. For such low thresholds use the exact variant (or
    a different family, e.g. IVF-bucketed dot products); the
    test-suite threshold of 0.45 exists because the synthetic
    embeddings top out near cos 0.51.
    """
    from .joins import pair_payload_join
    from .skew import partitioned_group_map

    class Bander:
        def __init__(self):
            self.planes = None  # (dim, num_tables*num_planes), lazy on dim

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = _embedding_matrix(batch, col)
            D = len(M)
            if num_planes == 0:
                return pa.table(
                    {
                        id_col: batch[id_col],
                        "table": pa.array(np.zeros(D, dtype=np.int32)),
                        "band_key": pa.array(np.zeros(D, dtype=np.int64)),
                    }
                )
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal(
                    (M.shape[1], num_tables * num_planes)
                )
            signs = (M @ self.planes) >= 0
            signs = signs.reshape(D, num_tables, num_planes)
            keys = signs @ (1 << np.arange(num_planes, dtype=np.int64))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    id_col: pa.array(np.repeat(ids, num_tables)),
                    "table": pa.array(
                        np.tile(np.arange(num_tables, dtype=np.int32), D)
                    ),
                    "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
                }
            )

    from .pool import autoscale_pool

    banded = ds.map_batches(Bander, batch_format="pyarrow",
                            concurrency=autoscale_pool(concurrency))

    from .dedup import _bucket_pairs

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        m = _bucket_pairs(g, ["table", "band_key"], id_col,
                          max_clique_bucket)
        if m.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return m.rename(columns={"doc_a": "id_a", "doc_b": "id_b"})

    cand = partitioned_group_map(
        banded, ["table", "band_key"], pairs_in_partition, 32, coalesce=64
    )
    # no global distinct pass: the pair join below collapses duplicate
    # pairs in its first partition pass

    def unit_vecs(batch: pa.Table) -> pa.Table:
        # packed float64 bytes: a FLAT binary column joins natively
        # (acero rejects list-typed non-key fields); unpacked zero-copy
        # with np.frombuffer in the verify kernel
        M = _embedding_matrix(batch, col)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        unit = M / norms[:, None]
        return pa.table(
            {
                id_col: batch[id_col],
                "unit": pa.array([row.tobytes() for row in unit],
                                 pa.binary()),
            }
        )

    # consumed by both passes of the pair join: materialize once
    # (packed units are 8*dim bytes/row)
    units = ds.map_batches(unit_vecs, batch_format="pyarrow").materialize()

    j2 = pair_payload_join(
        cand, units, key_a="id_a", key_b="id_b",
        id_col=id_col, payload_col="unit", num_partitions=16,
    )

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        A = np.vstack([
            np.frombuffer(b, dtype=np.float64)
            for b in batch["pay_a"].to_pylist()
        ])
        B = np.vstack([
            np.frombuffer(b, dtype=np.float64)
            for b in batch["pay_b"].to_pylist()
        ])
        cos = np.einsum("ij,ij->i", A, B)
        keep = pa.array(cos >= threshold)  # filter on the UNROUNDED value
        filtered = batch.select(["id_a", "id_b"]).filter(keep)
        return filtered.append_column(
            "cos", pa.array(np.round(cos[cos >= threshold], 6))
        )

    return j2.map_batches(verify, batch_format="pyarrow")



def _seeded_centroids(
    ds: ray.data.Dataset,
    num_centroids: int,
    seed: int,
    col: str,
) -> np.ndarray:
    """Deterministic IVF centroids: driver-side sample (first rows —
    stable for a fixed input), seeded choice, ONE Lloyd refinement.
    Shared by the in-memory probe (``ivf_knn``) and the materialized
    index (``build_ivf_index``) so the two can never desynchronize."""
    sample = ds.limit(max(num_centroids * 20, 256)).to_pandas()
    X = np.stack(sample[col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(num_centroids, len(X)),
                         replace=False)]
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assign = d.argmin(1)
    for c in range(len(cents)):
        pts = X[assign == c]
        if len(pts):
            cents[c] = pts.mean(0)
    return cents


def _cell_assigner(cents_ref, col: str):
    """Stateless map_batches kernel assigning each vector to its
    nearest centroid (appends an int64 ``cell`` column). The centroid
    matrix is KB-scale broadcast state — read zero-copy from plasma
    per batch, so the stage runs as an uncapped task pool."""

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref) if not isinstance(
            cents_ref, np.ndarray) else cents_ref
        M = _embedding_matrix(batch, col)
        dist = ((M[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return batch.append_column(
            "cell", pa.array(dist.argmin(1).astype(np.int64))
        )

    return assign


def build_ivf_index(
    ds: ray.data.Dataset,
    out_dir: str,
    num_centroids: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> dict:
    """Materialize the IVF layout: embeddings written ONCE as
    cell-partitioned Parquet (``cell=<c>/``) plus the centroid matrix
    in ``_centroids.json`` (underscore prefix: parquet dataset readers
    skip it). Queries then read ONLY the probed cells' files — the
    'prune at the read' scale path ``ivf_knn`` simulates in-memory.
    Centroids come from the SAME helper as ``ivf_knn``
    (:func:`_seeded_centroids`), so index and in-memory probe stay in
    lockstep. The whole index (parquet + metadata) stages in one tmp
    dir and swaps atomically — a killed rebuild leaves the previous
    index untouched."""
    import json as _json
    import os
    import shutil as _shutil
    import uuid as _uuid

    cents = _seeded_centroids(ds, num_centroids, seed, col)
    cents_ref = ray.put(cents)
    assigned = ds.map_batches(_cell_assigner(cents_ref, col),
                              batch_format="pyarrow")
    meta = {
        "centroids": cents.tolist(),
        "num_centroids": int(len(cents)),
        "id_col": id_col,
        "col": col,
    }
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(
        parent, f".{os.path.basename(out_dir)}.tmp-{_uuid.uuid4().hex[:8]}"
    )
    try:
        assigned.write_parquet(tmp, partition_cols=["cell"])
        with open(os.path.join(tmp, "_centroids.json"), "w") as f:
            _json.dump(meta, f)
        if os.path.isdir(out_dir):
            _shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
    except BaseException:
        _shutil.rmtree(tmp, ignore_errors=True)
        raise
    return meta


def ivf_index_search(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> pd.DataFrame:
    """Query the materialized IVF layout: pick the ``n_probe`` nearest
    cells from ``_centroids.json`` (underscore prefix: parquet dataset readers skip it) and read ONLY those partitions'
    Parquet files (every other cell's bytes never leave storage), then
    exact brute-force top-k inside the probed subset."""
    import json as _json
    import os

    with open(os.path.join(index_dir, "_centroids.json")) as f:
        meta = _json.load(f)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((cents - q[None, :]) ** 2).sum(-1)
    probe = np.argsort(qd)[:n_probe]
    import glob as _glob

    paths = []
    for c in probe:
        cell_dir = os.path.join(index_dir, f"cell={int(c)}")
        # expand to files: read_parquet accepts one directory but not a
        # LIST of directories
        paths.extend(sorted(_glob.glob(os.path.join(cell_dir, "*.parquet"))))
    if not paths:
        return pd.DataFrame({meta["id_col"]: [], "cos": []})
    ds = ray.data.read_parquet(paths)
    return knn_bruteforce(ds, q, k=k, id_col=meta["id_col"],
                          col=meta["col"])


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
    cents = _seeded_centroids(ds, num_centroids, seed, col)
    cents_ref = ray.put(cents)

    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((cents - q[None, :]) ** 2).sum(-1)
    probe = set(np.argsort(qd)[:n_probe].tolist())

    probe_list = sorted(probe)

    def assign_filter(batch: pa.Table) -> pa.Table:
        # stateless: centroid matrix read zero-copy from plasma
        c = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) else cents_ref
        M = _embedding_matrix(batch, col)
        d = ((M[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        keep = np.isin(a, probe_list)
        return batch.filter(pa.array(keep))

    probed = ds.map_batches(assign_filter, batch_format="pyarrow")
    return knn_bruteforce(probed, q, k=k, id_col=id_col, col=col)


def hard_negatives(
    ds: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    exclude_label: int,
    id_col: str = "vec_id",
    col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the
    single most-cosine-similar corpus vector whose label DIFFERS from
    the anchors' (the "hardest" negative — the standard pair-mining
    step for contrastive/metric training).

    Scale shape: the anchor set is the BOUNDED broadcast side (the
    knn_bruteforce_multi contract — the matrix rides ``ray.put``
    once); the corpus streams through one ``M @ Q.T`` matmul per
    batch with the label filter applied at the scan, and only one row
    per (block, anchor) reaches the driver merge. Anchors sharing one
    label means the label filter is a plain scan predicate; per-anchor
    labels would move the mask inside the kernel, same shape.
    """
    cand = ds.filter(expr=f"{label_col} != {exclude_label}")
    out = knn_bruteforce_multi(
        cand, query_matrix, k=1, id_col=id_col, col=col,
        query_ids=query_ids)
    return out.rename(columns={id_col: "neg_id"})


def knn_graph(
    ds: ray.data.Dataset,
    k: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
    num_partitions: int = 16,
    chunk_rows: int = 65536,
) -> ray.data.Dataset:
    """EXACT k-NN graph over an embedding table: every vector's top-k
    cosine neighbors, self excluded — the ANN-graph construction
    baseline (NN-descent seeding, graph-based index bootstrap,
    SemDedup-style diversification) and the recall oracle for the
    bucketed approximations (``ivf_knn``, ``embedding_dup_pairs``).

    Block-nested-loop shape (exact compute is inherently O(N^2)):
    the table is swept in QUERY CHUNKS of ``chunk_rows`` — each chunk
    is pulled to the driver once (bounded chunk x d memory),
    broadcast via ``ray.put``, and the corpus streams ONE matmul per
    batch emitting at most k rows per (query, block); the merge is
    the DISTRIBUTED per-group top-k (``relational.top_k_per_group``)
    — no driver-side candidate table, unlike the bounded-query-set
    ``knn_bruteforce_multi``. Corpus passes = ceil(N / chunk_rows);
    pick ``chunk_rows`` so chunk x d doubles fit plasma comfortably
    (the stated memory bound). Cosines stay UNROUNDED through the
    merge so ranking matches the SQL oracle's unrounded window order;
    the returned columns are ``(vec_id, nbr_id)`` only.
    """
    from .relational import top_k_per_group

    data = ds.materialize()  # streamed once per chunk below

    partials = []
    for q_tbl in data.select_columns([id_col, col]).iter_batches(
        batch_size=chunk_rows, batch_format="pyarrow"
    ):
        Q = _embedding_matrix(q_tbl, col)
        qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        qids = q_tbl[id_col].to_numpy(zero_copy_only=False).copy()
        q_ref = ray.put(qn)
        qid_ref = ray.put(qids)

        def partial_topk(batch: pa.Table, _qr=q_ref, _ir=qid_ref
                         ) -> pa.Table:
            qm = ray.get(_qr)
            qi = ray.get(_ir)
            M = _embedding_matrix(batch, col)
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            cos = (M @ qm.T) / norms[:, None]  # (rows, n_queries)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            # self-exclusion: a vector never neighbors itself
            cos[ids[:, None] == qi[None, :]] = -np.inf
            kk = min(k, len(ids))
            out_q, out_id, out_cos = [], [], []
            for j in range(cos.shape[1]):
                order = np.lexsort((ids, -cos[:, j]))[:kk]
                keep = np.isfinite(cos[order, j])
                order = order[keep]
                out_q.append(np.full(len(order), qi[j], dtype=np.int64))
                out_id.append(ids[order])
                out_cos.append(cos[order, j])
            return pa.table(
                {
                    id_col: pa.array(np.concatenate(out_q)),
                    "nbr_id": pa.array(np.concatenate(out_id)),
                    "cos": pa.array(np.concatenate(out_cos)),
                }
            )

        partials.append(
            data.map_batches(partial_topk, batch_format="pyarrow")
        )

    allp = partials[0]
    for p in partials[1:]:
        allp = allp.union(p)
    top = top_k_per_group(
        allp, [id_col], by="cos", k=k, tiebreak=["nbr_id"],
        num_partitions=num_partitions,
    )
    return top.map_batches(
        lambda df: df[[id_col, "nbr_id"]], batch_format="pandas"
    )
