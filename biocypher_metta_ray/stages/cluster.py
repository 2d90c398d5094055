"""Distributed Lloyd's k-means over an embedding column.

Corpus-scale clustering is the backbone of embedding-based data
curation (SemDedup-style semantic dedup, cluster-balanced sampling,
IVF coarse quantizers — `stages/knn.py` currently samples its
centroids, this trains them). The reference has no notion of it
(its embeddings never exist; the KG ships to a downstream runtime,
/root/reference/metta_generator.py), but a 100 TB training-data
pipeline clusters every corpus it embeds.

Shape (the 100 TB contract — k-means is the textbook
broadcast-and-partial workload, NO shuffle at any step):

- centroids live in one ``ray.put`` object per sweep (k x d float64,
  KB-scale), read zero-copy by every task;
- each sweep is ONE streaming pass: a stateless ``map_batches`` task
  assigns its block (vectorized (B, k, d) distance kernel) and emits
  k partial rows — ``(cluster, count, sum-vector packed as bytes)``
  — so the driver reduce sees blocks x k rows, never the corpus;
- the driver update is O(k x d): sum/count per cluster, empty
  clusters keep their previous centroid (documented so the SQL
  oracle states the same rule);
- the final labeling pass streams ``(id, cluster)`` out without
  materializing anything corpus-sized.

Determinism: init centroids are the embeddings of the ``k`` smallest
ids (found via per-block bottom-k partials — k rows/block, driver
reduce), distances are full ``sum((x - c)^2)`` in float64 (same
per-dimension arithmetic as the SQL oracle), argmin ties break to the
lowest cluster index (numpy first-min == SQL ``ORDER BY dist, cid``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(B, d) float64 matrix from a list<float> column OR the Ray
    tensor extension type (``from_pandas`` of ndarray cells)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if hasattr(arr, "flatten"):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // len(batch) if len(batch) else 0
        X = flat.reshape(len(batch), d)
    else:  # ArrowTensorArray and friends
        X = np.asarray(arr.to_numpy(zero_copy_only=False))
        if X.dtype == object:
            X = np.stack(X) if len(X) else X.reshape(0, 0)
    return X.astype(np.float64, copy=False)


ASSIGN_BUDGET_BYTES = 256 << 20


def _assign(
    X: np.ndarray, cents: np.ndarray,
    budget_bytes: int = ASSIGN_BUDGET_BYTES,
) -> np.ndarray:
    """Nearest-centroid assignment with the exact per-dimension
    squared-difference sum the SQL oracle states (NOT the
    |x|^2 - 2xc trick, whose cancellation drifts), argmin ties to the
    lowest cluster index.

    Memory is bounded: the (B, k, d) difference tensor is never
    materialized whole — centroids are swept in chunks of ``c`` sized
    so the (B, c, d) slab stays under ``budget_bytes`` (at k=1024,
    d=768, B=4096 the full tensor is ~25 GB; chunked it is <= 256 MB).
    Each chunk's argmin picks its first (lowest-index) minimum and the
    cross-chunk merge only replaces on STRICTLY smaller distance, so
    the global tie-break — and every per-dimension float64 operation —
    is identical to the unchunked kernel."""
    n, d = X.shape
    k = len(cents)
    c = max(1, budget_bytes // max(1, n * d * 8))
    if c >= k:
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1)
    best_d: np.ndarray | None = None
    best_i: np.ndarray | None = None
    rows = np.arange(n)
    for j0 in range(0, k, c):
        d2 = (
            (X[:, None, :] - cents[None, j0:j0 + c, :]) ** 2
        ).sum(axis=2)
        i_loc = d2.argmin(axis=1)
        d_loc = d2[rows, i_loc]
        if best_d is None:
            best_d, best_i = d_loc, i_loc + j0
        else:
            upd = d_loc < best_d
            best_d = np.where(upd, d_loc, best_d)
            best_i = np.where(upd, i_loc + j0, best_i)
    return best_i


def kmeans(
    ds: ray.data.Dataset,
    k: int = 4,
    iterations: int = 2,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Fixed-iteration Lloyd's k-means. Returns ``(assignments,
    centroids)``: a streaming ``(id_col, cluster)`` Dataset labeled
    under the final centroids, and the (k, d) float64 centroid
    matrix (feed it to :func:`stages.knn.build_ivf_index` or a
    SemDedup within-cluster dedup pass).
    """
    # ---- deterministic init: embeddings of the k smallest ids ----
    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        X = _matrix(batch, col)
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {
                id_col: pa.array(ids[take]),
                "__vec": pa.array([X[i].tobytes() for i in take]),
            }
        )

    seed = ds.map_batches(bottomk, batch_format="pyarrow").to_pandas()
    if not len(seed):
        raise ValueError(
            "kmeans: input dataset is empty (need at least one row "
            "to seed centroids)"
        )
    seed = seed.sort_values(id_col, kind="mergesort").head(k)
    cents = np.stack(
        [np.frombuffer(b, dtype=np.float64) for b in seed["__vec"]]
    )

    # ---- Lloyd sweeps: broadcast -> per-block partials -> reduce ----
    for _ in range(iterations):
        cents_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            C = ray.get(cents_ref)
            X = _matrix(batch, col)
            a = _assign(X, C)
            counts = np.bincount(a, minlength=k)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts.astype(np.int64)),
                    "s": pa.array([sums[j].tobytes() for j in range(k)]),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        nxt = cents.copy()
        for j in range(k):
            rows = parts[parts["cluster"] == j]
            n = int(rows["n"].sum())
            if n:
                s = np.sum(
                    np.stack(
                        [np.frombuffer(b, dtype=np.float64)
                         for b in rows["s"]]
                    ),
                    axis=0,
                )
                nxt[j] = s / n
        cents = nxt

    # ---- final streaming labeling pass ----
    final_ref = ray.put(cents)

    def label(batch: pa.Table) -> pa.Table:
        C = ray.get(final_ref)
        X = _matrix(batch, col)
        a = _assign(X, C)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow"), cents


def semantic_dedup(
    ds: ray.data.Dataset,
    threshold: float = 0.3,
    k: int = 4,
    iterations: int = 2,
    col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 16,
    chunk: int = 1024,
) -> ray.data.Dataset:
    """SemDedup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the corpus, then WITHIN each cluster
    drop every vector that has a lower-id member at cosine >=
    ``threshold`` (the lower-id member survives as the retained
    exemplar; "any lower-id neighbor", kept or not — the simple
    deterministic variant, stated so the SQL oracle says the same).

    Scale shape: clustering is the shuffle-free :func:`kmeans`; the
    prune is ONE cluster-keyed co-location, and the within-cluster
    kernel is a chunked ``(chunk, m)`` normalized-dot sweep so memory
    stays bounded at ``chunk x cluster_size`` floats however big the
    cluster. The quadratic-in-cluster-size work is the SemDedup
    contract itself — at corpus scale pick ``k`` so ``n / k`` keeps
    the per-cluster matmul tractable (the paper's regime; k grows
    with n). Cross-cluster near-duplicates are missed by design
    (that is the approximation SemDedup trades for linearity).

    Returns the SURVIVORS as ``(id_col, cluster)``.
    """
    from .skew import partitioned_group_map

    _assignments, cents = kmeans(ds, k, iterations, col, id_col)
    cents_ref = ray.put(cents)

    def label_carry(batch: pa.Table) -> pa.Table:
        X = _matrix(batch, col)
        a = _assign(X, ray.get(cents_ref))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
                "__vec": pa.array([x.tobytes() for x in X]),
            }
        )

    carried = ds.map_batches(label_carry, batch_format="pyarrow")

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cid, grp in g.groupby("cluster", sort=False):
            grp = grp.sort_values(id_col, kind="mergesort")
            M = np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in grp["__vec"]]
            )
            G = M / np.linalg.norm(M, axis=1, keepdims=True)
            m = len(G)
            keep = np.ones(m, dtype=bool)
            cols = np.arange(m)[None, :]
            for i0 in range(0, m, chunk):
                i1 = min(i0 + chunk, m)
                S = G[i0:i1] @ G.T
                hit = (S >= threshold) & (
                    cols < np.arange(i0, i1)[:, None]
                )
                keep[i0:i1] = ~hit.any(axis=1)
            outs.append(
                pd.DataFrame(
                    {
                        id_col: grp[id_col].to_numpy()[keep],
                        "cluster": np.int64(cid),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "cluster": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    # The group key has exactly k distinct values, so any partition
    # count above k is provably empty ranges (the schema-less
    # RefBundle warnings); autoscale can't help for the same reason.
    # Per-partition memory is bounded by the largest cluster either
    # way — that bound is the SemDedup contract (pick k ~ n / target).
    return partitioned_group_map(
        carried, ["cluster"], prune,
        num_partitions=min(num_partitions, k), autoscale=False,
    )


def gram_matrix(
    ds: ray.data.Dataset,
    col: str = "embedding",
) -> ray.data.Dataset:
    """Distributed Gram matrix ``X^T X`` over an embedding column —
    the sufficient statistic for PCA / whitening / covariance (with
    the mean vector, one more partial, cov = G/n - mm^T). The classic
    fixed-size-result reduction: each block contributes its own
    ``(d, d)`` partial via one matmul, partials are ADDITIVE, so the
    merge is the CMS/HLL two-level block-coalesce tree — the corpus
    streams once, nothing key-shuffles, and the driver never sees
    more than upper-triangle triplets per block.

    Returns upper-triangle triplets ``(i, j, val)`` with ``i <= j``
    (int64 dims, float64 sums) — d(d+1)/2 rows total.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = _matrix(batch, col)
        G = X.T @ X
        d = G.shape[0]
        iu = np.triu_indices(d)
        return pd.DataFrame(
            {"i": iu[0].astype(np.int64), "j": iu[1].astype(np.int64),
             "val": G[iu]}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["i", "j"], sort=True)["val"].sum().reset_index()
        )

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def centroid_similarity(
    ds: ray.data.Dataset,
    id_col: str,
    emb_col: str,
    label_col: str,
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """Cosine of every vector to its own group's mean centroid —
    the embedding-space outlier score (a low value flags mislabeled /
    off-topic rows inside a cluster or source; the per-row half of
    the SemDedup geometry, exposed directly).

    Scale shape: pass 1 reduces each batch to one ``(label, sum
    vector, count)`` partial (dimension-scale rows, map-side
    combined through one label-cardinality shuffle); the centroid
    table broadcasts via ``ray.put`` and pass 2 streams the corpus
    through a vectorized matmul-free cosine (row-wise dot with the
    row's own centroid). Stated arithmetic — centroid = sum/n per
    dimension, cos = dot/(|v||c|), rounded to 6 — so the SQL oracle
    (unnest + group-by-dimension avg) reproduces it.
    """
    import pyarrow as _pa

    def partial(batch: _pa.Table) -> pd.DataFrame:
        X = _matrix(batch, emb_col)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            X, columns=[f"d{i}" for i in range(X.shape[1])])
        s = df.groupby(pd.Series(lab, name="label")).sum()
        n = pd.Series(lab).value_counts(sort=False)
        out = s.reset_index()
        out["__n"] = n.reindex(s.index).to_numpy(dtype=np.int64)
        return out

    partials = ds.map_batches(
        partial, batch_format="pyarrow").materialize()
    dim_cols = [c for c in partials.schema().names
                if c not in ("label", "__n")]
    from ray.data.aggregate import Sum

    agg = (
        partials.repartition(shuffle_partitions)
        .groupby("label")
        .aggregate(*[Sum(c, alias_name=c) for c in dim_cols + ["__n"]])
        .to_pandas().set_index("label")
    )
    cents = agg[dim_cols].to_numpy(dtype=np.float64)
    cents /= agg["__n"].to_numpy(dtype=np.float64)[:, None]
    cent_map = {lab: cents[i] for i, lab in enumerate(agg.index)}
    cnorm = {lab: float(np.sqrt((v * v).sum()))
             for lab, v in cent_map.items()}
    ref = ray.put((cent_map, cnorm))

    def score(batch: _pa.Table) -> pd.DataFrame:
        cmap, cn = ray.get(ref)
        X = _matrix(batch, emb_col)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False)
        C = np.stack([cmap[v] for v in lab]) if len(lab) else X
        dots = (X * C).sum(axis=1)
        nv = np.sqrt((X * X).sum(axis=1))
        nc = np.array([cn[v] for v in lab], dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dots / (nv * nc)
        return pd.DataFrame({
            id_col: batch.column(id_col).to_numpy(zero_copy_only=False),
            "label": lab,
            "cos_centroid": np.round(cos, 6),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _cov_stats(ds: ray.data.Dataset, col: str):
    """One streamed pass -> (n, mean, sample covariance) on the
    driver. Each block contributes ONE additive partial frame:
    upper-triangle ``X^T X`` triplets plus the per-dimension sum
    (tagged ``j = -1``) and the row count (tagged ``i = j = -1``) —
    the gram_matrix fixed-size reduction with two extra row kinds,
    merged through the same two-level block-coalesce tree. The
    corpus streams once; the driver sees d(d+1)/2 + d + 1 rows.
    Arithmetic contract (stated for the SQL oracle):
    cov = (sum_xy - n * mu_x * mu_y) / (n - 1), float64."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = _matrix(batch, col)
        G = X.T @ X
        d = G.shape[0]
        iu = np.triu_indices(d)
        s = X.sum(axis=0)
        return pd.DataFrame(
            {"i": np.concatenate(
                [iu[0], np.arange(d), [-1]]).astype(np.int64),
             "j": np.concatenate(
                 [iu[1], np.full(d, -1), [-1]]).astype(np.int64),
             "val": np.concatenate([G[iu], s, [float(len(batch))]])}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["i", "j"], sort=True)["val"].sum().reset_index()
        )

    rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    if rows.empty or "i" not in rows.columns:
        # an empty dataset yields schema-less blocks (no partials)
        n = 0.0
    else:
        cnt = rows.loc[(rows["i"] == -1) & (rows["j"] == -1), "val"]
        n = float(cnt.iloc[0]) if len(cnt) else 0.0
    if n < 2:
        # sample covariance divides by n - 1: undefined for n < 2
        # (inf/nan would silently propagate into covariance_matrix
        # and pca_leading_projection); minimum-rows contract is 2
        raise ValueError(
            f"_cov_stats requires at least 2 rows, got {int(n)}")
    sums = rows[(rows["j"] == -1) & (rows["i"] >= 0)].sort_values("i")
    s = sums["val"].to_numpy(np.float64)
    d = len(s)
    G = np.zeros((d, d), dtype=np.float64)
    tri = rows[rows["j"] >= 0]
    G[tri["i"].to_numpy(np.int64), tri["j"].to_numpy(np.int64)] = (
        tri["val"].to_numpy(np.float64))
    G = G + G.T - np.diag(np.diag(G))
    mu = s / n
    cov = (G - n * np.outer(mu, mu)) / (n - 1.0)
    return n, mu, cov


def covariance_matrix(
    ds: ray.data.Dataset, col: str = "embedding",
) -> pd.DataFrame:
    """Full (i, j, cov) sample-covariance table of an embedding
    column (0-based dims, float64 rounded to 6) — the PCA / whitening
    / Mahalanobis sufficient statistic, computed as a shuffle-free
    additive reduction (see _cov_stats). Requires >= 2 input rows
    (sample covariance divides by n - 1); raises ValueError below."""
    _, _, cov = _cov_stats(ds, col)
    d = cov.shape[0]
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    return pd.DataFrame(
        {"i": ii.ravel().astype(np.int64),
         "j": jj.ravel().astype(np.int64),
         "cov": np.round(cov.ravel(), 6)}
    )


def pca_leading_projection(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    col: str = "embedding",
    iters: int = 10,
) -> ray.data.Dataset:
    """Projection of every vector onto the LEADING principal
    component — dimensionality-reduction / outlier-scoring primitive.

    The component is computed by FIXED-COUNT unnormalized power
    iteration from v0 = e_0 (v <- C v, ``iters`` times, one final L2
    normalization) rather than an eigensolver — deliberately, so the
    arithmetic is a finite formula a SQL oracle reproduces exactly
    (eigh is not SQL-expressible; ten unrolled matrix-vector CTEs
    are). Deterministic including sign. Scale shape: the covariance
    reduction streams the corpus once (additive partials, no
    shuffle); the d-vector component is closure-broadcast; the
    projection pass is one vectorized centered matmul per batch,
    streaming, order-preserving."""
    _, mu, cov = _cov_stats(ds, col)
    v = np.zeros(cov.shape[0], dtype=np.float64)
    v[0] = 1.0
    for _ in range(iters):
        v = cov @ v
    v = v / np.sqrt(float((v * v).sum()))

    def project(batch: pa.Table) -> pd.DataFrame:
        X = _matrix(batch, col)
        score = (X - mu) @ v
        return pd.DataFrame(
            {id_col: batch.column(id_col).to_numpy(
                zero_copy_only=False),
             "score": np.round(score, 6)}
        )

    return ds.select_columns([id_col, col]).map_batches(
        project, batch_format="pyarrow")


def quantize_embeddings(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> ray.data.Dataset:
    """Per-dimension affine int8 quantization of an embedding column
    — the memory-side prerequisite for ANN at 100 TB (a float32 d=768
    corpus is 3 KB/vector; int8 is 4x smaller with ~1% recall loss).

    Two passes, both shuffle-free: (1) per-block (dim, min, max)
    partials — d rows per block — reduced on the driver; (2) a
    streaming map quantizes each batch against the closure-broadcast
    scale table. Stated arithmetic so the SQL oracle is exact: scale =
    (max - min) / 255 per dimension (1.0 for constant dimensions),
    code = floor((x - min) / scale + 0.5) - 128 — explicit
    floor(+0.5), NOT banker's/away-from-zero round(), which differ
    between numpy and SQL on exact halves. Output is long-form
    (id, dim, code)."""

    def minmax(batch: pa.Table) -> pd.DataFrame:
        X = _matrix(batch, col)
        d = X.shape[1] if len(X) else 0
        return pd.DataFrame(
            {"i": np.arange(d, dtype=np.int64),
             "mn": X.min(axis=0) if len(X) else np.empty(0),
             "mx": X.max(axis=0) if len(X) else np.empty(0)})

    parts = ds.select_columns([col]).map_batches(
        minmax, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("i").agg(mn=("mn", "min"), mx=("mx", "max"))
    agg = agg.sort_index()
    mn = agg["mn"].to_numpy(np.float64)
    mx = agg["mx"].to_numpy(np.float64)
    scale = np.where(mx > mn, (mx - mn) / 255.0, 1.0)

    def quantize(batch: pa.Table) -> pd.DataFrame:
        X = _matrix(batch, col)
        q = np.floor((X - mn) / scale + 0.5).astype(np.int64) - 128
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        d = X.shape[1]
        return pd.DataFrame(
            {id_col: np.repeat(ids, d),
             "dim": np.tile(np.arange(d, dtype=np.int64), len(ids)),
             "code": q.ravel()})

    return ds.select_columns([id_col, col]).map_batches(
        quantize, batch_format="pyarrow")
