"""Dedup operator tests: exact vs SQL-free ground truth, MinHash/SimHash
recall against brute-force Jaccard, embedding dup pairs."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.01"


def _docs_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _shingles(t: str, n=3):
    toks = t.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _brute_pairs(df, threshold, n=3):
    sh = {r.doc_id: _shingles(r.text, n) for r in df.itertuples()}
    out = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = inter / len(sh[a] | sh[b])
        if j >= threshold:
            out.add((a, b))
    return out


def test_minhash_finds_planted_near_dups(ray_session):
    from biocypher_metta_ray.stages.dedup import minhash_dedup

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = minhash_dedup(docs, threshold=0.8).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    want = _brute_pairs(_docs_df(), 0.8)
    assert want, "fixture should contain planted near-dups"
    # verified pairs are exact-Jaccard filtered -> no false positives
    assert got_pairs <= want
    # LSH recall at J>=0.8 with 16 bands x 4 rows should be near-total
    recall = len(got_pairs & want) / len(want)
    assert recall >= 0.9, (recall, want - got_pairs)


def test_minhash_signature_properties(ray_session):
    from biocypher_metta_ray.stages.dedup import MinHasher

    mh = MinHasher()
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g h",
                    "a b c d e f g h",          # identical -> same signature
                    "a b c d e f g h extra",    # near-dup -> mostly same
                    "",                          # empty -> sentinel sig
                ]
            ),
        }
    )
    sig = mh.signatures(t)
    assert (sig[0] == sig[1]).all()
    assert (sig[0] == sig[2]).mean() > 0.5
    assert sig.shape == (4, 64)
    # batch output: one row per (doc, band)
    out = mh(t)
    assert out.num_rows == 4 * 16
    df = out.to_pandas()
    b1 = df[df.doc_id == 1].band_hash.to_numpy()
    b2 = df[df.doc_id == 2].band_hash.to_numpy()
    assert (b1 == b2).all()


def test_simhash_identical_docs_collide(ray_session):
    from biocypher_metta_ray.stages.dedup import simhash_candidates

    t = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(
                ["x y z w q r s t", "x y z w q r s t", "completely different words here"]
            ),
        }
    )
    out = simhash_candidates(ray.data.from_arrow(t)).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (10, 11) in pairs
    assert (10, 12) not in pairs


def test_exact_dedup_keeps_min_id(ray_session):
    from biocypher_metta_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([5, 3, 9, 7], pa.int64()),
            "text": pa.array(["same", "same", "same", "other"]),
        }
    )
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [3, 7]


def test_embedding_dups_lsh_recall(ray_session):
    """LSH-bucketed near-dup detection finds the top exact pairs."""
    from biocypher_metta_ray.stages.knn import embedding_dup_pairs

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = embedding_dup_pairs(ds, threshold=0.45, num_planes=0).to_pandas()
    lsh = embedding_dup_pairs(ds, threshold=0.45, num_planes=4).to_pandas()
    e = set(zip(exact["id_a"], exact["id_b"]))
    l = set(zip(lsh["id_a"], lsh["id_b"]))
    assert l <= e  # bucketing only prunes, never invents
    assert len(e) >= 10


def test_ivf_knn_close_to_bruteforce(ray_session):
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from biocypher_metta_ray.stages.knn import ivf_knn, knn_bruteforce

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.asarray(
        tbl.filter(pc.equal(tbl["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    bf = knn_bruteforce(ds, q, k=10, exclude_id=0)
    approx = ivf_knn(ds, q, k=10, num_centroids=8, n_probe=4)
    # probing half the centroids should recover most of the true top-10
    overlap = len(set(bf["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 5, (overlap, list(bf["vec_id"]), list(approx["vec_id"]))
