"""Round-2 regression tests: the ADVICE/VERDICT bug-fix set.

- skip_header must not drop data lines under Ray block splitting
- overwrite_parquet / MettaDatasink rerun idempotence
- connected_components non-convergence guard
- distributed semi/anti join + dtype-drift restoration in the
  union-and-bucket join bodies
- asof_join empty-partition schema stability
- IVF probing actually prunes on clustered data while staying exact
"""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data


# ---------------------------------------------------------------------------
# skip_header (ADVICE: positional per-batch drop lost one line per batch)
# ---------------------------------------------------------------------------

def test_tsv_edge_skip_header_multi_batch(ray_session, tmp_path):
    from biocypher_metta_ray.kg.extractors import tsv_edge_extractor

    n = 5000  # read_text splits this into multiple blocks/batches
    path = tmp_path / "edges.tsv"
    lines = ["SUBJ\tOBJ\tSCORE"] + [f"s{i}\to{i}\t{i % 7}" for i in range(n)]
    path.write_text("\n".join(lines) + "\n")
    out = tsv_edge_extractor(
        str(path), pred="linked_to", subj_col=0, obj_col=1, score_col=2,
        skip_header=True,
    )["edges"].to_pandas()
    assert len(out) == n  # no silently dropped data lines
    assert set(out["subj"]) == {f"s{i}" for i in range(n)}
    assert "SUBJ" not in set(out["subj"])


def test_first_lines_of_directory(tmp_path):
    from biocypher_metta_ray.sources.bio_formats import first_lines_of

    (tmp_path / "a.tsv").write_text("header_a\nrow\n")
    (tmp_path / "b.tsv").write_text("header_b\nrow\n")
    assert sorted(first_lines_of(str(tmp_path))) == ["header_a", "header_b"]


# ---------------------------------------------------------------------------
# overwrite semantics (ADVICE: rerun appended a duplicate copy)
# ---------------------------------------------------------------------------

def test_overwrite_parquet_idempotent(ray_session, tmp_path):
    from biocypher_metta_ray.state.checkpoint import overwrite_parquet

    ds = ray.data.from_pandas(pd.DataFrame({"a": range(100)}))
    target = str(tmp_path / "out.parquet")
    overwrite_parquet(ds, target)
    overwrite_parquet(ds, target)  # rerun must NOT append a second copy
    back = ray.data.read_parquet(target).to_pandas()
    assert len(back) == 100


def test_metta_sink_clears_stale_parts(ray_session, tmp_path):
    from biocypher_metta_ray.sinks.metta_sink import write_metta

    big = ray.data.from_pandas(
        pd.DataFrame({"line": [f"(x {i})" for i in range(50)]})
    ).repartition(4)
    write_metta(big, str(tmp_path), "nodes")
    n_first = len(glob.glob(str(tmp_path / "nodes" / "part-*.metta")))
    assert n_first >= 2
    small = ray.data.from_pandas(pd.DataFrame({"line": ["(y 1)"]}))
    write_metta(small, str(tmp_path), "nodes")
    files = glob.glob(str(tmp_path / "nodes" / "part-*.metta"))
    total = sum(
        len(open(f).read().splitlines()) for f in files
    )
    assert total == 1  # stale higher-numbered parts removed


# ---------------------------------------------------------------------------
# connected components convergence guard
# ---------------------------------------------------------------------------

def test_cc_nonconvergence_raises(ray_session):
    from biocypher_metta_ray.stages.canonicalize import connected_components

    # a chain of diameter 12 cannot converge in 2 min-label rounds
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": [f"n{i:02d}" for i in range(12)],
                "dst": [f"n{i + 1:02d}" for i in range(12)],
            }
        )
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, local_threshold=0)
    # non-strict: warns but returns
    with pytest.warns(RuntimeWarning):
        out = connected_components(edges, max_iter=2, strict=False,
                                   local_threshold=0)
        out.count()


# ---------------------------------------------------------------------------
# distributed membership joins + dtype restoration
# ---------------------------------------------------------------------------

def test_distributed_semi_anti_join(ray_session):
    from biocypher_metta_ray.stages.joins import anti_join, semi_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": range(100), "v": range(100)})
    )
    keys = ray.data.from_pandas(pd.DataFrame({"k": range(0, 100, 2)}))
    semi = semi_join(left, keys, on="k").to_pandas()
    anti = anti_join(left, keys, on="k").to_pandas()
    assert sorted(semi["k"]) == list(range(0, 100, 2))
    assert sorted(anti["k"]) == list(range(1, 100, 2))
    # dtype restored despite union NaN-fill
    assert semi["k"].dtype == np.dtype("int64")
    assert anti["v"].dtype == np.dtype("int64")


def test_chained_fallback_join_keeps_key_dtype(ray_session):
    """The exact bug class from embedding_dup_pairs: a fallback join's
    output key must hash identically in a SECOND join (int64 keys that
    drift to float64 land in different partitions and vanish)."""
    from biocypher_metta_ray.stages.joins import hash_join

    pairs = ray.data.from_pandas(
        pd.DataFrame({"a": [1, 2, 3], "b": [4, 5, 6]})
    )
    pa_a = ray.data.from_pandas(
        pd.DataFrame({"a": [1, 2, 3], "pay_a": [b"x", b"y", b"z"]})
    )
    pa_b = ray.data.from_pandas(
        pd.DataFrame({"b": [4, 5, 6], "pay_b": [b"u", b"v", b"w"]})
    )
    j1 = hash_join(pairs, pa_a, on="a", use_native=False)
    j2 = hash_join(j1, pa_b, on="b", use_native=False)
    out = j2.to_pandas()
    assert len(out) == 3
    assert set(out.columns) == {"a", "b", "pay_a", "pay_b"}


def test_asof_join_partition_schema(ray_session):
    """Partitions holding only right-side keys must still emit the full
    joined schema with stable dtypes (ADVICE #5)."""
    from biocypher_metta_ray.stages.joins import asof_join

    left = ray.data.from_pandas(
        pd.DataFrame(
            {
                "k": ["u1"] * 3,
                "ts": pd.to_datetime(["2024-01-02", "2024-01-04",
                                      "2024-01-06"]),
                "lv": [1, 2, 3],
            }
        )
    )
    right = ray.data.from_pandas(
        pd.DataFrame(
            {
                # u9 exists only on the right -> some partitions are
                # left-empty
                "k": ["u1", "u9", "u9"],
                "ts": pd.to_datetime(["2024-01-03", "2024-01-01",
                                      "2024-01-05"]),
                "rv": [10, 20, 30],
            }
        )
    )
    out = asof_join(left, right, by="k", on="ts").to_pandas()
    assert set(out.columns) == {"k", "ts", "lv", "rv"}
    assert out["lv"].dtype == np.dtype("int64")
    got = out.sort_values("ts")["rv"].tolist()
    assert np.isnan(got[0]) and got[1] == 10 and got[2] == 10


# ---------------------------------------------------------------------------
# IVF really prunes on clustered data
# ---------------------------------------------------------------------------

def test_ivf_pruning(ray_session):
    from biocypher_metta_ray.stages.knn import ivf_knn, knn_bruteforce

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 16)) * 10
    rows = []
    for i in range(400):
        c = i % 4
        rows.append((i, (centers[c] + rng.standard_normal(16) * 0.1)))
    df = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].astype(np.float32).tolist() for r in rows]}
    )
    ds = ray.data.from_pandas(df)
    q = np.asarray(df.loc[0, "embedding"], dtype=np.float64)
    exact = knn_bruteforce(ds, q, k=5)
    approx = ivf_knn(ds, q, k=5, num_centroids=4, n_probe=1)
    # n_probe=1 of 4 cells: exact result, 1/4 of the data scanned
    assert list(approx["vec_id"]) == list(exact["vec_id"])


def test_cc_local_matches_distributed(ray_session):
    import pandas as pd
    from biocypher_metta_ray.stages.canonicalize import connected_components

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": ["a", "b", "x", "y", "m"],
                "dst": ["b", "c", "y", "z", "m"],
            }
        )
    )
    local = connected_components(edges).to_pandas()
    dist = connected_components(edges, local_threshold=0).to_pandas()
    l = dict(zip(local["node"], local["component"]))
    d = dict(zip(dist["node"], dist["component"]))
    assert l == d == {"a": "a", "b": "a", "c": "a",
                      "x": "x", "y": "x", "z": "x", "m": "m"}


def test_embedding_lsh_skewed_hot_bucket(ray_session):
    """A pathological duplicate cluster (one vector repeated 300x =
    one white-hot LSH bucket) must flow through the banded candidate
    pass and the bounded-partition pair join without collapsing into a
    single whole-bucket task: the output is the full O(k^2) pair set
    of the cluster (that IS the answer) plus the unrelated pairs,
    produced across multiple partitions."""
    from biocypher_metta_ray.stages.knn import embedding_dup_pairs

    rng = np.random.default_rng(5)
    hot = rng.standard_normal(16)
    rows = []
    for i in range(300):  # exact-duplicate cluster
        rows.append((i, hot + rng.standard_normal(16) * 1e-6))
    for i in range(300, 600):  # unrelated background
        rows.append((i, rng.standard_normal(16) * 3))
    df = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1].astype(np.float32).tolist() for r in rows],
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    pairs = embedding_dup_pairs(
        ds, threshold=0.999, num_planes=4, num_tables=8
    ).to_pandas()
    in_cluster = pairs[(pairs["id_a"] < 300) & (pairs["id_b"] < 300)]
    assert len(in_cluster) == 300 * 299 // 2  # every cluster pair found
    # near-identical vectors collide in EVERY table, so candidate rows
    # for the hot bucket appeared in 8 tables x several partitions and
    # still deduped to exactly one output row per pair
    assert pairs.duplicated(subset=["id_a", "id_b"]).sum() == 0


def test_stage_data_resumable(tmp_path):
    """Staging analogue of scripts/download_data.py: atomic copies,
    sha256 manifest, digest-matched skip on rerun, corruption detect."""
    import yaml

    from tools.stage_data import stage, verify

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.gtf").write_text("gene1\n")
    (raw / "b.txt").write_text("pathway\n")
    manifest = tmp_path / "sources.yaml"
    manifest.write_text(yaml.safe_dump(
        {"sources": {"gencode": {"files": [str(raw / "a.gtf")]},
                     "reactome": {"files": [str(raw / "b.txt")]}}}
    ))
    out = tmp_path / "staged"
    r1 = stage(str(manifest), str(out))
    assert sorted(r1["staged"]) == ["gencode/a.gtf", "reactome/b.txt"]
    r2 = stage(str(manifest), str(out))  # rerun: everything skips
    assert r2["staged"] == [] and len(r2["skipped"]) == 2
    v = verify(str(out))
    assert len(v["ok"]) == 2 and not v["corrupt"] and not v["missing"]
    # corrupt a staged file -> verify flags it
    (out / "gencode" / "a.gtf").write_text("tampered\n")
    v2 = verify(str(out))
    assert v2["corrupt"] == ["gencode/a.gtf"]
    # changed source -> restaged
    (raw / "a.gtf").write_text("gene1\ngene2\n")
    r3 = stage(str(manifest), str(out))
    assert r3["staged"] == ["gencode/a.gtf"]


def test_ivf_partitioned_index(ray_session, tmp_path):
    """The materialized IVF layout: cell-partitioned parquet + probed
    reads — a 1-of-4-cells query touches ONE cell directory and still
    returns the exact top-k on clustered data."""
    import os

    from biocypher_metta_ray.stages.knn import (
        build_ivf_index,
        ivf_index_search,
        knn_bruteforce,
    )

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 16)) * 10
    rows = []
    for i in range(400):
        c = i % 4
        rows.append((i, (centers[c] + rng.standard_normal(16) * 0.1)))
    df = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].astype(np.float32).tolist() for r in rows]}
    )
    ds = ray.data.from_pandas(df)
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, num_centroids=4)
    assert meta["num_centroids"] == 4
    cells = sorted(
        d for d in os.listdir(idx) if d.startswith("cell=")
    )
    assert len(cells) == 4  # one directory per cell
    q = np.asarray(df.loc[0, "embedding"], dtype=np.float64)
    got = ivf_index_search(idx, q, k=5, n_probe=1)
    exact = knn_bruteforce(ds, q, k=5)
    assert list(got["vec_id"]) == list(exact["vec_id"])
    # rebuild is idempotent (overwrite, not append)
    build_ivf_index(ds, idx, num_centroids=4)
    import ray.data as rd

    assert rd.read_parquet(idx).count() == 400


def test_cc_local_vs_distributed_random_graphs(ray_session):
    """Seeded random graphs: the driver union-find and the distributed
    min-label loop must elect identical components."""
    from biocypher_metta_ray.stages.canonicalize import connected_components

    rng = np.random.default_rng(17)
    for trial in range(3):
        n = 40
        m = 50
        src = [f"n{int(x):03d}" for x in rng.integers(0, n, m)]
        dst = [f"n{int(x):03d}" for x in rng.integers(0, n, m)]
        edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
        local = connected_components(edges).to_pandas()
        dist = connected_components(edges, local_threshold=0).to_pandas()
        l = dict(zip(local["node"], local["component"]))
        d = dict(zip(dist["node"], dist["component"]))
        assert l == d, f"trial {trial} mismatch"
