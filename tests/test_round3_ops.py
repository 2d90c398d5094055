"""Round-3 late additions: interval (range) join, PageRank,
mixture sampling, per-group top-k. Oracle parity for each runs in
test_oracle_parity.py; these tests cover the edge semantics the
sf0.01 tables don't exercise."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def _ds(df):
    return ray.data.from_pandas(df)


# ---------------------------------------------------------------- interval


def _brute_overlap(l, r, by):
    m = l.merge(r, on=by)
    hit = (m["ls"] <= m["re"]) & (m["rs"] <= m["le"])
    return m[hit][["lid", "rid"]].sort_values(["lid", "rid"]).reset_index(
        drop=True
    )


def test_interval_join_matches_bruteforce(ray_session):
    from biocypher_metta_ray.stages.joins import interval_join

    rng = np.random.RandomState(7)
    l = pd.DataFrame(
        {
            "chrom": rng.randint(0, 3, 200).astype("int64"),
            "lid": np.arange(200, dtype="int64"),
            "ls": rng.randint(0, 5000, 200).astype("int64"),
        }
    )
    l["le"] = l["ls"] + rng.randint(0, 900, 200)  # spans several bins
    r = pd.DataFrame(
        {
            "chrom": rng.randint(0, 3, 300).astype("int64"),
            "rid": np.arange(300, dtype="int64"),
            "rs": rng.randint(0, 5000, 300).astype("int64"),
        }
    )
    r["re"] = r["rs"] + rng.randint(0, 50, 300)

    got = (
        interval_join(
            _ds(l), _ds(r), by="chrom",
            left_range=("ls", "le"), right_range=("rs", "re"),
            bin_size=128, num_partitions=8,
        )
        .to_pandas()[["lid", "rid"]]
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    want = _brute_overlap(l, r, "chrom")
    # no duplicate emission despite multi-bin overlaps
    assert not got.duplicated().any()
    pd.testing.assert_frame_equal(got, want)


def test_interval_join_inclusive_touching_endpoints(ray_session):
    from biocypher_metta_ray.stages.joins import interval_join

    l = pd.DataFrame({"k": ["a", "a"], "lid": [1, 2],
                      "ls": [0, 500], "le": [100, 600]})
    r = pd.DataFrame({"k": ["a", "a"], "rid": [10, 20],
                      "rs": [100, 601], "re": [150, 700]})
    got = interval_join(
        _ds(l), _ds(r), by="k", left_range=("ls", "le"),
        right_range=("rs", "re"), bin_size=64, num_partitions=4,
    ).to_pandas()
    # [0,100]x[100,150] touch at one bp -> match; [500,600]x[601,700]
    # are adjacent but disjoint -> no match
    assert got[["lid", "rid"]].values.tolist() == [[1, 10]]


def test_interval_join_rejects_column_overlap(ray_session):
    from biocypher_metta_ray.stages.joins import interval_join

    l = pd.DataFrame({"k": ["a"], "s": [0], "e": [1]})
    with pytest.raises(ValueError):
        interval_join(_ds(l), _ds(l.copy()), by="k",
                      left_range=("s", "e"), right_range=("s", "e"))


# ---------------------------------------------------------------- pagerank


def _pr_reference(edges, d=0.85, iters=5):
    """Dense numpy reference of the same recurrence (dangling mass
    dropped)."""
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    e = edges.drop_duplicates()
    out_deg = e.groupby("src").size()
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for s, t in zip(e["src"], e["dst"]):
            nxt[idx[t]] += d * r[idx[s]] / out_deg[s]
        r = nxt
    return pd.DataFrame({"node": nodes, "pr": np.round(r, 6)})


def test_pagerank_matches_dense_reference(ray_session):
    from biocypher_metta_ray.stages.graph import pagerank

    rng = np.random.RandomState(3)
    edges = pd.DataFrame(
        {
            "src": [f"n{i}" for i in rng.randint(0, 40, 400)],
            "dst": [f"n{i}" for i in rng.randint(0, 40, 400)],
        }
    )
    got = (
        pagerank(_ds(edges), iterations=5, num_partitions=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = _pr_reference(edges).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, atol=2e-6, check_dtype=False)


def test_pagerank_sink_keeps_teleport_floor(ray_session):
    from biocypher_metta_ray.stages.graph import pagerank

    # a -> b -> c, c dangling: every node keeps >= teleport mass and
    # the chain accumulates rank downstream
    edges = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    got = pagerank(_ds(edges), iterations=10, num_partitions=2).to_pandas()
    pr = dict(zip(got["node"], got["pr"]))
    assert set(pr) == {"a", "b", "c"}
    assert pr["a"] == pytest.approx(0.05, abs=1e-6)
    assert pr["c"] > pr["b"] > pr["a"]
    # dangling mass dropped, never redistributed
    assert got["pr"].sum() < 1.0


# ---------------------------------------------------------------- sampling


def test_mix_sample_rates_and_nesting(ray_session):
    from biocypher_metta_ray.stages.relational import mix_sample

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4000, dtype="int64"),
            "source": ["a", "b", "c", "d"] * 1000,
        }
    )
    full = mix_sample(_ds(df), "source", "doc_id",
                      {"a": 1.0, "b": 0.5, "c": 0.1}).to_pandas()
    counts = full.groupby("source").size()
    assert counts.get("a", 0) == 1000           # rate 1.0 keeps all
    assert "d" not in counts.index              # default 0.0 drops
    assert abs(counts["b"] - 500) < 80          # ~rate 0.5
    assert abs(counts["c"] - 100) < 40          # ~rate 0.1
    # determinism + nesting: the 0.1 sample of a source is a subset of
    # its 0.5 sample (same key hash, larger cut)
    half = mix_sample(_ds(df), "source", "doc_id", {"c": 0.5}).to_pandas()
    tenth = mix_sample(_ds(df), "source", "doc_id", {"c": 0.1}).to_pandas()
    assert set(tenth["doc_id"]) <= set(half["doc_id"])


def test_top_k_per_group_ties_and_small_groups(ray_session):
    from biocypher_metta_ray.stages.relational import top_k_per_group

    df = pd.DataFrame(
        {
            "g": ["x"] * 5 + ["y"] * 2,
            "v": [3.0, 3.0, 3.0, 1.0, 2.0, 9.0, 9.0],
            "id": np.arange(7, dtype="int64"),
        }
    )
    got = (
        top_k_per_group(_ds(df), ["g"], by="v", k=2, ascending=False,
                        tiebreak=["id"], num_partitions=4)
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    # ties broken by id ascending; a group smaller than k returns whole
    assert got[got["g"] == "x"]["id"].tolist() == [0, 1]
    assert got[got["g"] == "y"]["id"].tolist() == [5, 6]


# ---------------------------------------------------------------- bigram LM


def test_lm_score_hand_computed(ray_session):
    import math

    from biocypher_metta_ray.stages.lm import lm_score, train_bigram_lm

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype="int64"),
            "text": [
                "The cat sat",      # bigrams: (the,cat) (cat,sat)
                "the cat ran",      # (the,cat) (cat,ran)
                "dog",              # no bigrams -> omitted
                "the cat sat",      # (the,cat) (cat,sat)
            ],
        }
    )
    model = train_bigram_lm(_ds(docs), min_count=2)
    # contexts: the->3, cat->3; vocab = 2 distinct contexts
    ctx = dict(zip(model["contexts"]["w1"], model["contexts"]["uc"]))
    assert ctx == {"the": 3, "cat": 3}
    assert model["vocab"] == 2
    # (cat,ran) occurs once -> pruned; (the,cat)=3 and (cat,sat)=2 kept
    big = {
        (a, b): c
        for a, b, c in model["bigrams"][["w1", "w2", "bc"]].itertuples(
            index=False
        )
    }
    assert big == {("the", "cat"): 3, ("cat", "sat"): 2}

    got = lm_score(_ds(docs), alpha=0.1, min_count=2).to_pandas()
    scores = dict(zip(got["doc_id"], got["avg_logprob"]))
    assert 2 not in scores          # single-token doc omitted
    p_the_cat = math.log((3 + 0.1) / (3 + 0.2))
    p_cat_sat = math.log((2 + 0.1) / (3 + 0.2))
    p_cat_ran = math.log((0 + 0.1) / (3 + 0.2))  # pruned -> floor
    assert scores[0] == pytest.approx(
        round((p_the_cat + p_cat_sat) / 2, 6), abs=1e-6
    )
    assert scores[1] == pytest.approx(
        round((p_the_cat + p_cat_ran) / 2, 6), abs=1e-6
    )
    # boilerplate (seen-twice) doc outscores the one with a rare bigram
    assert scores[0] > scores[1]


def test_lm_score_external_model_reuse(ray_session):
    """A model trained on one corpus scores another (the
    train-on-wiki / score-crawl CCNet deployment shape)."""
    from biocypher_metta_ray.stages.lm import lm_score, train_bigram_lm

    train = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c", "a b d"]}
    )
    target = pd.DataFrame({"doc_id": [7], "text": ["a b"]})
    model = train_bigram_lm(_ds(train), min_count=2)
    got = lm_score(_ds(target), model=model).to_pandas()
    assert got["doc_id"].tolist() == [7]


# ---------------------------------------------------------------- triangles


def _brute_triangles(edges):
    und = set()
    for a, b in zip(edges["src"], edges["dst"]):
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n = 0
    for u, v in und:
        n += len(adj[u] & adj[v])
    return n // 3  # each triangle counted once per edge


def test_triangle_count_matches_bruteforce(ray_session):
    from biocypher_metta_ray.stages.graph import triangle_count

    rng = np.random.RandomState(11)
    edges = pd.DataFrame(
        {
            "src": rng.randint(0, 30, 500).astype("int64"),
            "dst": rng.randint(0, 30, 500).astype("int64"),
        }
    )
    got = triangle_count(_ds(edges), num_partitions=4)
    want = _brute_triangles(edges)
    assert got["n_triangles"].iloc[0] == want
    assert str(got["n_triangles"].dtype) == "int64"


def test_triangle_count_ignores_direction_multiplicity_loops(ray_session):
    from biocypher_metta_ray.stages.graph import triangle_count

    edges = pd.DataFrame(
        {
            "src": ["a", "b", "c", "c", "a", "x"],
            "dst": ["b", "c", "a", "b", "a", "y"],
        }
    )  # one triangle abc (with a reversed + duplicate edge), loop, stray edge
    got = triangle_count(_ds(edges), num_partitions=2)
    assert got["n_triangles"].iloc[0] == 1


# ---------------------------------------------------------------- winsorize


def test_winsorize_clips_to_group_band(ray_session):
    from biocypher_metta_ray.stages.relational import winsorize

    df = pd.DataFrame(
        {
            "g": ["a"] * 101 + ["b"] * 3,
            "v": list(np.arange(101, dtype="float64")) + [0.0, 10.0, 1e9],
            "i": np.arange(104, dtype="int64"),
        }
    )
    got = (
        winsorize(_ds(df), ["g"], "v", "w", lo=0.05, hi=0.95,
                  num_partitions=4)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    a = got[got["g"] == "a"]
    # 0..100: p05=5, p95=95 exactly; inside-band values untouched
    assert a["w"].min() == 5.0 and a["w"].max() == 95.0
    assert (a[(a["v"] >= 5) & (a["v"] <= 95)]["w"]
            == a[(a["v"] >= 5) & (a["v"] <= 95)]["v"]).all()
    # group b's huge outlier clipped to ITS OWN band, not group a's
    b = got[got["g"] == "b"]
    assert b["w"].max() < 1e9 and b["w"].max() > 95.0


# ---------------------------------------------------------------- hash embed


def test_hash_embed_linear_and_partition_invariant(ray_session):
    from biocypher_metta_ray.stages.text_stats import hash_embed

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype="int64"),
            "text": ["red green blue", "red red", "red green blue red red"],
        }
    )
    got = hash_embed(_ds(docs), dims=16).to_pandas()
    vec = {
        d: dict(zip(g["dim"], g["weight"]))
        for d, g in got.groupby("doc_id")
    }
    # doc2 = doc0 tokens + doc1 tokens -> its vector is the sum
    alldims = set(vec[0]) | set(vec[1])
    for k in alldims:
        assert vec[2].get(k, 0) == vec[0].get(k, 0) + vec[1].get(k, 0)
    # same corpus split into single-row blocks -> identical triplets
    parts = [ray.data.from_pandas(docs.iloc[[i]]) for i in range(3)]
    split = parts[0].union(parts[1]).union(parts[2])
    got2 = hash_embed(split, dims=16).to_pandas()
    a = got.sort_values(["doc_id", "dim"]).reset_index(drop=True)
    b = got2.sort_values(["doc_id", "dim"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------- registry order


def test_driver_cap_rotates_never_checked_queries_into_first_50():
    """CORRECTNESS rows stop at 50 entries (observed r2). The round-5
    rotation policy (VERDICT r4 task #7) promotes ONLY queries that have
    never received a driver CORRECTNESS row; displaced long-proven rows
    (kg_* anchors, cadd_nodes, peregrine_edges, ...) stay parity-covered
    by test_oracle_parity."""
    import json
    import pathlib

    import __ray_entry__ as m

    head = list(m.queries())[:50]
    # every head entry must be a first-timer vs rounds 1-4
    seen = set()
    for r in range(1, 5):
        p = pathlib.Path(__file__).resolve().parents[1] / f"CORRECTNESS_r0{r}.json"
        if p.exists():
            seen |= set(json.loads(p.read_text()))
    already = [q for q in head if q in seen]
    assert not already, f"non-first-timers in driver window: {already}"
    # the 25 newly-oracled reference-adapter families lead the window
    for name in ("gencode_genes", "uniprot_proteins", "gaf_edges",
                 "gtex_eqtl_edges", "topld_edges", "favor_nodes",
                 # VERDICT r4 #7 explicit promotion list
                 "rna_central_nodes", "scd2_history", "ancestor_closure",
                 "q4_priority", "q7_volume", "q13_custdist", "knn_graph",
                 "leakage_safe_split", "global_row_number",
                 "regional_revenue"):
        assert name in head, name


# --------------------------------------------------------------- fuzzy join


def _brute_fuzzy(l, r, max_dist):
    from biocypher_metta_ray.stages.joins import _levenshtein

    rows = [
        (lid, rid, _levenshtein(ls, rs))
        for lid, ls in zip(l["id"], l["s"])
        for rid, rs in zip(r["id"], r["s"])
        if _levenshtein(ls, rs) <= max_dist
    ]
    return (
        pd.DataFrame(rows, columns=["lid", "rid", "dist"])
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_join_matches_bruteforce(ray_session, max_dist):
    """Deletion-variant blocking must find EVERY pair within the
    distance bound (substitutions and insertions included, not just
    deletions) — cross-checked against the all-pairs DP."""
    from biocypher_metta_ray.stages.joins import fuzzy_join

    words = ["grape", "graph", "grap", "grapes", "table", "tabel",
             "cable", "xylophone", "graphs", "tale"]
    l = pd.DataFrame({"id": np.arange(len(words), dtype=np.int64),
                      "s": words})
    r = pd.DataFrame({"id": np.arange(100, 100 + len(words),
                                      dtype=np.int64),
                      "s": words[::-1]})
    got = (
        fuzzy_join(_ds(l), _ds(r), "id", "s", "id", "s",
                   max_dist=max_dist, num_partitions=4)
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    want = _brute_fuzzy(l, r, max_dist)
    pd.testing.assert_frame_equal(
        got.astype({"lid": "int64", "rid": "int64", "dist": "int64"}),
        want,
    )


def test_fuzzy_join_no_duplicate_pairs_from_shared_variants(ray_session):
    """A pair reachable through several shared deletion variants must
    surface exactly once."""
    from biocypher_metta_ray.stages.joins import fuzzy_join

    l = pd.DataFrame({"id": np.array([1], dtype=np.int64),
                      "s": ["aaaa"]})
    r = pd.DataFrame({"id": np.array([2], dtype=np.int64),
                      "s": ["aaaa"]})
    got = fuzzy_join(_ds(l), _ds(r), "id", "s", "id", "s",
                     max_dist=2, num_partitions=2).to_pandas()
    assert len(got) == 1
    assert int(got["dist"].iloc[0]) == 0


# ----------------------------------------------------------------- BFS


def test_bfs_distances_path_graph(ray_session):
    """Path 0-1-2-3-4-5, seed 0, max_hops=3: dists 0..3, nodes 4,5
    absent; early-exit leaves the 3-hop frontier as the last sweep."""
    from biocypher_metta_ray.stages.graph import bfs_distances

    e = pd.DataFrame({"src": [0, 1, 2, 3, 4], "dst": [1, 2, 3, 4, 5]})
    seeds = pd.DataFrame({"node": [0]})
    got = (
        bfs_distances(_ds(e), _ds(seeds), max_hops=3, num_partitions=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got["node"].tolist() == [0, 1, 2, 3]
    assert got["dist"].tolist() == [0, 1, 2, 3]


def test_bfs_distances_directed_vs_undirected(ray_session):
    from biocypher_metta_ray.stages.graph import bfs_distances

    e = pd.DataFrame({"src": [1, 2], "dst": [0, 0]})
    seeds = pd.DataFrame({"node": [0]})
    und = bfs_distances(_ds(e), _ds(seeds), max_hops=2,
                        num_partitions=2).to_pandas()
    assert sorted(und["node"]) == [0, 1, 2]
    dire = bfs_distances(_ds(e), _ds(seeds), max_hops=2, directed=True,
                         num_partitions=2).to_pandas()
    assert sorted(dire["node"]) == [0]  # edges point INTO the seed


def test_bfs_distances_multi_seed_min_and_early_exit(ray_session):
    """Two seeds in separate components; BFS stops when frontiers
    empty (well before max_hops) and keeps per-node MIN distance."""
    from biocypher_metta_ray.stages.graph import bfs_distances

    e = pd.DataFrame({"src": [0, 1, 10], "dst": [1, 2, 11]})
    seeds = pd.DataFrame({"node": [0, 2, 10]})
    got = (
        bfs_distances(_ds(e), _ds(seeds), max_hops=100, num_partitions=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got["node"].tolist() == [0, 1, 2, 10, 11]
    assert got["dist"].tolist() == [0, 1, 0, 0, 1]


# -------------------------------------------------------------- k-means


def _blob_ds(n_parts=1):
    # rows interleaved across blobs (true blob of row i = i % 3) so
    # the smallest-id deterministic init seeds one centroid per blob
    rng = np.random.default_rng(7)
    centers = np.array([[5.0, 5.0], [-5.0, 5.0], [0.0, -6.0]])
    blobs = [c + 0.1 * rng.standard_normal((20, 2)) for c in centers]
    X = np.stack(
        [blobs[i % 3][i // 3] for i in range(60)]
    ).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(60, dtype=np.int64),
         "embedding": [x for x in X]}
    )
    if n_parts == 1:
        return ray.data.from_pandas(df), df
    parts = np.array_split(df, n_parts)
    return ray.data.from_pandas(list(parts)), df


def test_kmeans_recovers_separated_blobs(ray_session):
    from biocypher_metta_ray.stages.cluster import kmeans

    ds, df = _blob_ds()
    out, cents = kmeans(ds, k=3, iterations=4)
    got = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    lab = got["cluster"].to_numpy()
    # each true blob (ids congruent mod 3) maps to ONE cluster, and
    # the three blobs to three different ones
    blocks = [set(lab[i::3]) for i in range(3)]
    assert all(len(b) == 1 for b in blocks)
    assert len(set().union(*blocks)) == 3
    assert cents.shape == (3, 2)


def test_kmeans_partition_invariant(ray_session):
    """Block partials must reduce to the same centroids however the
    input is split (modulo fp noise too small to flip an argmin)."""
    from biocypher_metta_ray.stages.cluster import kmeans

    ds1, _ = _blob_ds(1)
    ds5, _ = _blob_ds(5)
    a1 = kmeans(ds1, k=3, iterations=2)[0].to_pandas()
    a5 = kmeans(ds5, k=3, iterations=2)[0].to_pandas()
    m = a1.merge(a5, on="vec_id")
    assert (m["cluster_x"] == m["cluster_y"]).all()


def test_kmeans_empty_cluster_keeps_previous_centroid(ray_session):
    """k larger than the number of distinct points: the orphan
    centroid must keep its init position, not collapse to NaN."""
    from biocypher_metta_ray.stages.cluster import kmeans

    df = pd.DataFrame(
        {"vec_id": np.arange(4, dtype=np.int64),
         "embedding": [np.array([0.0, 0.0], dtype=np.float32),
                       np.array([0.0, 0.0], dtype=np.float32),
                       np.array([9.0, 9.0], dtype=np.float32),
                       np.array([9.0, 9.0], dtype=np.float32)]}
    )
    out, cents = kmeans(ray.data.from_pandas(df), k=3, iterations=3)
    assert not np.isnan(cents).any()
    got = out.to_pandas()
    # the duplicate-of-init centroid 1 (vec 1 == vec 0) stays empty:
    # ties break to cluster 0; cluster 1 keeps its init position
    assert np.allclose(cents[1], [0.0, 0.0])
    assert sorted(set(got["cluster"])) == [0, 2]


def test_semantic_dedup_keeps_min_id_exemplar(ray_session):
    """Near-identical vectors in one blob: only the lowest id
    survives; distinct blobs keep one survivor each."""
    from biocypher_metta_ray.stages.cluster import semantic_dedup

    base = np.array([[5.0, 5.0], [-5.0, 5.0], [0.0, -6.0]])
    rows = []
    for i in range(30):
        v = base[i % 3] + 1e-4 * ((i // 3) % 7)  # near-dups per blob
        rows.append(v)
    df = pd.DataFrame(
        {"vec_id": np.arange(30, dtype=np.int64),
         "embedding": [r.astype(np.float32) for r in rows]}
    )
    got = semantic_dedup(
        ray.data.from_pandas(df), threshold=0.999, k=3, iterations=3,
        num_partitions=4,
    ).to_pandas().sort_values("vec_id")
    # survivors: exactly the min id of each blob (ids 0, 1, 2)
    assert got["vec_id"].tolist() == [0, 1, 2]


def test_semantic_dedup_chunked_matches_unchunked(ray_session):
    from biocypher_metta_ray.stages.cluster import semantic_dedup

    ds, _ = _blob_ds()
    a = semantic_dedup(ds, threshold=0.9, k=3, iterations=2,
                       chunk=4).to_pandas()
    b = semantic_dedup(ds, threshold=0.9, k=3, iterations=2,
                       chunk=4096).to_pandas()
    assert sorted(a["vec_id"]) == sorted(b["vec_id"])


def test_semantic_dedup_cross_cluster_dups_survive(ray_session):
    """The documented SemDedup approximation: identical vectors that
    land in DIFFERENT clusters are both kept."""
    from biocypher_metta_ray.stages.cluster import kmeans, semantic_dedup

    # two tight far-apart pairs; k=2 with smallest-id init (one seed
    # in each pair) puts each pair in its own cluster — duplicates
    # ACROSS clusters don't exist here, so instead verify: per
    # cluster one exemplar survives, total 2
    df = pd.DataFrame(
        {"vec_id": np.arange(4, dtype=np.int64),
         "embedding": [np.array([9.0, 0.0], dtype=np.float32),
                       np.array([-9.0, 0.0], dtype=np.float32),
                       np.array([9.0, 0.001], dtype=np.float32),
                       np.array([-9.0, 0.001], dtype=np.float32)]}
    )
    ds = ray.data.from_pandas(df)
    got = semantic_dedup(ds, threshold=0.999, k=2, iterations=2,
                         num_partitions=2).to_pandas()
    assert sorted(got["vec_id"]) == [0, 1]
    # and the same data at k=4 (every vector its own cluster):
    # nothing prunes — cross-cluster duplicates survive
    got4 = semantic_dedup(ds, threshold=0.999, k=4, iterations=2,
                          num_partitions=2).to_pandas()
    assert sorted(got4["vec_id"]) == [0, 1, 2, 3]


# ------------------------------------------------------------- outer joins


@pytest.mark.parametrize("use_native", [True, False])
def test_hash_join_outer_variants(ray_session, use_native):
    """left/full outer must agree between the native acero path
    (pandas 'left' -> acero 'left_outer' translation) and the
    union-and-bucket fallback."""
    from biocypher_metta_ray.stages.joins import hash_join

    l = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                      "lv": np.array([10, 20, 30], dtype=np.int64)})
    r = pd.DataFrame({"k": np.array([2, 3, 4], dtype=np.int64),
                      "rv": np.array([200, 300, 400], dtype=np.int64)})
    left = (
        hash_join(_ds(l), _ds(r), on="k", how="left",
                  num_partitions=4, use_native=use_native)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert left["k"].tolist() == [1, 2, 3]
    assert left["rv"].fillna(-1).astype("int64").tolist() == [-1, 200, 300]
    full = (
        hash_join(_ds(l), _ds(r), on="k", how="outer",
                  num_partitions=4, use_native=use_native)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert full["k"].tolist() == [1, 2, 3, 4]
    assert full["lv"].fillna(-1).astype("int64").tolist() == [10, 20, 30, -1]
    assert full["rv"].fillna(-1).astype("int64").tolist() == [-1, 200, 300, 400]


# ------------------------------------------------------- negative sampling


def test_negative_triples_deterministic_and_labelled(ray_session):
    from biocypher_metta_ray.pipelines.kg import negative_triples

    edges = pd.DataFrame(
        {"subj": ["a", "b"], "pred": ["r", "r"], "obj": ["x", "y"]}
    )
    vocab = ["a", "b", "x", "y", "z"]
    got = negative_triples(_ds(edges), vocab, n_neg=3).to_pandas()
    pos = got[got["label"] == 1]
    neg = got[got["label"] == 0]
    assert len(pos) == 2 and len(neg) == 6
    assert set(neg["obj"]) <= set(vocab)
    # positives pass through untouched
    assert sorted(zip(pos["subj"], pos["obj"])) == [("a", "x"), ("b", "y")]
    # partition-invariant: same rows from a 2-block split
    parts = [_ds(edges.iloc[[i]]) for i in range(2)]
    got2 = parts[0].union(parts[1])
    got2 = negative_triples(got2, vocab, n_neg=3).to_pandas()
    key = lambda d: sorted(map(tuple, d.values.tolist()))
    assert key(got) == key(got2)


# ------------------------------------------------------------- rolling agg


def test_rolling_agg_matches_pandas_reference(ray_session):
    from biocypher_metta_ray.stages.windows import rolling_agg

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {"k": rng.randint(0, 6, 200).astype("int64"),
         "i": np.arange(200, dtype="int64"),
         "v": np.round(rng.uniform(0, 100, 200), 3)}
    )
    got = (
        rolling_agg(_ds(df), key="k", order_cols=["i"], value_col="v",
                    window=3, num_partitions=4)
        .to_pandas()
        .sort_values(["k", "i"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "i"]).reset_index(drop=True)
    r = ref.groupby("k", sort=False)["v"].rolling(3, min_periods=1)
    assert got["n_window"].tolist() == [
        int(x) for x in r.count().reset_index(level=0, drop=True)
        .sort_index()
    ]
    np.testing.assert_allclose(
        got["mean_window"],
        np.round(
            r.mean().reset_index(level=0, drop=True).sort_index(), 6
        ),
        atol=1e-9,
    )
    # frames never cross a key boundary
    first_rows = got.groupby("k").head(1)
    assert (first_rows["n_window"] == 1).all()


# ----------------------------------------------------------------- funnel


def test_funnel_ordered_matching(ray_session):
    from biocypher_metta_ray.stages.windows import funnel

    t = pd.Timestamp("2026-01-01")
    h = pd.Timedelta("1h")
    df = pd.DataFrame(
        {
            "u": [1, 1, 1,   2, 2,   3, 3, 3,   4],
            "ts": [t, t + h, t + 2 * h,          # 1: A B C in order
                   t, t + h,                     # 2: B before A -> stage 1
                   t, t + h, t + h,              # 3: C at SAME ts as B ->
                   t + 5 * h],                   #    strict > blocks C
            "et": ["A", "B", "C",
                   "B", "A",
                   "A", "B", "C",
                   "Z"],                         # 4: no funnel events
        }
    )
    got = (
        funnel(_ds(df), key="u", ts_col="ts", type_col="et",
               steps=["A", "B", "C"], num_partitions=3)
        .to_pandas()
        .sort_values("u")
    )
    assert dict(zip(got["u"], got["stage"])) == {1: 3, 2: 1, 3: 2, 4: 0}


def test_funnel_greedy_is_optimal(ray_session):
    """Two As; the earliest A admits the later B (greedy earliest
    beats matching the A adjacent to B)."""
    from biocypher_metta_ray.stages.windows import funnel

    t = pd.Timestamp("2026-01-01")
    h = pd.Timedelta("1h")
    df = pd.DataFrame(
        {"u": [1, 1, 1],
         "ts": [t + 2 * h, t, t + h],
         "et": ["A", "A", "B"]}
    )
    got = funnel(_ds(df), key="u", ts_col="ts", type_col="et",
                 steps=["A", "B"], num_partitions=2).to_pandas()
    assert got["stage"].tolist() == [2]


# ------------------------------------------------------------ gram matrix


def test_gram_matrix_matches_numpy(ray_session):
    from biocypher_metta_ray.stages.cluster import gram_matrix

    rng = np.random.default_rng(13)
    X = rng.standard_normal((100, 5)).astype(np.float32)
    df = pd.DataFrame({"embedding": [x for x in X]})
    for n_parts in (1, 4):
        d = (ray.data.from_pandas(df) if n_parts == 1
             else ray.data.from_pandas(list(np.array_split(df, n_parts))))
        got = gram_matrix(d).to_pandas()
        G = X.astype(np.float64).T @ X.astype(np.float64)
        assert len(got) == 15  # upper triangle of 5x5
        for i, j, v in zip(got["i"], got["j"], got["val"]):
            assert abs(v - G[i, j]) < 1e-9


# -------------------------------------------------------------------- PMI


def test_pmi_hand_computed(ray_session):
    import math

    from biocypher_metta_ray.stages.lm import pmi_collocations

    docs = pd.DataFrame(
        {"doc_id": np.arange(3, dtype="int64"),
         "text": ["a b a b", "a b c", "c c"]}
    )
    got = pmi_collocations(_ds(docs), min_count=2,
                           num_partitions=2).to_pandas()
    # tokens: a=3 b=3 c=3, T=9; bigrams: (a,b)x3 (b,a)x1 (b,c)x1
    # (c,c)x1, B=6; only (a,b) survives min_count=2
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["w1"], row["w2"], row["bc"]) == ("a", "b", 3)
    want = round(math.log((3 * 9.0 * 9.0) / (6.0 * 3 * 3)), 6)
    assert row["pmi"] == want


# ----------------------------------------------------------------- rollup


def test_rollup_levels_consistent(ray_session):
    from biocypher_metta_ray.stages.relational import rollup_agg

    df = pd.DataFrame(
        {"a": ["x", "x", "y", "y", "y"],
         "b": ["p", "q", "p", "p", "q"],
         "v": [1.0, 2.0, 4.0, 8.0, 16.0]}
    )
    got = rollup_agg(_ds(df), ["a", "b"], sums=["v"],
                     count_as="n").to_pandas()
    finest = got[(got["a"] != "ALL") & (got["b"] != "ALL")]
    mid = got[(got["a"] != "ALL") & (got["b"] == "ALL")]
    total = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
    assert len(finest) == 4 and len(mid) == 2 and len(total) == 1
    assert total["v"].iloc[0] == 31.0 and total["n"].iloc[0] == 5
    assert dict(zip(mid["a"], mid["v"])) == {"x": 3.0, "y": 28.0}
    # every level's mass equals the grand total
    assert finest["v"].sum() == 31.0 and finest["n"].sum() == 5
    assert mid["n"].sum() == 5


def test_percent_rank_ties_and_singletons(ray_session):
    from biocypher_metta_ray.stages.relational import percent_rank

    df = pd.DataFrame(
        {"g": ["a"] * 4 + ["b"],
         "id": np.arange(5, dtype="int64"),
         "v": [1.0, 2.0, 2.0, 3.0, 9.0]}
    )
    got = (
        percent_rank(_ds(df), ["g"], by="v", num_partitions=3)
        .to_pandas().sort_values("id")
    )
    # min-rank ties: ranks 1,2,2,4 over n=4 -> pr 0, 1/3, 1/3, 1
    assert got["pr"].tolist() == [0.0, round(1 / 3, 6), round(1 / 3, 6),
                                  1.0, 0.0]  # singleton group -> 0


# ------------------------------------------------------------ bloom filter


def test_bloom_semi_join_superset_no_false_negatives(ray_session):
    from biocypher_metta_ray.stages.joins import bloom_semi_join

    l = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                      "v": np.arange(5000, dtype=np.int64)})
    r = pd.DataFrame({"k": np.arange(0, 5000, 50, dtype=np.int64)})
    got = bloom_semi_join(_ds(l), _ds(r), on="k").to_pandas()
    true = set(r["k"])
    surv = set(got["k"])
    assert true <= surv                      # no false negatives, ever
    fp = len(surv - true)
    assert fp < 200                          # ~(1-e^{-dn/m})^d stays tiny
    # filtered rows keep their payload untouched
    assert (got["k"] == got["v"]).all()


def test_bloom_bits_partition_invariant(ray_session):
    from biocypher_metta_ray.stages.joins import bloom_bits

    r = pd.DataFrame({"k": np.arange(0, 3000, 7, dtype=np.int64)})
    one = bloom_bits(_ds(r), on="k")
    many = bloom_bits(
        ray.data.from_pandas(list(np.array_split(r, 6))), on="k"
    )
    assert (one == many).all()


def test_sample_per_group_exact_k_and_partition_invariant(ray_session):
    from biocypher_metta_ray.stages.relational import sample_per_group

    df = pd.DataFrame(
        {"g": ["a"] * 100 + ["b"] * 50 + ["c"] * 3,
         "id": np.arange(153, dtype="int64")}
    )
    got = sample_per_group(_ds(df), ["g"], "id", k=5).to_pandas()
    sizes = got.groupby("g").size()
    assert sizes["a"] == 5 and sizes["b"] == 5
    assert sizes["c"] == 3                    # group smaller than k
    many = sample_per_group(
        ray.data.from_pandas(list(np.array_split(df, 7))), ["g"],
        "id", k=5,
    ).to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, many.values.tolist())
    )


# -------------------------------------------------------------- retention


def test_retention_cohorts_hand_computed(ray_session):
    from biocypher_metta_ray.stages.windows import retention_cohorts

    w = pd.Timedelta(seconds=604800)
    t0 = pd.Timestamp("1970-01-01")  # epoch-aligned: week 0 exactly
    df = pd.DataFrame(
        {"u": [1, 1, 1,  2, 2,  3],
         "ts": [t0, t0 + w, t0 + 3 * w,      # u1: cohort 0, wks 0,1,3
                t0 + w, t0 + w,              # u2: cohort 1, wk 1 twice
                t0 + 2 * w]}                 # u3: cohort 2
    )
    got = (
        retention_cohorts(_ds(df), key="u", ts_col="ts",
                          num_partitions=3)
        .to_pandas()
        .sort_values(["cohort", "wk_offset"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"cohort": [0, 0, 0, 1, 2], "wk_offset": [0, 1, 3, 0, 0],
         "n_users": [1, 1, 1, 1, 1]}
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------------------- edge guards


def test_kmeans_empty_input_raises_clearly(ray_session):
    from biocypher_metta_ray.stages.cluster import kmeans

    empty = pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"),
         "embedding": pd.Series([], dtype="object")}
    )
    with pytest.raises(ValueError, match="empty"):
        kmeans(ray.data.from_pandas(empty), k=2, iterations=1)


def test_fuzzy_join_no_matches(ray_session):
    from biocypher_metta_ray.stages.joins import fuzzy_join

    l = pd.DataFrame({"id": np.array([1], dtype=np.int64),
                      "s": ["aaaaaaaa"]})
    r = pd.DataFrame({"id": np.array([2], dtype=np.int64),
                      "s": ["zzzzzzzz"]})
    got = fuzzy_join(_ds(l), _ds(r), "id", "s", "id", "s",
                     max_dist=1, num_partitions=2).to_pandas()
    assert len(got) == 0


def test_window_ranks_tie_semantics(ray_session):
    from biocypher_metta_ray.stages.relational import window_ranks

    df = pd.DataFrame(
        {"g": ["a"] * 5,
         "id": np.arange(5, dtype="int64"),
         "v": [10.0, 20.0, 20.0, 30.0, 30.0]}
    )
    got = (
        window_ranks(_ds(df), ["g"], order_col="v", tiebreak=["id"],
                     num_partitions=2)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got["row_number"].tolist() == [1, 2, 3, 4, 5]
    assert got["rnk"].tolist() == [1, 2, 2, 4, 4]          # gaps
    assert got["dense_rnk"].tolist() == [1, 2, 2, 3, 3]    # no gaps
    assert got["cume_dist"].tolist() == [0.2, 0.6, 0.6, 1.0, 1.0]


def test_grouped_corr_matches_numpy(ray_session):
    from biocypher_metta_ray.stages.relational import grouped_corr

    rng = np.random.RandomState(9)
    x = rng.uniform(0, 10, 300)
    df = pd.DataFrame(
        {"g": (["a"] * 150) + (["b"] * 150),
         "x": x,
         "y": np.concatenate([2 * x[:150] + rng.normal(0, 1, 150),
                              -x[150:] + rng.normal(0, 5, 150)])}
    )
    got = grouped_corr(
        ray.data.from_pandas(list(np.array_split(df, 4))), ["g"],
        "x", "y",
    ).to_pandas().set_index("g")["corr"]
    for g, grp in df.groupby("g"):
        want = np.corrcoef(grp["x"], grp["y"])[0, 1]
        assert abs(got[g] - want) < 1e-6
    # constant-y group -> dropped, not NaN/crash
    cdf = pd.DataFrame({"g": ["c"] * 5, "x": np.arange(5.0),
                        "y": np.ones(5)})
    out = grouped_corr(_ds(cdf), ["g"], "x", "y").to_pandas()
    assert len(out) == 0


def test_ntile_uneven_and_small_groups(ray_session):
    from biocypher_metta_ray.stages.relational import ntile

    df = pd.DataFrame(
        {"g": ["a"] * 7 + ["b"] * 2,
         "id": np.arange(9, dtype="int64"),
         "v": np.arange(9, dtype="float64")}
    )
    got = (
        ntile(_ds(df), ["g"], order_col="v", tiebreak=["id"], n=3,
              num_partitions=2)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # 7 rows / 3 tiles -> sizes 3,2,2
    assert got[got["g"] == "a"]["tile"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    # 2 rows / 3 tiles -> one row per tile, tile 3 empty
    assert got[got["g"] == "b"]["tile"].tolist() == [1, 2]


def test_bfs_broadcast_and_distributed_modes_agree(ray_session):
    from biocypher_metta_ray.stages.graph import bfs_distances

    rng = np.random.RandomState(21)
    e = pd.DataFrame(
        {"src": rng.randint(0, 30, 120).astype("int64"),
         "dst": rng.randint(0, 30, 120).astype("int64")}
    )
    seeds = pd.DataFrame({"node": np.array([0, 7], dtype="int64")})
    a = (
        bfs_distances(_ds(e), _ds(seeds), max_hops=4,
                      broadcast_frontier=True)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    b = (
        bfs_distances(_ds(e), _ds(seeds), max_hops=4,
                      broadcast_frontier=False, num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a.astype("int64"), b.astype("int64")
    )


def test_cube_includes_all_subsets(ray_session):
    from biocypher_metta_ray.stages.relational import cube_agg

    df = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": ["p", "q", "p"],
         "v": [1.0, 2.0, 4.0]}
    )
    got = cube_agg(_ds(df), ["a", "b"], sums=["v"],
                   count_as="n").to_pandas()
    # 3 finest + 2 (a,ALL) + 2 (ALL,b) + 1 grand = 8
    assert len(got) == 8
    bonly = got[(got["a"] == "ALL") & (got["b"] != "ALL")]
    assert dict(zip(bonly["b"], bonly["v"])) == {"p": 5.0, "q": 2.0}
    assert got[(got["a"] == "ALL") & (got["b"] == "ALL")]["v"].iloc[0] == 7.0


def test_pivot_missing_cells_zero_filled(ray_session):
    from biocypher_metta_ray.stages.relational import pivot_agg

    df = pd.DataFrame(
        {"k": ["a", "a", "b"], "c": ["x", "y", "x"],
         "v": [1.0, 2.0, 4.0]}
    )
    got = (
        pivot_agg(_ds(df), ["k"], "c", "v", categories=["x", "y", "z"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["sum_x"].tolist() == [1.0, 4.0]
    assert got["sum_y"].tolist() == [2.0, 0.0]   # missing cell -> 0
    assert got["sum_z"].tolist() == [0.0, 0.0]   # empty category -> 0


def test_string_agg_deterministic_order(ray_session):
    from biocypher_metta_ray.stages.relational import string_agg

    df = pd.DataFrame({"g": [1, 1, 1, 2], "w": ["c", "a", "b", "z"]})
    got = string_agg(
        ray.data.from_pandas(list(np.array_split(df, 3))), ["g"], "w"
    ).to_pandas().sort_values("g")
    assert got["agg"].tolist() == ["a,b,c", "z"]


@pytest.mark.parametrize("use_native", [True, False])
def test_hash_join_composite_key(ray_session, use_native):
    from biocypher_metta_ray.stages.joins import hash_join

    l = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"],
                      "lv": [10, 20, 30]}).astype({"a": "int64",
                                                   "lv": "int64"})
    r = pd.DataFrame({"a": [1, 2, 2], "b": ["x", "x", "y"],
                      "rv": [100, 200, 300]}).astype({"a": "int64",
                                                      "rv": "int64"})
    got = (
        hash_join(_ds(l), _ds(r), on=["a", "b"], num_partitions=4,
                  use_native=use_native)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    # only (1,x) and (2,x) match on BOTH columns
    assert got[["a", "b"]].values.tolist() == [[1, "x"], [2, "x"]]
    assert got["lv"].tolist() == [10, 30]
    assert got["rv"].tolist() == [100, 200]


def test_lag_lead_group_edges_null(ray_session):
    from biocypher_metta_ray.stages.windows import lag_lead

    df = pd.DataFrame(
        {"k": [1, 1, 1, 2], "i": [0, 1, 2, 3],
         "v": [10.0, 20.0, 30.0, 99.0]}
    )
    got = (
        lag_lead(_ds(df), key="k", order_cols=["i"], value_col="v",
                 num_partitions=2)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    assert got["lag_v"].fillna(-1).tolist() == [-1, 10.0, 20.0, -1]
    assert got["lead_v"].fillna(-1).tolist() == [20.0, 30.0, -1, -1]


def test_running_total_per_key(ray_session):
    from biocypher_metta_ray.stages.windows import running_total

    df = pd.DataFrame(
        {"k": [1, 1, 2, 1], "i": [0, 1, 2, 3],
         "v": [1.5, 2.5, 10.0, 4.0]}
    )
    got = (
        running_total(_ds(df), key="k", order_cols=["i"],
                      value_col="v", num_partitions=2)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    assert got["running"].tolist() == [1.5, 4.0, 10.0, 8.0]


def test_window_family_under_hot_key_skew(ray_session):
    """One key owning ~95% of the log: every windows-family operator
    must stay a single vectorized partition body (correct counts, no
    blowup) — the documented partitioning assumption."""
    from biocypher_metta_ray.stages.windows import (
        funnel, lag_lead, retention_cohorts, rolling_agg,
    )

    n = 30000
    rng = np.random.RandomState(2)
    t0 = pd.Timestamp("1970-01-01")
    users = np.where(rng.uniform(size=n) < 0.95, 0,
                     rng.randint(1, 20, n)).astype("int64")
    df = pd.DataFrame(
        {"u": users,
         "i": np.arange(n, dtype="int64"),
         "ts": t0 + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
         "et": rng.choice(["A", "B", "C"], n),
         "v": rng.uniform(0, 10, n)}
    )
    ds = ray.data.from_pandas(list(np.array_split(df, 8)))
    r = rolling_agg(ds, key="u", order_cols=["ts", "i"], value_col="v",
                    window=4, num_partitions=4).to_pandas()
    assert len(r) == n and r["n_window"].max() == 4
    f = funnel(ds, key="u", ts_col="ts", type_col="et",
               steps=["A", "B", "C"], num_partitions=4).to_pandas()
    assert len(f) == df["u"].nunique()
    assert (f.loc[f["u"] == 0, "stage"] == 3).all()  # hot user funnels
    rc = retention_cohorts(ds, key="u", ts_col="ts",
                           num_partitions=4).to_pandas()
    assert rc["n_users"].sum() >= df["u"].nunique()
    ll = lag_lead(ds, key="u", order_cols=["ts", "i"], value_col="v",
                  num_partitions=4).to_pandas()
    assert len(ll) == n and ll["lag_v"].isna().sum() == df["u"].nunique()


def test_zscore_matches_numpy_and_drops_degenerate(ray_session):
    from biocypher_metta_ray.stages.relational import zscore

    rng = np.random.RandomState(17)
    df = pd.DataFrame(
        {"g": ["a"] * 50 + ["b"] * 50 + ["c"] + ["d"] * 3,
         "id": np.arange(104, dtype="int64"),
         "v": np.concatenate([rng.uniform(0, 10, 100),
                              [5.0], [7.0, 7.0, 7.0]])}
    )
    got = zscore(
        ray.data.from_pandas(list(np.array_split(df, 4))), ["g"], "v"
    ).to_pandas()
    # singleton group c and zero-variance group d drop
    assert set(got["g"]) == {"a", "b"}
    for g, grp in df[df["g"].isin(["a", "b"])].groupby("g"):
        sub = got[got["g"] == g].set_index("id")["z"]
        want = (grp["v"] - grp["v"].mean()) / grp["v"].std(ddof=1)
        np.testing.assert_allclose(
            sub[grp["id"]].to_numpy(), np.round(want, 6), atol=2e-6
        )


def test_pagerank_weighted_reference(ray_session):
    """Weighted recurrence against a dense numpy reference; heavier
    edges pull more rank than the uniform variant."""
    from biocypher_metta_ray.stages.graph import pagerank

    edges = pd.DataFrame(
        {"src": ["a", "a", "b", "c"],
         "dst": ["b", "c", "c", "a"],
         "w": [9.0, 1.0, 1.0, 1.0]}
    )
    got = (
        pagerank(_ds(edges), weight_col="w", iterations=5,
                 num_partitions=2)
        .to_pandas().set_index("node")["pr"]
    )
    nodes = ["a", "b", "c"]
    import numpy as np_
    r = {n: 1 / 3 for n in nodes}
    out_w = {"a": 10.0, "b": 1.0, "c": 1.0}
    for _ in range(5):
        nxt = {n: 0.05 for n in nodes}
        for s, d, w in zip(edges["src"], edges["dst"], edges["w"]):
            nxt[d] += 0.85 * r[s] * (w / out_w[s])
        r = nxt
    for n in nodes:
        assert abs(got[n] - round(r[n], 6)) < 2e-6
    # b receives 90% of a's mass under weighting vs 50% uniform: its
    # weighted rank must exceed its unweighted rank
    uni = (
        pagerank(_ds(edges), iterations=5, num_partitions=2)
        .to_pandas().set_index("node")["pr"]
    )
    assert got["b"] > uni["b"]


def test_pagerank_personalized_concentrates_on_seed(ray_session):
    from biocypher_metta_ray.stages.graph import pagerank

    # chain a -> b -> c plus an isolated pair x -> y
    edges = pd.DataFrame(
        {"src": ["a", "b", "x"], "dst": ["b", "c", "y"]}
    )
    got = (
        pagerank(_ds(edges), seed_nodes=["a"], iterations=10,
                 num_partitions=2)
        .to_pandas().set_index("node")["pr"]
    )
    # seed keeps the teleport floor; mass decays down the chain
    assert got["a"] == pytest.approx(0.15, abs=1e-6)
    assert got["a"] > got["b"] > got["c"] > 0
    # nodes unreachable from the seed get NO mass at all
    assert got["x"] == 0.0 and got["y"] == 0.0
    with pytest.raises(ValueError):
        pagerank(_ds(edges), seed_nodes=[])
