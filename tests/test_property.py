"""Property-based checks (hypothesis) for operator kernels whose
correctness argument is combinatorial — blocking soundness, frame
boundaries, split invariance. Example counts are kept small because
each example drives real Ray datasets; the properties, not the
volume, carry the value."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

_words = st.lists(
    st.text(alphabet="abcd", min_size=0, max_size=6),
    min_size=1, max_size=12, unique=True,
)


@settings(**SETTINGS)
@given(left=_words, right=_words, d=st.integers(1, 2))
def test_fuzzy_join_blocking_is_complete(ray_session, left, right, d):
    """Deletion-variant blocking must find EXACTLY the brute-force
    Levenshtein pairs for ANY strings — substitutions, insertions and
    deletions alike (the SymSpell soundness claim)."""
    from biocypher_metta_ray.stages.joins import _levenshtein, fuzzy_join

    l = pd.DataFrame({"id": np.arange(len(left), dtype=np.int64),
                      "s": left})
    r = pd.DataFrame(
        {"id": np.arange(100, 100 + len(right), dtype=np.int64),
         "s": right}
    )
    got = fuzzy_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        "id", "s", "id", "s", max_dist=d, num_partitions=2,
    ).to_pandas()
    # a fully-empty Ray result arrives schema-less: no rows == no pairs
    got_pairs = (
        set() if got.empty else set(zip(got["lid"], got["rid"]))
    )
    want_pairs = {
        (lid, rid)
        for lid, ls in zip(l["id"], l["s"])
        for rid, rs in zip(r["id"], r["s"])
        if _levenshtein(ls, rs) <= d
    }
    assert got_pairs == want_pairs


@settings(**SETTINGS)
@given(
    n=st.integers(1, 40),
    window=st.integers(1, 6),
    nkeys=st.integers(1, 4),
)
def test_rolling_agg_frames_never_cross_keys(ray_session, n, window, nkeys):
    from biocypher_metta_ray.stages.windows import rolling_agg

    rng = np.random.RandomState(n * 7 + window)
    df = pd.DataFrame(
        {"k": rng.randint(0, nkeys, n).astype("int64"),
         "i": np.arange(n, dtype="int64"),
         "v": np.round(rng.uniform(0, 10, n), 3)}
    )
    got = (
        rolling_agg(ray.data.from_pandas(df), key="k",
                    order_cols=["i"], value_col="v", window=window,
                    num_partitions=2)
        .to_pandas().sort_values(["k", "i"]).reset_index(drop=True)
    )
    ref = df.sort_values(["k", "i"]).reset_index(drop=True)
    r = ref.groupby("k", sort=False)["v"].rolling(
        window, min_periods=1
    )
    want_n = r.count().reset_index(level=0, drop=True).sort_index()
    want_s = r.sum().reset_index(level=0, drop=True).sort_index()
    assert got["n_window"].tolist() == [int(x) for x in want_n]
    np.testing.assert_allclose(got["sum_window"],
                               np.round(want_s, 6), atol=1e-9)


@settings(**SETTINGS)
@given(n=st.integers(1, 60), k=st.integers(1, 5),
       splits=st.integers(1, 5))
def test_sample_per_group_split_invariant(ray_session, n, k, splits):
    from biocypher_metta_ray.stages.relational import sample_per_group

    rng = np.random.RandomState(n + 13 * k)
    df = pd.DataFrame(
        {"g": rng.randint(0, 3, n).astype("int64"),
         "id": np.arange(n, dtype="int64")}
    )
    one = sample_per_group(
        ray.data.from_pandas(df), ["g"], "id", k=k
    ).to_pandas()
    many = sample_per_group(
        ray.data.from_pandas(
            list(np.array_split(df, min(splits, len(df))))
        ),
        ["g"], "id", k=k,
    ).to_pandas()
    key = lambda d: sorted(map(tuple, d[["g", "id"]].values.tolist()))
    assert key(one) == key(many)
    assert (one.groupby("g").size()
            <= np.minimum(df.groupby("g").size(), k).max()).all()


@settings(**SETTINGS)
@given(n=st.integers(2, 50), tiles=st.integers(1, 6))
def test_ntile_sizes_differ_by_at_most_one(ray_session, n, tiles):
    from biocypher_metta_ray.stages.relational import ntile

    df = pd.DataFrame(
        {"g": np.zeros(n, dtype="int64"),
         "id": np.arange(n, dtype="int64"),
         "v": np.arange(n, dtype="float64")}
    )
    got = ntile(
        ray.data.from_pandas(df), ["g"], order_col="v",
        tiebreak=["id"], n=tiles, num_partitions=2,
    ).to_pandas()
    sizes = got.groupby("tile").size()
    assert sizes.max() - sizes.min() <= 1
    assert sizes.sum() == n
    assert got["tile"].max() <= tiles
    # ordered: every row in tile t has v below every row in tile t+1
    mx = got.groupby("tile")["v"].max()
    mn = got.groupby("tile")["v"].min()
    for t in range(1, len(mx)):
        assert mx.iloc[t - 1] <= mn.iloc[t]


def _brute_truss(edges: set, k: int) -> set:
    """Reference k-truss: iterate support-filtering to a fixpoint."""
    cur = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    while True:
        adj = {}
        for u, v in cur:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        nxt = {
            (u, v) for u, v in cur
            if len(adj[u] & adj[v]) >= k - 2
        }
        if nxt == cur:
            return cur
        cur = nxt


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=25,
    ),
    k=st.integers(3, 4),
)
def test_k_truss_matches_bruteforce(ray_session, edges, k):
    """Bounded distributed peeling at a fixpoint-reaching round count
    equals the reference iterate-to-fixpoint k-truss on ANY small
    graph (cascades, disconnected pieces, self-loops, duplicates)."""
    from biocypher_metta_ray.stages.graph import k_truss

    df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
    ds = ray.data.from_pandas(df)
    # 10-node graphs peel to fixpoint well within 10 rounds
    res = k_truss(ds, k=k, max_rounds=10)
    assert set(res.schema().names) == {"u", "v"}  # typed even when empty
    out = res.to_pandas()
    # Ray's to_pandas() drops columns on 0-row datasets (schema above
    # proves the Dataset itself is typed)
    got = (set() if out.empty else
           {(int(u), int(v)) for u, v in out[["u", "v"]].to_numpy()})
    assert got == _brute_truss(set(map(tuple, edges)), k)


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=10),
        min_size=1, max_size=6,
    ),
    window=st.integers(1, 3),
)
def test_skipgram_pairs_match_bruteforce(ray_session, docs, window):
    """Window co-occurrence counts equal the brute-force directed
    multiset for any corpus and window."""
    from collections import Counter

    from biocypher_metta_ray.stages.lm import skipgram_pairs

    texts = [" ".join(d) for d in docs]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": texts}))
    out = skipgram_pairs(ds, window=window).to_pandas()
    got = Counter() if out.empty else Counter(
        {(r.w1, r.w2): int(r.n) for r in out.itertuples()})
    exp = Counter()
    for d in docs:
        for i, w in enumerate(d):
            for dd in range(1, window + 1):
                if i + dd < len(d):
                    exp[(w, d[i + dd])] += 1
                    exp[(d[i + dd], w)] += 1
    assert got == exp


@settings(**SETTINGS)
@given(
    old=st.dictionaries(st.integers(0, 8), st.integers(0, 3),
                        max_size=8),
    new=st.dictionaries(st.integers(0, 8), st.integers(0, 3),
                        max_size=8),
)
def test_scd2_history_invariants(ray_session, old, new):
    """For any snapshot pair: every key in new has exactly one open
    row holding its NEW value; retired keys close at t_new; row count
    = |new| + |removed| + |changed|."""
    from biocypher_metta_ray.stages.joins import scd2_history

    if not old and not new:
        return
    o = pd.DataFrame({"k": list(old), "v": list(old.values())},
                     dtype=np.int64)
    n = pd.DataFrame({"k": list(new), "v": list(new.values())},
                     dtype=np.int64)
    out = scd2_history(
        ray.data.from_pandas(o) if len(o) else ray.data.from_pandas(
            pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})),
        ray.data.from_pandas(n) if len(n) else ray.data.from_pandas(
            pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})),
        ["k"], ["v"], "T0", "T1").to_pandas()
    if out.empty:
        assert not old and not new
        return
    open_rows = out[out["valid_to"] == "9999-12-31"]
    assert dict(zip(open_rows["k"], open_rows["v"])) == new
    assert len(open_rows) == len(new)
    removed = set(old) - set(new)
    changed = {k for k in set(old) & set(new) if old[k] != new[k]}
    assert len(out) == len(new) + len(removed) + len(changed)
    closed = out[out["valid_to"] == "T1"]
    assert set(closed["k"]) == removed | changed


@settings(**SETTINGS)
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 30),
                  st.integers(0, 10)),
        min_size=1, max_size=20,
    ),
)
def test_merge_intervals_matches_bruteforce(ray_session, iv):
    """Distributed gaps-and-islands equals the brute sweep for any
    interval set (containments, duplicates, touching endpoints)."""
    from biocypher_metta_ray.stages.joins import merge_intervals

    df = pd.DataFrame(
        {"chrom": [c for c, s, l in iv],
         "rstart": [s for c, s, l in iv],
         "rend": [s + l for c, s, l in iv]}
    ).astype(np.int64)
    out = merge_intervals(
        ray.data.from_pandas(df), ["chrom"], "rstart", "rend",
        num_partitions=2,
    ).to_pandas()
    got = sorted(map(tuple, out[["chrom", "istart", "iend",
                                 "n_merged"]].to_numpy()))
    exp = []
    for c in sorted(df["chrom"].unique()):
        rows = sorted(
            df[df["chrom"] == c][["rstart", "rend"]].to_numpy().tolist()
        )
        cur_s, cur_e, n = rows[0][0], rows[0][1], 1
        for s, e in rows[1:]:
            if s > cur_e:
                exp.append((c, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        exp.append((c, cur_s, cur_e, n))
    assert got == sorted(exp)
